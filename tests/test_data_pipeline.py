"""Data layer: shard handling, native tar/JPEG pipeline, dataset adapters, device prefetch."""

import io
import json
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from multimodal_tpu.data import (
    DataInfo,
    FileListDataset,
    ShardSampler,
    SyntheticBatches,
    WdsReader,
    braceexpand,
    build_dataset,
    coco_captions,
    decode_images,
    expand_shards,
    iter_tar_samples,
    prefetch_to_device,
)
from multimodal_tpu.native import bindings as native


def _jpeg_bytes(rng, w=64, h=48, quality=92):
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    arr = np.asarray(Image.fromarray(arr).resize((w, h), Image.BILINEAR))
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "JPEG", quality=quality)
    return b.getvalue()


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    """Two webdataset-style shards with jpg+txt members, one corrupt member."""
    root = tmp_path_factory.mktemp("shards")
    rng = np.random.default_rng(0)
    for s in range(2):
        with tarfile.open(root / f"data-{s:03d}.tar", "w") as tar:
            for i in range(10):
                key = f"{s:03d}{i:04d}"
                img = _jpeg_bytes(rng) if not (s == 1 and i == 3) else b"corrupt!"
                for ext, payload in [("jpg", img), ("txt", f"caption {key}".encode())]:
                    info = tarfile.TarInfo(f"{key}.{ext}")
                    info.size = len(payload)
                    tar.addfile(info, io.BytesIO(payload))
    return str(root)


# ---------------------------------------------------------------------------
# shards.py
# ---------------------------------------------------------------------------


def test_braceexpand():
    assert braceexpand("s-{000..002}.tar") == ["s-000.tar", "s-001.tar", "s-002.tar"]
    assert braceexpand("{a,b}/{0..1}") == ["a/0", "a/1", "b/0", "b/1"]
    assert braceexpand("plain.tar") == ["plain.tar"]


def test_expand_shards_multisource_weights():
    shards, w = expand_shards("a-{0..1}.tar::b-{0..2}.tar", "1.0::2.0")
    assert len(shards) == 5
    assert w == [1.0, 1.0, 2.0, 2.0, 2.0]
    with pytest.raises(ValueError):
        expand_shards("a.tar::b.tar", "1.0")


def test_shard_sampler_split_and_determinism():
    shards = [f"s{i}" for i in range(16)]
    parts = []
    for host in range(2):
        for worker in range(2):
            s = ShardSampler(
                shards, seed=7, num_hosts=2, host_id=host, num_workers=2, worker_id=worker
            )
            parts.append(list(s))
    flat = [x for p in parts for x in p]
    assert sorted(flat) == sorted(shards)  # partition covers everything exactly once
    again = list(
        ShardSampler(shards, seed=7, num_hosts=2, host_id=0, num_workers=2, worker_id=0)
    )
    assert again == parts[0]  # deterministic
    s = ShardSampler(shards, seed=7)
    s.set_epoch(1)
    assert list(s) != list(ShardSampler(shards, seed=7))  # epoch reshuffles


def test_shard_sampler_resampled_weights():
    s = ShardSampler(
        ["a"] * 50 + ["b"] * 50, weights=[1.0] * 50 + [0.0] * 50, seed=0, resampled=True
    )
    drawn = list(s)
    assert len(drawn) > 0
    assert all(d == "a" for d in drawn)  # zero-weight shards never drawn


# ---------------------------------------------------------------------------
# native tar index + decode
# ---------------------------------------------------------------------------


def test_native_available():
    assert native.available(), "native pipeline must build in the image"


def test_tar_index_matches_tarfile(shard_dir):
    path = os.path.join(shard_dir, "data-000.tar")
    got = native.tar_index(path)
    with tarfile.open(path) as tar:
        want = [(m.name, m.offset_data, m.size) for m in tar if m.isreg()]
    assert got == want


def test_iter_tar_samples_groups(shard_dir):
    samples = list(iter_tar_samples(os.path.join(shard_dir, "data-000.tar")))
    assert len(samples) == 10
    assert all({"jpg", "txt"} <= set(s) for s in samples)
    assert samples[0]["txt"].decode().startswith("caption")


def test_decode_images_native_vs_pil_parity():
    rng = np.random.default_rng(1)
    bufs = [_jpeg_bytes(rng, w, h) for (w, h) in [(320, 240), (100, 160), (224, 224)]]
    native_out, ok = decode_images(bufs, 224, train=False)
    assert ok.all()
    from multimodal_tpu.data.preprocess import eval_transform, OPENAI_DATASET_MEAN, OPENAI_DATASET_STD

    for i, b in enumerate(bufs):
        ref = eval_transform(Image.open(io.BytesIO(b)), normalize=False)
        ref_u8 = np.clip(ref * 255.0 + 0.5, 0, 255).astype(np.uint8)
        diff = np.abs(native_out[i].astype(int) - ref_u8.astype(int))
        assert diff.mean() < 1.0, f"img {i}: mean diff {diff.mean()}"


def test_decode_images_absorbs_corrupt():
    rng = np.random.default_rng(2)
    bufs = [b"garbage", _jpeg_bytes(rng)]
    out, ok = decode_images(bufs, 224, train=False)
    assert list(ok) == [False, True]


def test_train_decode_deterministic_by_seed():
    rng = np.random.default_rng(3)
    bufs = [_jpeg_bytes(rng, 300, 280)] * 4
    seeds = np.arange(4, dtype=np.uint64)
    a, _ = decode_images(bufs, 224, train=True, seeds=seeds)
    b, _ = decode_images(bufs, 224, train=True, seeds=seeds)
    assert np.array_equal(a, b)
    assert not np.array_equal(a[0], a[1])  # different seeds -> different crops


# ---------------------------------------------------------------------------
# WdsReader end-to-end
# ---------------------------------------------------------------------------


def test_wds_reader_batches(shard_dir):
    reader = WdsReader(
        os.path.join(shard_dir, "data-{000..001}.tar"),
        batch_size=8,
        train=True,
        shuffle_buffer=16,
        seed=0,
    )
    batches = list(reader)
    assert len(batches) == 2  # 20 samples, batch 8, remainder dropped
    for b in batches:
        assert b["image"].shape == (8, 224, 224, 3) and b["image"].dtype == np.uint8
        assert b["text"].shape == (8, 77) and b["text"].dtype == np.int32
        assert (b["text"][:, 0] == 49406).all()
    reader.set_epoch(1)
    b2 = next(iter(reader))
    assert not np.array_equal(b2["image"], batches[0]["image"])  # epoch changes order/crops


def test_wds_reader_host_split(shard_dir):
    urls = os.path.join(shard_dir, "data-{000..001}.tar")
    r0 = WdsReader(urls, batch_size=4, train=False, num_hosts=2, host_id=0)
    r1 = WdsReader(urls, batch_size=4, train=False, num_hosts=2, host_id=1)
    s0 = [s for s in r0.sampler]
    s1 = [s for s in r1.sampler]
    assert sorted(s0 + s1) == sorted(braceexpand(urls))
    assert not set(s0) & set(s1)


# ---------------------------------------------------------------------------
# adapters
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    (root / "val2017").mkdir()
    (root / "annotations").mkdir()
    rng = np.random.default_rng(5)
    images, anns = [], []
    for i in range(6):
        fn = f"{i:012d}.jpg"
        (root / "val2017" / fn).write_bytes(_jpeg_bytes(rng))
        images.append({"id": i, "file_name": fn})
        anns.append({"image_id": i, "caption": f"a photo number {i}"})
        anns.append({"image_id": i, "caption": f"another view of {i}"})
    (root / "annotations" / "captions_val2017.json").write_text(
        json.dumps({"images": images, "annotations": anns})
    )
    return str(root)


def test_coco_adapter(coco_dir):
    items = coco_captions(coco_dir, split="val")
    assert len(items) == 12  # every annotation kept
    ds = FileListDataset(items, batch_size=4, train=False, drop_last=True)
    batches = list(ds)
    assert len(batches) == 3
    assert batches[0]["image"].shape == (4, 224, 224, 3)


def test_build_dataset_dispatch(coco_dir):
    ds = build_dataset("coco", path=coco_dir, batch_size=4, split="val", train=False)
    assert ds.num_batches == 3
    syn = build_dataset("synthetic", path="", batch_size=4, num_samples=16)
    assert syn.num_batches == 4
    b = next(iter(syn))
    assert b["image"].dtype == np.uint8
    with pytest.raises(ValueError):
        build_dataset("nope", path="", batch_size=4)


def test_cood_adapter(tmp_path):
    rng = np.random.default_rng(6)
    for cls in ["red_panda", "axolotl"]:
        d = tmp_path / cls
        d.mkdir()
        (d / "0.jpg").write_bytes(_jpeg_bytes(rng))
    from multimodal_tpu.data import cood_items

    items = cood_items(str(tmp_path))
    assert len(items) == 2
    assert items[0][1] in ("red panda", "axolotl")


def test_csv_adapter(tmp_path):
    p = tmp_path / "data.tsv"
    p.write_text("filepath\ttitle\n/x/1.jpg\thello\n/x/2.jpg\tworld\n")
    from multimodal_tpu.data import csv_items

    assert csv_items(str(p)) == [("/x/1.jpg", "hello"), ("/x/2.jpg", "world")]


# ---------------------------------------------------------------------------
# prefetch
# ---------------------------------------------------------------------------


def test_prefetch_to_device_preserves_stream():
    import jax

    src = SyntheticBatches(batch_size=4, num_samples=24, image_size=32, seed=1)
    direct = [b["image"].sum() for b in src]
    staged = [
        int(np.asarray(b["image"]).astype(np.int64).sum())
        for b in prefetch_to_device(src, depth=2)
    ]
    assert staged == [int(np.int64(d)) for d in direct]


def test_datainfo_epoch_plumbs():
    src = SyntheticBatches(batch_size=2, num_samples=8, image_size=16, seed=0)
    info = DataInfo(src)
    info.set_epoch(3)
    assert src.epoch == 3
    assert info.num_batches == 4
    assert len(list(info)) == 4


def test_bench_pipeline_tool(capsys):
    """The input-pipeline benchmark runs every stage and reports finite rates."""
    import json as _json

    from multimodal_tpu.data.bench_pipeline import main as bench_main

    summary = bench_main(["--num-samples", "64", "--num-shards", "2",
                          "--batch-size", "16", "--source-size", "96"])
    assert np.isfinite(summary["e2e_samples_per_s"])
    assert summary["chips_fed_by_this_host"] >= 0
    stages = [_json.loads(l) for l in capsys.readouterr().out.splitlines()
              if l.startswith("{")]
    names = {s["stage"] for s in stages}
    assert {"tar_iterate", "tokenize", "wds_reader_e2e", "summary"} <= names
    for s in stages:
        if "value" in s:
            assert np.isfinite(s["value"]), s


def test_interleaved_workers_cover_all_shards(shard_dir):
    """--workers N: N shard-disjoint readers merged on threads yield the same samples as
    one reader (as a multiset of captions), num_batches sums, and set_epoch plumbs."""
    from multimodal_tpu.data.datasets import build_dataset

    urls = os.path.join(shard_dir, "data-{000..001}.tar")

    def captions(src):
        out = []
        for b in src:
            # EOT-terminated token rows as hashable caption identities
            out.extend(tuple(row[row > 0]) for row in b["text"])
        return sorted(out)

    kw = dict(path=urls, batch_size=5, train=False, seed=0)
    one = build_dataset("webdataset", num_workers=1, **kw)
    two = build_dataset("webdataset", num_workers=2, **kw)
    from multimodal_tpu.data.pipeline import InterleavedReaders

    assert isinstance(two, InterleavedReaders) and len(two.readers) == 2
    c1, c2 = captions(one), captions(two)
    assert len(c1) == len(c2) == 20
    # the one corrupt member is backfilled from a batch-mate, and batch composition
    # differs with worker count — so up to one caption may differ; the 19 good
    # samples must be covered identically
    assert len(set(c1) ^ set(c2)) <= 2
    assert len(set(c1) & set(c2)) >= 19
    # epoch plumbing reaches every worker
    two.set_epoch(3)
    assert all(r.epoch == 3 for r in two.readers)
    # the round-robin merge is DETERMINISTIC (mid-epoch resume replays by position):
    # two fresh iterations yield the identical batch order
    two.set_epoch(0)
    first = [tuple(map(tuple, b["text"])) for b in two]
    second = [tuple(map(tuple, b["text"])) for b in two]
    assert first == second
    # more workers than shards: idle readers exhaust immediately, stream still covers all
    four = build_dataset("webdataset", num_workers=4, **kw)
    assert len(captions(four)) == 20
