"""COCO retrieval through the CLI eval-only path, plus download-module offline behavior."""

import json

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    (root / "val2017").mkdir()
    (root / "annotations").mkdir()
    rng = np.random.default_rng(0)
    images, anns = [], []
    for i in range(5):
        fn = f"{i:012d}.jpg"
        arr = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / "val2017" / fn, quality=90)
        images.append({"id": i, "file_name": fn})
        for j in range(2):  # two captions per image
            anns.append({"image_id": i, "caption": f"photo {i} caption {j}"})
    (root / "annotations" / "captions_val2017.json").write_text(
        json.dumps({"images": images, "annotations": anns})
    )
    return str(root)


def test_cli_eval_only_retrieval(coco_root, tmp_path):
    from multimodal_tpu.train.run import main

    rc = main([
        "--dataset-type", "synthetic", "--model", "tiny-fullvocab-r", "--batch-size", "4",
        "--epochs", "0", "--logs", str(tmp_path), "--name", "ret",
        "--coco-retrieval", coco_root,
    ])
    assert rc == 0
    records = [json.loads(l) for l in open(tmp_path / "ret" / "results.jsonl")]
    rec = records[-1]
    assert "coco_retrieval-text_to_image_R@1" in rec
    assert "coco_retrieval-image_to_text_R@5" in rec
    # 5 images: R@5 must be 1.0 in both directions regardless of model quality
    assert rec["coco_retrieval-text_to_image_R@5"] == 1.0
    assert rec["coco_retrieval-image_to_text_R@5"] == 1.0


def test_download_module_offline_importable():
    """Zero-egress image: module imports, URL builders work, no network at import time."""
    from multimodal_tpu.data.download import CC12M_NUM_SHARDS, cc12m_shard_urls

    urls = cc12m_shard_urls(0, 2)
    assert len(urls) == 3 and urls[0].endswith("cc12m-train-0000.tar")
    assert CC12M_NUM_SHARDS == 1243


# register the full-vocab tiny model used above
from multimodal_tpu.models import add_model_config  # noqa: E402

add_model_config(
    "tiny-fullvocab-r",
    {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 32, "patch_size": 16, "width": 64, "layers": 2, "heads": 2},
        "text_cfg": {"context_length": 16, "vocab_size": 49408, "width": 64, "layers": 2,
                     "heads": 2},
    },
)


def test_cli_trains_on_webdataset(tmp_path):
    """The full CLI path over tar shards (this crashed once on a missing num_batches)."""
    import io
    import tarfile

    import numpy as np
    from PIL import Image

    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    rng = np.random.default_rng(0)
    for s in range(2):
        with tarfile.open(shard_dir / f"t-{s:02d}.tar", "w") as tar:
            for i in range(24):
                arr = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
                b = io.BytesIO()
                Image.fromarray(arr).save(b, "JPEG", quality=90)
                for ext, payload in [("jpg", b.getvalue()),
                                     ("txt", f"caption {s} {i}".encode())]:
                    info = tarfile.TarInfo(f"{s:02d}{i:04d}.{ext}")
                    info.size = len(payload)
                    tar.addfile(info, io.BytesIO(payload))

    from multimodal_tpu.train.run import main

    rc = main([
        "--train-data", str(shard_dir / "t-{00..01}.tar"), "--dataset-type", "webdataset",
        "--model", "tiny-fullvocab-r", "--batch-size", "16", "--epochs", "1",
        "--warmup", "2", "--lr", "1e-3", "--logs", str(tmp_path), "--name", "w",
        "--log-every-n-steps", "1", "--train-num-samples", "48",
    ])
    assert rc == 0
    records = [json.loads(l) for l in open(tmp_path / "w" / "results.jsonl")]
    assert records and np.isfinite(records[-1]["loss"])


def test_cli_flickr_retrieval(tmp_path):
    import io

    import numpy as np
    from PIL import Image

    root = tmp_path / "flickr"
    (root / "flickr30k-images").mkdir(parents=True)
    rng = np.random.default_rng(7)
    lines = []
    for i in range(4):
        fn = f"img{i}.jpg"
        arr = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / "flickr30k-images" / fn, quality=90)
        for j in range(2):
            lines.append(f"{fn}#{j}\tcaption {i} variant {j}")
    (root / "results_20130124.token").write_text("\n".join(lines))

    from multimodal_tpu.train.run import main

    rc = main([
        "--dataset-type", "synthetic", "--model", "tiny-fullvocab-r", "--batch-size", "4",
        "--epochs", "0", "--logs", str(tmp_path), "--name", "fl",
        "--flickr-retrieval", str(root),
    ])
    assert rc == 0
    records = [json.loads(l) for l in open(tmp_path / "fl" / "results.jsonl")]
    rec = records[-1]
    assert "flickr_retrieval-text_to_image_R@1" in rec
    assert rec["flickr_retrieval-text_to_image_R@5"] == 1.0  # only 4 image candidates


@pytest.fixture(scope="module")
def caption_coco_root(tmp_path_factory):
    """A larger COCO-format set (24 images, 1 caption each) for the captioning eval."""
    root = tmp_path_factory.mktemp("capcoco")
    (root / "val2017").mkdir()
    (root / "annotations").mkdir()
    rng = np.random.default_rng(1)
    images, anns = [], []
    words = ["red", "blue", "green", "dog", "cat", "car"]
    for i in range(24):
        fn = f"{i:012d}.jpg"
        arr = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / "val2017" / fn, quality=90)
        images.append({"id": i, "file_name": fn})
        anns.append({"image_id": i,
                     "caption": f"a photo of a {words[i % len(words)]} thing"})
    (root / "annotations" / "captions_val2017.json").write_text(
        json.dumps({"images": images, "annotations": anns})
    )
    return str(root)


@pytest.mark.slow
def test_cli_eval_only_captioning(caption_coco_root, tmp_path):
    """--captioning-eval through the eval-only CLI: trains the compact prefix decoder on
    frozen embeddings and reports a finite corpus BLEU over the held-out split."""
    from multimodal_tpu.train.run import main

    rc = main([
        "--dataset-type", "synthetic", "--model", "tiny-fullvocab-r", "--batch-size", "8",
        "--epochs", "0", "--logs", str(tmp_path), "--name", "cap",
        "--captioning-eval", caption_coco_root, "--captioning-num-samples", "24",
        "--captioning-epochs", "2", "--captioning-width", "64",
        "--captioning-layers", "2",
    ])
    assert rc == 0
    records = [json.loads(l) for l in open(tmp_path / "cap" / "results.jsonl")]
    rec = records[-1]
    assert "caption_bleu" in rec and np.isfinite(rec["caption_bleu"])
    assert 0.0 <= rec["caption_bleu"] <= 1.0
    assert rec["caption_num_eval"] == 8
