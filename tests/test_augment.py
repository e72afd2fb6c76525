"""--aug-cfg functional coverage (reference align_clip/transform.py:18-27,88-106):
crop scale/ratio reach the decode stage, pixel augs act on batches, CLI plumbs through."""

import io
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from multimodal_tpu.data.augment import AugmentationCfg, apply_pixel_augment, parse_aug_cfg
from multimodal_tpu.data.wds import WdsReader, decode_images

_LUMA = np.asarray([0.299, 0.587, 0.114], np.float32)


def _jpeg_bytes(rng, w=320, h=240):
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8), "RGB")
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=90)
    return buf.getvalue()


@pytest.fixture(scope="module")
def jpegs():
    rng = np.random.default_rng(0)
    return [_jpeg_bytes(rng) for _ in range(8)]


def test_parse_aug_cfg_surface():
    cfg = parse_aug_cfg({"scale": (0.2, 0.8), "ratio": (1.0, 1.0), "color_jitter": 0.4,
                         "grayscale_prob": 0.5, "re_prob": 0.25, "re_count": 2})
    assert cfg.scale == (0.2, 0.8) and cfg.ratio == (1.0, 1.0)
    assert cfg.color_jitter == (0.4, 0.4, 0.4)
    assert cfg.grayscale_prob == 0.5 and cfg.re_prob == 0.25 and cfg.re_count == 2
    assert parse_aug_cfg({}) is None
    assert parse_aug_cfg(None) is None
    # 3-tuple jitter and zero jitter
    assert parse_aug_cfg({"color_jitter": (0.1, 0.2, 0.3)}).color_jitter == (0.1, 0.2, 0.3)
    assert parse_aug_cfg({"color_jitter": 0.0}).color_jitter is None


def test_unsupported_keys_warn_loudly(caplog):
    import logging

    with caplog.at_level(logging.WARNING, logger="multimodal_tpu"):
        cfg = parse_aug_cfg({"auto_augment": "rand-m9", "scale": (0.5, 1.0)})
    assert cfg.scale == (0.5, 1.0)
    assert any("auto_augment" in r.message for r in caplog.records)
    with caplog.at_level(logging.WARNING, logger="multimodal_tpu"):
        parse_aug_cfg({"interpolation": "random"})
    assert any("interpolation" in r.message for r in caplog.records)


def test_scale_ratio_reach_the_crop(jpegs):
    seeds = np.arange(len(jpegs), dtype=np.uint64)
    base, ok = decode_images(jpegs, 224, train=True, seeds=seeds)
    assert ok.all()
    again, _ = decode_images(jpegs, 224, train=True, seeds=seeds)
    np.testing.assert_array_equal(base, again)  # deterministic given seeds
    zoomed, ok2 = decode_images(
        jpegs, 224, train=True, seeds=seeds, aug=AugmentationCfg(scale=(0.05, 0.1))
    )
    assert ok2.all()
    assert not np.array_equal(base, zoomed)  # tighter crop bounds change every sample
    assert all(not np.array_equal(base[i], zoomed[i]) for i in range(len(jpegs)))
    squared, ok3 = decode_images(
        jpegs, 224, train=True, seeds=seeds, aug=AugmentationCfg(ratio=(1.0, 1.0))
    )
    assert ok3.all() and not np.array_equal(base, squared)
    # eval decode ignores aug entirely
    e0, _ = decode_images(jpegs, 224, train=False)
    e1, _ = decode_images(jpegs, 224, train=False, aug=AugmentationCfg(scale=(0.05, 0.1)))
    np.testing.assert_array_equal(e0, e1)


def test_grayscale_and_erasing(jpegs):
    seeds = np.arange(len(jpegs), dtype=np.uint64)
    base, _ = decode_images(jpegs, 224, train=True, seeds=seeds)
    rng = np.random.default_rng(0)
    gray = apply_pixel_augment(base.copy(), rng, AugmentationCfg(grayscale_prob=1.0))
    assert np.array_equal(gray[..., 0], gray[..., 1])
    assert np.array_equal(gray[..., 1], gray[..., 2])
    # luma weights: channel value ~= round(0.299R + 0.587G + 0.114B)
    expect = np.clip(base.astype(np.float32) @ _LUMA + 0.5, 0, 255).astype(np.uint8)
    assert np.abs(gray[..., 0].astype(int) - expect.astype(int)).max() <= 1

    erased = apply_pixel_augment(
        base.copy(), np.random.default_rng(1), AugmentationCfg(re_prob=1.0, re_count=2)
    )
    changed = (erased != base).any(-1).reshape(len(jpegs), -1).mean(-1)
    # every sample has an erased region covering >=2% and (well) under half the image
    assert (changed >= 0.015).all() and (changed <= 0.7).all()


def test_color_jitter_semantics():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8)
    # brightness-only with factor range [1-f, 1+f]: output is a global scaling per sample
    out = apply_pixel_augment(
        img.copy(), np.random.default_rng(2), AugmentationCfg(color_jitter=(0.9, 0.0, 0.0))
    )
    ratios = out.astype(np.float32) / np.maximum(img.astype(np.float32), 1)
    # one multiplicative factor per sample (clipping aside): low dispersion around median
    for i in range(4):
        r = ratios[i][(img[i] > 30) & (out[i] < 250)]
        assert r.std() < 0.08, "brightness must be a single per-sample scale"
    # saturation=max pushes toward/away from per-pixel luma; gray pixels stay fixed
    gray = np.full((1, 8, 8, 3), 128, np.uint8)
    sat = apply_pixel_augment(
        gray.copy(), np.random.default_rng(3), AugmentationCfg(color_jitter=(0.0, 0.0, 0.9))
    )
    assert np.abs(sat.astype(int) - 128).max() <= 1, "saturation fixes gray pixels"


def test_wds_reader_applies_aug(tmp_path):
    rng = np.random.default_rng(7)
    tar_path = tmp_path / "shard-000000.tar"
    with tarfile.open(tar_path, "w") as tf:
        for i in range(8):
            data = _jpeg_bytes(rng)
            info = tarfile.TarInfo(f"{i:06d}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            cap = f"caption {i}".encode()
            info = tarfile.TarInfo(f"{i:06d}.txt")
            info.size = len(cap)
            tf.addfile(info, io.BytesIO(cap))

    def batches(aug_cfg):
        r = WdsReader(str(tar_path), batch_size=8, train=True, seed=0,
                      shuffle_buffer=0, aug_cfg=aug_cfg)
        return next(iter(r))

    plain = batches(None)
    plain2 = batches(None)
    np.testing.assert_array_equal(plain["image"], plain2["image"])
    gray = batches({"grayscale_prob": 1.0})
    assert np.array_equal(gray["image"][..., 0], gray["image"][..., 2])
    zoom = batches({"scale": (0.05, 0.1)})
    assert not np.array_equal(zoom["image"], plain["image"])
    np.testing.assert_array_equal(zoom["text"], plain["text"])


def test_cli_plumbs_aug_cfg(tmp_path, monkeypatch):
    """--aug-cfg reaches build_dataset's data kwargs for a real dataset type."""
    from multimodal_tpu.train.params import parse_args

    args = parse_args([
        "--dataset-type", "webdataset", "--train-data", "/tmp/none-{000000..000000}.tar",
        "--aug-cfg", "scale=(0.4,0.9)", "color_jitter=0.3", "grayscale_prob=0.1",
    ])
    assert args.aug_cfg == {"scale": (0.4, 0.9), "color_jitter": 0.3,
                            "grayscale_prob": 0.1}
    cfg = parse_aug_cfg(dict(args.aug_cfg))
    assert cfg.scale == (0.4, 0.9) and cfg.color_jitter == (0.3, 0.3, 0.3)


def test_hflip_key_flips_with_probability():
    from multimodal_tpu.data.augment import apply_pixel_augment, parse_aug_cfg

    cfg = parse_aug_cfg({"hflip": 1.0})
    assert cfg.hflip == 1.0 and cfg.has_pixel_aug
    batch = np.arange(2 * 4 * 4 * 3, dtype=np.uint8).reshape(2, 4, 4, 3)
    out = apply_pixel_augment(batch.copy(), np.random.default_rng(0), cfg)
    np.testing.assert_array_equal(out, batch[:, :, ::-1])
    # prob 0 -> untouched
    cfg0 = parse_aug_cfg({"hflip": 0.0, "re_prob": 0.0})
    assert cfg0 is not None and not cfg0.hflip


def test_timm_prob_keys():
    """timm create_transform's simclr knobs: color_jitter_prob gates the jitter, and
    gray_scale_prob is accepted as timm's spelling of grayscale_prob."""
    cfg = parse_aug_cfg({"color_jitter": 0.4, "color_jitter_prob": 0.0,
                         "gray_scale_prob": 0.3})
    assert cfg.color_jitter == (0.4, 0.4, 0.4) and cfg.color_jitter_prob == 0.0
    assert cfg.grayscale_prob == 0.3

    batch = np.arange(2 * 4 * 4 * 3, dtype=np.uint8).reshape(2, 4, 4, 3)
    # prob 0: jitter never applies (grayscale off) -> bytes untouched
    cfg0 = parse_aug_cfg({"color_jitter": 0.4, "color_jitter_prob": 0.0})
    out = apply_pixel_augment(batch.copy(), np.random.default_rng(0), cfg0)
    np.testing.assert_array_equal(out, batch)
    # prob 1 matches the always-on torchvision semantics on the same rng stream
    cfg1 = parse_aug_cfg({"color_jitter": 0.4, "color_jitter_prob": 1.0})
    always = parse_aug_cfg({"color_jitter": 0.4})
    r1, r2 = np.random.default_rng(1), np.random.default_rng(1)
    out1 = apply_pixel_augment(batch.copy(), r1, cfg1)
    # replicate the prob draw so both streams align before the jitter factors
    _ = r2.uniform()
    out2 = apply_pixel_augment(batch.copy(), r2, always)
    np.testing.assert_array_equal(out1[0], out2[0])
