"""Native-code robustness: adversarial/corrupt inputs must fail safely, never crash the
process (the C++ runs in the trainer's address space — a segfault kills training)."""

import io
import tarfile

import numpy as np
import pytest
from PIL import Image

from multimodal_tpu.native import bindings as native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def test_decode_batch_fuzz_garbage():
    rng = np.random.default_rng(0)
    bufs = [bytes(rng.integers(0, 256, rng.integers(0, 4096), dtype=np.uint8).tobytes())
            for _ in range(32)]
    # prepend JPEG magic to half so they enter the libjpeg path and fail inside it
    bufs = [b"\xff\xd8\xff" + b if i % 2 else b for i, b in enumerate(bufs)]
    out, ok = native.decode_batch(bufs, 64)
    assert out.shape == (32, 64, 64, 3)
    assert not ok.any()  # all garbage -> all absorbed


def test_decode_batch_truncated_jpeg():
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "JPEG")
    whole = b.getvalue()
    cuts = [whole[: len(whole) // d] for d in (2, 3, 5, 9)] + [whole]
    out, ok = native.decode_batch(cuts, 32)
    assert ok[-1]  # the intact one decodes
    assert out.shape == (5, 32, 32, 3)  # truncated ones absorbed either way, no crash


def test_tar_index_fuzz(tmp_path):
    # random bytes
    p = tmp_path / "garbage.tar"
    p.write_bytes(np.random.default_rng(2).integers(0, 256, 4096, dtype=np.uint8).tobytes())
    native.tar_index(str(p))  # must not crash; content may be nonsense entries

    # truncated real tar
    real = tmp_path / "real.tar"
    with tarfile.open(real, "w") as tar:
        payload = b"x" * 1000
        info = tarfile.TarInfo("a.txt")
        info.size = len(payload)
        tar.addfile(info, io.BytesIO(payload))
    data = real.read_bytes()
    trunc = tmp_path / "trunc.tar"
    trunc.write_bytes(data[: len(data) // 2])
    entries = native.tar_index(str(trunc))
    assert any(name == "a.txt" for name, _, _ in entries)

    with pytest.raises(FileNotFoundError):
        native.tar_index(str(tmp_path / "missing.tar"))


def test_bpe_fuzz_ascii():
    from multimodal_tpu.data.tokenizer import DEFAULT_BPE_PATH, tokenize
    from multimodal_tpu.native.bindings import bpe_encode_batch

    rng = np.random.default_rng(3)
    printable = [chr(c) for c in range(32, 127) if chr(c) != "&"]  # & gates to Python
    cases = ["".join(rng.choice(printable, rng.integers(0, 200))) for _ in range(50)]
    nat = bpe_encode_batch(cases, DEFAULT_BPE_PATH)
    assert nat is not None
    py = tokenize(cases, use_native=False)
    np.testing.assert_array_equal(nat, py)


def _photo_jpeg(side=320, quality=92):
    """A smooth 'natural' test image (gradients + shapes) — random noise is a
    meaningless quality target for lossy-decode comparisons."""
    y, x = np.mgrid[0:side, 0:side].astype(np.float32) / side
    r = (127 + 90 * np.sin(6.28 * x) * np.cos(3.14 * y)).astype(np.uint8)
    g = (np.clip(255 * ((x - 0.5) ** 2 + (y - 0.5) ** 2) * 2, 0, 255)).astype(np.uint8)
    b = (255 * x * y).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(np.stack([r, g, b], -1)).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def test_fast_train_decode_matches_exact_path(monkeypatch):
    """The crop-folded fractional-DCT train path must draw the SAME crop as the exact
    path (identical RNG stream) and produce near-identical pixels on natural content —
    the quality gate for the default-on fast decode."""
    import os

    from multimodal_tpu.data.wds import decode_images

    bufs = [_photo_jpeg(s) for s in (256, 320, 480)]
    seeds = np.arange(len(bufs), dtype=np.uint64)
    fast, ok1 = decode_images(bufs, 224, train=True, seeds=seeds)
    monkeypatch.setenv("MMTPU_TRAIN_FAST_DECODE", "0")
    exact, ok2 = decode_images(bufs, 224, train=True, seeds=seeds)
    monkeypatch.delenv("MMTPU_TRAIN_FAST_DECODE")
    assert ok1.all() and ok2.all()
    for i in range(len(bufs)):
        diff = np.abs(fast[i].astype(int) - exact[i].astype(int))
        # same crop rect => global structure identical; DCT low-pass vs full decode +
        # bicubic differ only in high-frequency rounding
        assert diff.mean() < 3.0, f"img {i}: mean |fast-exact| {diff.mean():.2f}"
        assert np.corrcoef(fast[i].ravel(), exact[i].ravel())[0, 1] > 0.99


def test_fast_train_decode_determinism_and_corrupt():
    from multimodal_tpu.data.wds import decode_images

    bufs = [b"\xff\xd8garbage-after-soi", _photo_jpeg(300)]
    seeds = np.arange(2, dtype=np.uint64)
    a, ok = decode_images(bufs, 224, train=True, seeds=seeds)
    b, ok2 = decode_images(bufs, 224, train=True, seeds=seeds)
    assert list(ok) == [False, True] and list(ok2) == [False, True]
    assert np.array_equal(a, b)
    assert (a[0] == 0).all()  # corrupt -> black frame, absorbed
