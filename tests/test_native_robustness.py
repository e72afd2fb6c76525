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
