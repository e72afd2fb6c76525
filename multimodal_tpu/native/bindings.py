"""ctypes bindings for the native input pipeline (libmmtpu_data.so).

Loads the shared library if built (``make -C multimodal_tpu/native``), builds it on first
use when a toolchain is present, and degrades gracefully: ``available()`` is False when
neither works and callers (multimodal_tpu/data) fall back to the PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libmmtpu_data.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO):
            try:
                subprocess.run(
                    ["make", "-C", _DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.mm_decode_batch.restype = ctypes.c_int
        lib.mm_decode_batch.argtypes = [
            ctypes.c_void_p,  # blob
            ctypes.POINTER(ctypes.c_int64),  # offsets [n+1]
            ctypes.c_int,  # n
            ctypes.c_int,  # size
            ctypes.c_int,  # mode
            ctypes.POINTER(ctypes.c_uint64),  # seeds (nullable)
            ctypes.c_void_p,  # out
            ctypes.c_void_p,  # ok flags
            ctypes.c_int,  # threads
        ]
        if hasattr(lib, "mm_decode_batch_aug"):
            lib.mm_decode_batch_aug.restype = ctypes.c_int
            lib.mm_decode_batch_aug.argtypes = lib.mm_decode_batch.argtypes + [
                ctypes.c_double,  # scale_lo
                ctypes.c_double,  # scale_hi
                ctypes.c_double,  # ratio_lo
                ctypes.c_double,  # ratio_hi
            ]
        lib.mm_is_jpeg.restype = ctypes.c_int
        lib.mm_is_jpeg.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.mm_tar_index.restype = ctypes.c_void_p
        lib.mm_tar_index.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)]
        lib.mm_free.restype = None
        lib.mm_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_batch(
    buffers: list[bytes],
    image_size: int = 224,
    train: bool = False,
    seeds: np.ndarray | None = None,
    num_threads: int | None = None,
    scale: tuple[float, float] = (0.9, 1.0),
    ratio: tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> tuple[np.ndarray, np.ndarray]:
    """Decode a batch of JPEG byte strings -> (images [N,S,S,3] uint8, ok [N] bool).

    Failed decodes come back as black frames with ok=False (the reference's per-sample
    failure absorption, main/data.py:276-279). Non-JPEG inputs fail here; route them
    through the PIL fallback using ``is_jpeg`` first. ``scale``/``ratio`` set the train
    RandomResizedCrop bounds (--aug-cfg, reference transform.py:18-27).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native pipeline unavailable; build multimodal_tpu/native first")
    n = len(buffers)
    offsets = np.zeros(n + 1, np.int64)
    for i, b in enumerate(buffers):
        offsets[i + 1] = offsets[i] + len(b)
    blob = b"".join(buffers)
    out = np.empty((n, image_size, image_size, 3), np.uint8)
    ok = np.empty(n, np.uint8)
    if train:
        if seeds is None:
            seeds = np.random.default_rng().integers(0, 2**63, n, dtype=np.uint64)
        seeds = np.ascontiguousarray(seeds, np.uint64)
        seeds_p = seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
    else:
        seeds_p = None
    threads = num_threads or min(os.cpu_count() or 8, 16)
    common = (
        blob,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        image_size,
        1 if train else 0,
        seeds_p,
        out.ctypes.data_as(ctypes.c_void_p),
        ok.ctypes.data_as(ctypes.c_void_p),
        threads,
    )
    default_bounds = scale == (0.9, 1.0) and ratio == (3.0 / 4.0, 4.0 / 3.0)
    if default_bounds or not hasattr(lib, "mm_decode_batch_aug"):
        if not default_bounds:
            raise RuntimeError(
                "libmmtpu_data.so predates mm_decode_batch_aug; rebuild "
                "multimodal_tpu/native to use non-default --aug-cfg crop bounds"
            )
        lib.mm_decode_batch(*common)
    else:
        lib.mm_decode_batch_aug(*common, scale[0], scale[1], ratio[0], ratio[1])
    return out, ok.astype(bool)


def is_jpeg(data: bytes) -> bool:
    lib = _load()
    if lib is None:
        return data[:3] == b"\xff\xd8\xff"
    return bool(lib.mm_is_jpeg(data, len(data)))


def tar_index(path: str) -> list[tuple[str, int, int]]:
    """Scan a tar shard -> [(member_name, payload_offset, size)] for regular files."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native pipeline unavailable")
    out_len = ctypes.c_int64(0)
    ptr = lib.mm_tar_index(path.encode(), ctypes.byref(out_len))
    if not ptr:
        raise FileNotFoundError(path)
    try:
        raw = ctypes.string_at(ptr, out_len.value).decode("utf-8", errors="replace")
    finally:
        lib.mm_free(ptr)
    entries = []
    for line in raw.splitlines():
        name, off, size = line.rsplit("\t", 2)
        entries.append((name, int(off), int(size)))
    return entries


# ---------------------------------------------------------------------------
# native BPE tokenizer
# ---------------------------------------------------------------------------

_bpe_handle = None
_bpe_lock = threading.Lock()


def _bpe(vocab_path: str):
    global _bpe_handle
    lib = _load()
    if lib is None:
        return None
    with _bpe_lock:
        if _bpe_handle is None:
            if not hasattr(lib, "mm_bpe_create"):
                return None
            lib.mm_bpe_create.restype = ctypes.c_void_p
            lib.mm_bpe_create.argtypes = [ctypes.c_char_p]
            lib.mm_bpe_encode_batch.restype = ctypes.c_int
            lib.mm_bpe_encode_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ]
            lib.mm_bpe_fast_eligible.restype = ctypes.c_int
            lib.mm_bpe_fast_eligible.argtypes = [ctypes.c_char_p, ctypes.c_int64]
            _bpe_handle = lib.mm_bpe_create(vocab_path.encode())
        return _bpe_handle


def bpe_encode_batch(texts, vocab_path: str, context_length: int = 77):
    """Native fast-path batch tokenize -> int32 [N, ctx], or None when any caption needs
    the Python tokenizer (non-ASCII / HTML entities) or the library is unavailable."""
    handle = _bpe(vocab_path)
    if not handle:
        return None
    lib = _load()
    try:
        encoded = [t.encode("ascii") for t in texts]
    except UnicodeEncodeError:
        return None
    starts = np.zeros(len(texts) + 1, np.int64)
    acc = 0
    for i, b in enumerate(encoded):
        starts[i] = acc
        acc += len(b)
    starts[len(texts)] = acc
    blob = b"".join(encoded)
    out = np.zeros((len(texts), context_length), np.int32)
    rc = lib.mm_bpe_encode_batch(
        handle, blob, starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(texts), context_length, out.ctypes.data_as(ctypes.c_void_p),
    )
    return out if rc == 0 else None
