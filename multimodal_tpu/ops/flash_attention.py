"""Pallas flash-attention for TPU (placeholder until the kernel lands).

``flash_supported`` gates automatic dispatch from multimodal_tpu.ops.attention; it returns
False until the MXU-tiled kernel is implemented, so callers transparently fall back to XLA.
"""

from __future__ import annotations


def flash_supported(q_shape, k_shape) -> bool:
    return False


def flash_attention(q, k, v, *, causal: bool = False):
    raise NotImplementedError("Pallas flash attention kernel not yet wired in")
