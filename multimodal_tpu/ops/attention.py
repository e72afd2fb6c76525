"""Multi-head attention compute paths.

Two implementations behind one API:
  * ``xla`` — einsum + f32 softmax; XLA fuses this well at CLIP's sequence lengths (77 text /
    50-257 vision tokens) and it runs on any backend;
  * ``flash`` — the Pallas MXU-tiled flash-attention kernel (multimodal_tpu/ops/flash_attention.py),
    used automatically on TPU for shapes that tile cleanly.

Semantics mirror torch.nn.MultiheadAttention as used by the reference encoders
(align_clip/transformer.py:193-290): scaled dot-product, optional additive causal mask, no
dropout in the contrastive encoders.

Layout is ``[batch, seq, heads, head_dim]`` throughout (TPU-friendly: keeps the lane dimension
contiguous for the MXU and avoids the reference's LND permutes).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, causal: bool, mask):
    b, sq, h, d = q.shape
    scale = 1.0 / (d ** 0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if causal:
        sk = k.shape[1]
        causal_mask = jnp.tril(jnp.ones((sq, sk), bool), k=sk - sq)
        logits = jnp.where(causal_mask[None, None], logits, -jnp.inf)
    if mask is not None:
        logits = logits + mask.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@functools.partial(jax.named_call, name="mha_attention")
def attention(q, k, v, *, causal: bool = False, mask=None, impl: str = "auto"):
    """Scaled dot-product multi-head attention.

    q, k, v: [B, S, H, Dh]; mask: optional additive [B, H, Sq, Sk] (or broadcastable);
    returns [B, Sq, H, Dh] in v.dtype.
    """
    if impl == "auto":
        impl = "xla"
        if (
            mask is None
            and jax.devices()[0].platform == "tpu"
            and not os.environ.get("MMTPU_DISABLE_FLASH")
        ):
            from multimodal_tpu.ops.flash_attention import flash_supported

            if flash_supported(q.shape, k.shape, causal):
                impl = "flash"
    if impl == "flash":
        from multimodal_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, causal=causal)
    return _xla_attention(q, k, v, causal, mask)
