"""Multi-head attention compute paths.

Three implementations behind one API, dispatched by measured performance on v5e:
  * ``fused`` — whole-sequence Pallas kernel (ops/fused_attention.py) for CLIP-scale
    self-attention (S <= 512): consumes the packed [B, S, H*D] layout directly (no head
    relayout copies) and never materializes the S x S matrix in HBM; the default on TPU
    for the encoder shapes;
  * ``flash`` — the blocked online-softmax kernel (ops/flash_attention.py) for long causal
    sequences (S >= 2048) where streaming is required;
  * ``xla`` — einsum + f32 softmax; runs on any backend and handles arbitrary masks.

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
        # finite sentinel (same convention as the fused/flash/block/ring kernels):
        # -inf would turn a fully-masked row into NaN instead of a uniform distribution
        logits = jnp.where(causal_mask[None, None], logits, -1e30)
    if mask is not None:
        logits = logits + jnp.maximum(mask.astype(logits.dtype), -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@functools.partial(jax.named_call, name="mha_attention")
def attention(q, k, v, *, causal: bool = False, mask=None, impl: str = "auto"):
    """Scaled dot-product multi-head attention.

    q, k, v: [B, S, H, Dh]; mask: optional additive [B, H, Sq, Sk] (or broadcastable);
    returns [B, Sq, H, Dh] in v.dtype.
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if impl == "auto":
        impl = "xla"
        if mask is None and jax.devices()[0].platform == "tpu":
            from multimodal_tpu.ops.flash_attention import flash_supported
            from multimodal_tpu.ops.fused_attention import fused_supported

            if (
                sq == sk
                and fused_supported(sk, d)
                and not os.environ.get("MMTPU_DISABLE_FUSED_ATTN")
            ):
                impl = "fused"
            elif flash_supported(q.shape, k.shape, causal) and not os.environ.get(
                "MMTPU_DISABLE_FLASH"
            ):
                impl = "flash"
    if impl in ("fused", "flash") and mask is not None:
        raise ValueError(
            f"impl={impl!r} does not support an additive mask — it would be silently "
            "dropped; use impl='xla' (or 'auto', which routes masked calls to XLA)"
        )
    if impl == "fused" and sq != sk:
        raise ValueError("impl='fused' requires sq == sk (self-attention)")
    if impl == "fused":
        from multimodal_tpu.ops.fused_attention import fused_attention

        out = fused_attention(
            q.reshape(b, sq, h * d),
            k.reshape(b, sk, h * d),
            v.reshape(b, sk, h * d),
            heads=h,
            causal=causal,
        )
        return out.reshape(b, sq, h, d)
    if impl == "flash":
        from multimodal_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, causal=causal)
    return _xla_attention(q, k, v, causal, mask)
