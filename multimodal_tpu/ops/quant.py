"""Int8 matmul primitives for the quantized serving path.

v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 vs 197 TOPS peak; measured
~1.4x end-to-end in a chained-matmul loop including the requantize traffic — see
docs/DESIGN.md). Serving is forward-only, so W8A8 dynamic quantization applies:

  * weights: symmetric per-OUTPUT-channel int8 (one f32 scale per column) — computed once
    at load time; 4x less HBM for the weight stream as a bonus;
  * activations: symmetric per-ROW (per-token) int8, scales computed on the fly inside the
    jitted forward — XLA fuses the max/round/cast chain into the surrounding ops;
  * accumulation in int32 on the MXU, rescale to bf16: y = (xq @ wq) * (sx . sw).

No calibration pass needed (dynamic activation scales), no training-path changes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w, dtype=jnp.float32):
    """[in, out] f32 weight -> (int8 weight, [out] f32 per-column scale)."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return wq, scale.astype(dtype)


def quantize_rows(x):
    """[..., in] activations -> (int8 activations, [...] per-row scale)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127).astype(
        jnp.int8
    )
    return xq, scale


def int8_matmul(x, wq, wscale, bias=None, out_dtype=jnp.bfloat16):
    """y = x @ dequant(wq) with the product taken on the int8 MXU path.

    x: [..., in] bf16/f32; wq: [in, out] int8; wscale: [out] f32. Returns [..., out].
    """
    xq, xscale = quantize_rows(x)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * xscale[..., None] * wscale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)
