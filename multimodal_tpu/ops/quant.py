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


def _int8_product(x, w):
    """Dynamic W8A8 product y ~= x @ w on the int8 MXU path: per-row activation scales,
    per-output-channel weight scales, int32 accumulation, f32 rescale."""
    xq, sx = quantize_rows(x)
    wq, sw = quantize_weight(w)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return acc.astype(jnp.float32) * sx[..., None] * sw


@jax.custom_vjp
def int8_dense_train(x, w):
    """Training-path int8 GEMM (SwitchBack recipe — Wortsman et al. 2023, developed on
    CLIP): forward AND the input-gradient GEMM run W8A8 on the 2x-rate int8 MXU with
    dynamic (calibration-free) scales; the weight gradient stays full precision, since
    dw = x^T g reduces over the large token axis where int8 row scales are least
    faithful and the MXU win is smallest. Covers 2/3 of a dense layer's GEMM FLOPs.

    x: [..., in] bf16/f32, w: [in, out] f32. Returns [..., out] in x.dtype.
    Opt in per model via CLIPConfig.int8_forward / --precision int8."""
    return _int8_product(x, w).astype(x.dtype)


def _int8_dense_fwd(x, w):
    return int8_dense_train(x, w), (x, w)


def _int8_dense_bwd(res, g):
    x, w = res
    # dx = g @ w^T, also on the int8 path: per-row grad scales, per-column scales of w^T
    # (= per-input-channel of w)
    gq, sg = quantize_rows(g)
    wtq, swt = quantize_weight(w.T.astype(jnp.float32))
    acc = jax.lax.dot_general(
        gq, wtq, (((g.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    dx = (acc.astype(jnp.float32) * sg[..., None] * swt).astype(x.dtype)
    # dw = x^T @ g in full precision over the flattened token axis
    x2 = x.reshape(-1, x.shape[-1])
    g2 = g.reshape(-1, g.shape[-1])
    dw = jax.lax.dot_general(
        x2, g2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(w.dtype)
    return dx, dw


int8_dense_train.defvjp(_int8_dense_fwd, _int8_dense_bwd)


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
