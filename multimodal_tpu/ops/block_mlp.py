"""Fused MLP residual branch — LN + c_fc + activation + c_proj + residual add, Pallas TPU.

The MLP half of a pre-LN residual block (align_clip/transformer.py:214-223's
``x + mlp(ln_2(x))``) is bandwidth-bound glue around two large matmuls: XLA materializes
the [T, 4W] hidden twice (fc1 output, then the activation pass writes it again), round-trips
the [T, W] stream through the LayerNorm, and reads two operands for the residual add. At
ViT-B/16 training dims (T = 256*197 tokens, W=768) that is ~1.4 GB of HBM traffic per layer
forward on top of the ~0.5 GB the matmuls themselves need (measured: the standalone
[256,197,3072] activation fusions run 1.37 ms/layer/step — pure bandwidth).

This kernel runs the whole branch as ONE program per tile of M tokens:

  * forward: y = x + act(LN(x) @ W1 + b1) @ W2 + b2 with LN, activation, and the residual
    add all in-VMEM. Traffic: read x, write y (+ the [M, 4W] pre-activation saved bf16 for
    backward on the training path — cheaper than recomputing its matmul);
  * backward: recomputes LN statistics from x (VPU-cheap), reads the saved pre-activation,
    and ACCUMULATES the weight gradients dW1/dW2 in f32 VMEM across the sequential grid —
    unlike the attention kernel (block_attention.py), whose per-token grads are only W wide
    and therefore cheap to hand to XLA, the MLP's dh is 4W wide: emitting it to HBM would
    cost more traffic than the fusion saves. Bias/LN-parameter grads accumulate the same way.

Semantics match the XLA path (models/layers.py MLP + LayerNorm + residual) to bf16 rounding.
Counterpart of the reference's ResidualAttentionBlock MLP half
(align_clip/transformer.py:193-248).

MEASURED NEGATIVE, kept gated OFF (opt-in via MMTPU_BLOCK_MLP=1): the end-to-end A/B on
ViT-B/16 bf16 B=256 (same-day control, attention-residual fusion held on in both arms)
read 815.5 vs 845.7 samples/s/chip — the [T,4W] bf16 pre-activation save and the
sequential ("arbitrary"-grid) weight-grad accumulation cost more than the LN/activation/
residual HBM traffic the fusion deletes; XLA's composition already hides those round
trips behind the MXU (docs/DESIGN.md). The kernel stays for width/shape regimes where
the trade flips (and as the measured record of why not to retry at CLIP widths).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_tpu.ops.pallas_util import sds

from multimodal_tpu.ops.block_attention import VMEM_LIMIT, _interpret, _ln_rows

ACTS = ("quick_gelu", "gelu")
_SQRT_2_OVER_PI = 0.7978845608028654
_GELU_C = 0.044715


def block_mlp_supported(width: int, hidden: int, act: str) -> bool:
    return width % 128 == 0 and hidden % 128 == 0 and act in ACTS


def _tile_rows(fwd: bool, itemsize: int) -> int:
    env = os.environ.get("MMTPU_BLOCK_MLP_M_FWD" if fwd else "MMTPU_BLOCK_MLP_M_BWD")
    if env:
        return int(env)
    # fwd VMEM/program ~25 MB at M=512 bf16 (weights 9.4 + f32 hidden 6 + tiles); bwd
    # carries the two f32 weight-grad accumulators (18.9 MB at W=768) so it halves the
    # tile; f32 operands (tests/debug) halve both again to stay inside the scoped limit
    m = 512 if fwd else 256
    return m if itemsize <= 2 else m // 2


def _act_fwd(h32, act: str):
    """Activation on the pre-activation (dtype-generic; f32 in backward)."""
    if act == "quick_gelu":
        return h32 * jax.nn.sigmoid(1.702 * h32)
    u = _SQRT_2_OVER_PI * (h32 + _GELU_C * h32 * h32 * h32)
    return 0.5 * h32 * (1.0 + jnp.tanh(u))


def _act_bwd(h32, act: str):
    """d(act)/dh at the f32 pre-activation; returns f32."""
    if act == "quick_gelu":
        s = jax.nn.sigmoid(1.702 * h32)
        return s + h32 * 1.702 * s * (1.0 - s)
    u = _SQRT_2_OVER_PI * (h32 + _GELU_C * h32 * h32 * h32)
    t = jnp.tanh(u)
    du = _SQRT_2_OVER_PI * (1.0 + 3.0 * _GELU_C * h32 * h32)
    return 0.5 * (1.0 + t) + 0.5 * h32 * (1.0 - t * t) * du


def _ln_stats(x):
    """f32 (xhat, inv) of a [M, W] tile — the statistics half of _ln_rows."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(jnp.square(x32), axis=-1, keepdims=True) - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + 1e-5)
    return (x32 - mean) * inv, inv


def _dot(a, b, dims):
    # default dot precision deliberately: for f32 operands both XLA and Mosaic lower to a
    # single-bf16-pass MXU matmul (measured 2.7e-3 relative error vs f64 for BOTH, identical
    # bits on a bare matmul), so the kernel matches the model's --precision fp32 semantics
    # AND its speed; HIGHEST would be ~6x the MXU passes. bf16 operands are native either way.
    return jax.lax.dot_general(a, b, (dims, ((), ())), preferred_element_type=jnp.float32)


def _fwd_kernel(x_ref, gamma_ref, beta_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                y_ref, h_ref=None, *, act, residual):
    x = x_ref[...]
    ln = _ln_rows(x, gamma_ref[...], beta_ref[...], 1e-5)
    h = (_dot(ln, w1_ref[...], ((1,), (0,)))
         + b1_ref[...].astype(jnp.float32)).astype(x.dtype)
    if h_ref is not None:
        h_ref[...] = h
    # activation evaluated in f32 from the compute-dtype-ROUNDED pre-activation (Mosaic
    # rejects the bf16 sigmoid's f32-scalar broadcast); backward sees the identical h via
    # h_ref, and the result is rounded back to compute dtype before the second matmul
    g = _act_fwd(h.astype(jnp.float32), act).astype(x.dtype)
    y = _dot(g, w2_ref[...], ((1,), (0,))) + b2_ref[...].astype(jnp.float32)
    if residual:
        y = y + x.astype(jnp.float32)
    y_ref[...] = y.astype(x.dtype)


def _bwd_kernel(x_ref, dy_ref, h_ref, gamma_ref, beta_ref, w1_ref, w2_ref,
                dx_ref, dw1_ref, dw2_ref, db1_ref, db2_ref, dgamma_ref, dbeta_ref,
                *, act, residual):
    @pl.when(pl.program_id(0) == 0)
    def _zero():
        for ref in (dw1_ref, dw2_ref, db1_ref, db2_ref, dgamma_ref, dbeta_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    x = x_ref[...]
    dy = dy_ref[...]
    h = h_ref[...]
    gamma = gamma_ref[...]
    dy32 = dy.astype(jnp.float32)
    h32 = h.astype(jnp.float32)
    xhat, inv = _ln_stats(x)
    # the EXACT ln the forward fed to W1 (compute-dtype arithmetic, _ln_rows numerics)
    ln = (xhat.astype(x.dtype) * gamma.astype(x.dtype)
          + beta_ref[...].astype(x.dtype))
    g = _act_fwd(h32, act).astype(x.dtype)

    dg = _dot(dy, w2_ref[...], ((1,), (1,)))            # [M, H] f32
    dh32 = dg * _act_bwd(h32, act)
    dh = dh32.astype(x.dtype)
    dln = _dot(dh, w1_ref[...], ((1,), (1,)))           # [M, W] f32

    # weight grads accumulated across the (sequential) grid: bf16 operands, f32 sums
    dw2_ref[...] += _dot(g, dy, ((0,), (0,)))           # [H, W]
    dw1_ref[...] += _dot(ln, dh, ((0,), (0,)))          # [W, H]
    rows = db1_ref.shape[0]

    def vec(acc32):  # [N] f32 -> broadcast to the ref's 8 sublanes (all rows identical)
        return jnp.broadcast_to(acc32[None, :], (rows, acc32.shape[0]))

    db1_ref[...] += vec(jnp.sum(dh32, axis=0))
    db2_ref[...] += vec(jnp.sum(dy32, axis=0))
    dgamma_ref[...] += vec(jnp.sum(dln * xhat, axis=0))
    dbeta_ref[...] += vec(jnp.sum(dln, axis=0))

    dxhat = dln * gamma.astype(jnp.float32)
    dx = inv * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    if residual:
        dx = dx + dy32
    dx_ref[...] = dx.astype(x.dtype)


def _specs(m, w, h):
    xspec = pl.BlockSpec((m, w), lambda i: (i, 0))
    gspec = pl.BlockSpec((w,), lambda i: (0,))
    w1spec = pl.BlockSpec((w, h), lambda i: (0, 0))
    b1spec = pl.BlockSpec((h,), lambda i: (0,))
    w2spec = pl.BlockSpec((h, w), lambda i: (0, 0))
    return xspec, gspec, w1spec, b1spec, w2spec


def _pad_rows(a, m):
    t = a.shape[0]
    rem = t % m
    return a if rem == 0 else jnp.pad(a, ((0, m - rem), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _block_mlp(x, gamma, beta, w1, b1, w2, b2, act, residual):
    return _fwd_call(x, gamma, beta, w1, b1, w2, b2, act, residual, save_h=False)[0]


def _fwd_call(x, gamma, beta, w1, b1, w2, b2, act, residual, save_h):
    t, w = x.shape
    h = w1.shape[1]
    m = min(_tile_rows(True, x.dtype.itemsize), t)
    xp = _pad_rows(x, m)
    tp = xp.shape[0]
    xspec, gspec, w1spec, b1spec, w2spec = _specs(m, w, h)
    out_shape = [sds((tp, w), x.dtype, x)]
    out_specs = [xspec]
    if save_h:
        out_shape.append(sds((tp, h), x.dtype, x))
        out_specs.append(pl.BlockSpec((m, h), lambda i: (i, 0)))
    kern = functools.partial(_fwd_kernel, act=act, residual=residual)
    outs = pl.pallas_call(
        kern,
        grid=(tp // m,),
        in_specs=[xspec, gspec, gspec, w1spec, b1spec, w2spec, gspec],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",), vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=_interpret(),
    )(xp, gamma, beta, w1, b1, w2, b2)
    y = outs[0][:t]
    return y, (outs[1][:t] if save_h else None)


def _block_mlp_fwd(x, gamma, beta, w1, b1, w2, b2, act, residual):
    y, h = _fwd_call(x, gamma, beta, w1, b1, w2, b2, act, residual, save_h=True)
    return y, (x, gamma, beta, w1, w2, h)


def _block_mlp_bwd(act, residual, residuals, dy):
    x, gamma, beta, w1, w2, h = residuals
    t, w = x.shape
    hid = w1.shape[1]
    m = min(_tile_rows(False, x.dtype.itemsize), t)
    xp, dyp, hp = _pad_rows(x, m), _pad_rows(dy, m), _pad_rows(h, m)
    tp = xp.shape[0]
    xspec, gspec, w1spec, _, w2spec = _specs(m, w, hid)
    hspec = pl.BlockSpec((m, hid), lambda i: (i, 0))
    f32 = jnp.float32
    acc = lambda *s: pl.BlockSpec(s, lambda i: tuple(0 for _ in s))  # noqa: E731
    kern = functools.partial(_bwd_kernel, act=act, residual=residual)
    dx, dw1, dw2, db1, db2, dgamma, dbeta = pl.pallas_call(
        kern,
        grid=(tp // m,),
        in_specs=[xspec, xspec, hspec, gspec, gspec, w1spec, w2spec],
        out_specs=[xspec, acc(w, hid), acc(hid, w), acc(8, hid), acc(8, w),
                   acc(8, w), acc(8, w)],
        out_shape=[
            sds((tp, w), x.dtype, x),
            sds((w, hid), f32, x),
            sds((hid, w), f32, x),
            sds((8, hid), f32, x),
            sds((8, w), f32, x),
            sds((8, w), f32, x),
            sds((8, w), f32, x),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=_interpret(),
    )(xp, dyp, hp, gamma, beta, w1, w2)
    return (dx[:t], dgamma[0].astype(gamma.dtype), dbeta[0].astype(beta.dtype),
            dw1.astype(w1.dtype), db1[0].astype(w1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(w2.dtype))


_block_mlp.defvjp(_block_mlp_fwd, _block_mlp_bwd)


def block_mlp(x, w1, b1, w2, b2, *, ln_scale, ln_bias, act: str = "quick_gelu",
              residual: bool = True):
    """Fused pre-LN MLP residual branch: ``x + act(LN(x) @ w1 + b1) @ w2 + b2``.

    x: [B, S, W] or [T, W] (raw, pre-LN); w1 [W, H], w2 [H, W]; weights in x.dtype.
    ``act``: "quick_gelu" (CLIP) or "gelu" (tanh approximation, flax default).
    With ``residual=False`` returns the branch value alone.

    Counterpart of the reference block's ``x + self.mlp(self.ln_2(x))``
    (align_clip/transformer.py:214-248). Disable with MMTPU_DISABLE_BLOCK_MLP=1 (A/B)."""
    if act not in ACTS:
        raise ValueError(f"act must be one of {ACTS}")
    from multimodal_tpu.ops.pallas_util import match_vma

    # shard_map check_vma: replicated weights must be pvaried to x's axes (no-op outside)
    w1, b1, w2, b2, ln_scale, ln_bias = match_vma(x, w1, b1, w2, b2, ln_scale, ln_bias)
    shape = x.shape
    if x.ndim == 3:
        x = x.reshape(-1, shape[-1])
    y = _block_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, act, residual)
    return y.reshape(shape)
