"""Fused whole-sequence attention for CLIP-scale lengths (S <= ~256), Pallas TPU.

The encoder hot path: XLA's batched-einsum attention is matmul-efficient but (a) relayouts
q/k/v from the Dense output layout [B, S, H*D] to head-major (measured ~17 ms/step of pure
copies for ViT-B/32 @ B=256) and (b) materializes the f32 [B, H, S, S] logits+probs in HBM.
At CLIP lengths the whole S x S attention of one head fits comfortably in VMEM, so this
kernel processes entire heads per program — no streaming softmax, no relayout (operands are
consumed directly in [B, S, H*D]), nothing round-trips to HBM.

Layout rules force the last block dim to a multiple of 128 lanes, so each program handles
``128 // head_dim`` heads (2 for the CLIP family's D=64) with an unrolled in-kernel loop.
The backward recomputes the exact softmax per program (cheaper than saving probs) and emits
dq/dk/dv in one kernel. Both directions are jit-exact against the XLA path.

Dispatched from multimodal_tpu.ops.attention for TPU when S fits; the blocked flash kernel
(flash_attention.py) remains the long-context path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_tpu.ops.pallas_util import sds

LANES = 128
SUBLANE = 16
# dispatch window, measured fwd+bwd on v5e @ B=256: below ~128 tokens XLA's saved-probs
# backward beats the recompute (S=77: 0.78 vs 2.1 ms); above, dodging the S^2 HBM traffic
# wins (S=197: 5.6 vs 8.2 ms). Beyond 512 use the streaming flash kernel.
MIN_FUSED_SEQ = 128
MAX_FUSED_SEQ = 512
NEG_INF = -1e30


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fused_supported(seq_len: int, head_dim: int) -> bool:
    return head_dim in (32, 64, 128) and MIN_FUSED_SEQ <= seq_len <= MAX_FUSED_SEQ


def _valid_mask(sp: int, true_s: int, causal: bool):
    row = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    valid = col < true_s
    if causal:
        valid = jnp.logical_and(valid, col <= row)
    return valid


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, heads_per_block, head_dim, sp, true_s,
                causal, sm_scale):
    valid = _valid_mask(sp, true_s, causal)
    for g in range(heads_per_block):
        sl = slice(g * head_dim, (g + 1) * head_dim)
        # native-dtype operands + f32 accumulation: bf16 inputs keep the MXU at full rate
        # (explicit f32 casts halved it); probs drop to the compute dtype for P@V
        q = q_ref[0][:, sl]  # [Sp, D]
        k = k_ref[0][:, sl]
        v = v_ref[0][:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        s = jnp.where(valid, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = (p / jnp.sum(p, axis=1, keepdims=True)).astype(q.dtype)
        o_ref[0, :, sl] = jnp.dot(
            p, v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, heads_per_block,
                head_dim, sp, true_s, causal, sm_scale):
    valid = _valid_mask(sp, true_s, causal)
    for g in range(heads_per_block):
        sl = slice(g * head_dim, (g + 1) * head_dim)
        q = q_ref[0][:, sl]
        k = k_ref[0][:, sl]
        v = v_ref[0][:, sl]
        do = do_ref[0][:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        s = jnp.where(valid, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p32 = p / jnp.sum(p, axis=1, keepdims=True)  # exact probs, recomputed
        p = p32.astype(q.dtype)  # compute dtype for the matmuls (matches fwd's P@V)

        dv = jax.lax.dot_general(  # P^T dO
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(  # dO V^T
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        delta = jnp.sum(dp * p32, axis=1, keepdims=True)  # rowsum(dP * P)
        ds = (p32 * (dp - delta)).astype(q.dtype)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * sm_scale
        dk = jax.lax.dot_general(  # dS^T Q
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _heads_per_block(heads: int, head_dim: int) -> int:
    """Blocks need >=128 lanes OR the full width; pick the grouping that divides heads."""
    g = max(LANES // head_dim, 1)
    if heads % g == 0:
        return g
    return heads  # whole-width block (allowed: equal to the array's last dim)


def _call(kernel, n_out, q, k, v, *extra, heads, head_dim, true_s, causal, sm_scale):
    b, sp, w = q.shape
    g = _heads_per_block(heads, head_dim)
    block_w = g * head_dim
    spec = pl.BlockSpec((1, sp, block_w), lambda bi, hi: (bi, 0, hi))
    kern = functools.partial(
        kernel, heads_per_block=g, head_dim=head_dim, sp=sp, true_s=true_s,
        causal=causal, sm_scale=sm_scale,
    )
    outs = pl.pallas_call(
        kern,
        grid=(b, heads // g),
        in_specs=[spec] * (3 + len(extra)),
        out_specs=[spec] * n_out if n_out > 1 else spec,
        out_shape=(
            [sds((b, sp, w), v.dtype, v)] * n_out
            if n_out > 1
            else sds((b, sp, w), v.dtype, v)
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(q, k, v, *extra)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _fused(q, k, v, heads, head_dim, true_s, causal, sm_scale):
    return _call(_fwd_kernel, 1, q, k, v, heads=heads, head_dim=head_dim,
                 true_s=true_s, causal=causal, sm_scale=sm_scale)


def _fused_fwd(q, k, v, heads, head_dim, true_s, causal, sm_scale):
    out = _fused(q, k, v, heads, head_dim, true_s, causal, sm_scale)
    return out, (q, k, v)


def _fused_bwd(heads, head_dim, true_s, causal, sm_scale, residuals, g):
    q, k, v = residuals
    dq, dk, dv = _call(
        _bwd_kernel, 3, q, k, v, g.astype(v.dtype), heads=heads, head_dim=head_dim,
        true_s=true_s, causal=causal, sm_scale=sm_scale,
    )
    return dq, dk, dv


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_attention(q, k, v, *, heads: int, causal: bool = False,
                    sm_scale: float | None = None):
    """Whole-sequence fused attention over [B, S, H*D] packed heads.

    Returns [B, S, H*D] in v.dtype. S is padded to the 16-row sublane internally."""
    b, s, w = q.shape
    head_dim = w // heads
    if sm_scale is None:
        sm_scale = head_dim ** -0.5
    from multimodal_tpu.ops.pallas_util import match_vma

    k, v = match_vma(q, k, v)  # shard_map check_vma (cross-attention callers)
    sp = max(_round_up(s, SUBLANE), SUBLANE)

    def prep(x):
        return jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))

    out = _fused(prep(q), prep(k), prep(v), heads, head_dim, s, causal, sm_scale)
    return out[:, :s]
