"""Pallas TPU flash attention (forward + backward), MXU-tiled, full and causal variants.

Blocked online-softmax attention: forward saves only the per-row logsumexp; backward
recomputes probability blocks on-chip (dQ and dK/dV kernels), so the [B, H, S, S] matrix
never touches HBM in either direction (the FlashAttention-2 decomposition). Replaces the
reference's torch.nn.MultiheadAttention compute (align_clip/transformer.py:193-290).

Performance notes (measured on v5e):
  * head_dim is NOT padded to the 128-lane width — D=64 operands run at half-MXU width,
    which is still 2x cheaper than zero-padding the contraction;
  * causal grids predicate fully-masked blocks off (skip compute, keep accumulator state);
  * k tiles are 256 wide to amortize per-program overhead;
  * at CLIP sequence lengths (50-257 tokens) XLA's fused batched einsum wins regardless —
    the probs tensor is small and fusion is excellent — so auto-dispatch
    (multimodal_tpu.ops.attention) only selects flash for long sequences where the S^2
    HBM blowup dominates. The kernel is the long-context path, not the ViT path.

Public API: ``flash_attention(q, k, v, causal=False)`` over ``[B, S, H, D]`` — same layout as
multimodal_tpu.ops.attention. Differentiable via custom_vjp. On non-TPU backends the kernels
run in the Pallas interpreter so the CPU test mesh exercises identical code paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_tpu.ops.pallas_util import sds

BLOCK_Q = 128  # default q tile (sublane dimension of the MXU)
BLOCK_K = 256  # default k tile; larger k blocks amortize per-program overhead
LANES = 128
SUBLANE = 16  # bf16 sublane quantum — q tiles may shrink to this for short sequences


def _block_sizes(sq: int, sk: int) -> tuple[int, int]:
    """Shrink tiles for short sequences: padding waste dominates at CLIP lengths
    (S=77 padded to 128x256 is 5x wasted MXU work). q tiles quantize to the 16-row
    sublane, k tiles to the 128 lanes."""
    bq = min(BLOCK_Q, _round_up(sq, SUBLANE))
    bk = min(BLOCK_K, _round_up(sk, LANES))
    return bq, bk
NEG_INF = -1e30  # finite stand-in for -inf: keeps exp()/max() NaN-free on fully-masked rows


def _precision(dtype):
    """fp32 inputs get exact MXU passes (Precision.HIGHEST); bf16 uses the fast path."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def flash_supported(q_shape, k_shape, causal: bool = False) -> bool:
    """Gate for automatic dispatch, set from v5e measurements: causal long-context is where
    the kernel beats XLA's fused einsum (block skipping + no S^2 HBM traffic); for full
    attention and for short sequences XLA wins. head_dim must fit one lane block."""
    b, sq, h, d = q_shape
    # sq == sk: the kernel's causal mask is top-left aligned (col <= row); the XLA path
    # is bottom-right aligned (tril k=sk-sq) — for sq != sk the two disagree, so the
    # auto dispatch must not switch semantics silently
    return causal and d <= LANES and k_shape[1] >= 2048 and sq == k_shape[1]


def _causal_live(qi, ki, block_q: int, block_k: int):
    """True unless the (qi, ki) block lies entirely above the causal diagonal."""
    return (ki * block_k) <= (qi * block_q + block_q - 1)


def _mask(s, qi, ki, *, causal, seq_len_k, block_q, block_k):
    col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    valid = col < seq_len_k
    if causal:
        row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        valid = jnp.logical_and(valid, col <= row)
    return jnp.where(valid, s, NEG_INF)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, *, sm_scale,
                causal, seq_len_k, block_q, block_k, num_k_blocks, precision):
    qi, ki = pl.program_id(2), pl.program_id(3)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    live = _causal_live(qi, ki, block_q, block_k) if causal else True

    @pl.when(live)
    def _():
        # native-dtype matmul operands + f32 accumulation: bf16 inputs keep the MXU at
        # full rate (explicit f32 casts halved it); softmax stats stay f32 in scratch
        q = q_ref[0, 0]  # [BQ, D]
        k = k_ref[0, 0]  # [BK, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        ) * sm_scale  # [BQ, BK]
        s = _mask(s, qi, ki, causal=causal, seq_len_k=seq_len_k,
                  block_q=block_q, block_k=block_k)

        m_prev = m_scr[:, 0:1]  # [BQ, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)  # [BQ, BK] f32
        alpha = jnp.exp(m_prev - m_new)  # [BQ, 1]
        l_scr[:] = jnp.broadcast_to(
            l_scr[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True), l_scr.shape
        )
        acc_scr[:] = acc_scr[:] * alpha + jnp.dot(
            p.astype(q.dtype), v_ref[0, 0], preferred_element_type=jnp.float32,
            precision=precision,
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(ki == num_k_blocks - 1)
    def _():
        l = l_scr[:, 0:1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)
        lse_ref[0, 0] = jnp.broadcast_to(
            m_scr[:, 0:1] + jnp.log(safe_l), lse_ref.shape[2:]
        )


def _fwd(q, k, v, causal: bool, sm_scale: float, true_sk: int):
    """q/k/v: [B, H, Sp, D] padded along S; true_sk = unpadded key length (mask bound).
    Returns (out [B,H,Sp,D], lse [B,H,Sp,LANES])."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    bq, bk = _block_sizes(sq, sk)
    nq, nk = sq // bq, sk // bk
    grid = (b, h, nq, nk)

    kv_spec = pl.BlockSpec((1, 1, bk, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0))
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel,
            sm_scale=sm_scale,
            causal=causal,
            seq_len_k=true_sk,
            block_q=bq,
            block_k=bk,
            num_k_blocks=nk,
            precision=_precision(q.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            kv_spec,
            kv_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, bq, LANES), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        ],
        out_shape=[
            sds((b, h, sq, d), q.dtype, q),
            sds((b, h, sq, LANES), jnp.float32, q),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q, k, v)
    return out, lse


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _recompute_p(q_blk, k_blk, lse_blk, *, sm_scale, causal, seq_len_k, qi, ki,
                 block_q, block_k, precision):
    """Recompute the probability block P = exp(S - lse) with masking.
    Operands in their native dtype (f32 accumulation); returns f32 probabilities."""
    s = jax.lax.dot_general(
        q_blk, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    ) * sm_scale
    s = _mask(s, qi, ki, causal=causal, seq_len_k=seq_len_k,
              block_q=block_q, block_k=block_k)
    return jnp.exp(s - lse_blk)  # masked entries: exp(NEG_INF - lse) == 0


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr, *,
               sm_scale, causal, seq_len_k, block_q, block_k, num_k_blocks, precision):
    qi, ki = pl.program_id(2), pl.program_id(3)

    @pl.when(ki == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    live = _causal_live(qi, ki, block_q, block_k) if causal else True

    @pl.when(live)
    def _():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        p = _recompute_p(
            q, k, lse_ref[0, 0][:, 0:1], sm_scale=sm_scale, causal=causal,
            seq_len_k=seq_len_k, qi=qi, ki=ki,
            block_q=block_q, block_k=block_k, precision=precision,
        )
        do = do_ref[0, 0]
        dp = jax.lax.dot_general(
            do, v_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [BQ, BK]
        ds = (p * (dp - delta_ref[0, 0][:, 0:1])).astype(q.dtype)
        dq_scr[:] += sm_scale * jnp.dot(
            ds, k, preferred_element_type=jnp.float32, precision=precision
        )

    @pl.when(ki == num_k_blocks - 1)
    def _():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                dk_scr, dv_scr, *, sm_scale, causal, seq_len_k, block_q, block_k,
                num_q_blocks, precision):
    # grid is (b, h, k-block, q-block): qi is the INNER (accumulating) dimension
    ki, qi = pl.program_id(2), pl.program_id(3)

    @pl.when(qi == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    live = _causal_live(qi, ki, block_q, block_k) if causal else True

    @pl.when(live)
    def _():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        p = _recompute_p(
            q, k, lse_ref[0, 0][:, 0:1], sm_scale=sm_scale, causal=causal,
            seq_len_k=seq_len_k, qi=qi, ki=ki,
            block_q=block_q, block_k=block_k, precision=precision,
        )  # [BQ, BK] f32
        p_lp = p.astype(q.dtype)
        do = do_ref[0, 0]
        # dV += P^T dO
        dv_scr[:] += jax.lax.dot_general(
            p_lp, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        )
        dp = jax.lax.dot_general(
            do, v_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        ds = (p * (dp - delta_ref[0, 0][:, 0:1])).astype(q.dtype)  # [BQ, BK]
        # dK += dS^T Q * scale
        dk_scr[:] += sm_scale * jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        )

    @pl.when(qi == num_q_blocks - 1)
    def _():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd(causal, sm_scale, true_sk, residuals, g):
    q, k, v, out, lse = residuals
    b, h, sq, d = q.shape
    sk = k.shape[2]
    bq, bk = _block_sizes(sq, sk)
    nq, nk = sq // bq, sk // bk

    do = g
    # delta_i = rowsum(dO * O) — cheap elementwise, let XLA fuse it; broadcast to lane width
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # [B,H,Sq]
    delta = jnp.broadcast_to(delta[..., None], (b, h, sq, LANES))

    q_spec = pl.BlockSpec((1, 1, bq, d), lambda bi, hi, i, j: (bi, hi, i, 0))
    row_spec = pl.BlockSpec((1, 1, bq, LANES), lambda bi, hi, i, j: (bi, hi, i, 0))

    # dQ: grid over q blocks (parallel), k blocks innermost (accumulating)
    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, sm_scale=sm_scale, causal=causal, seq_len_k=true_sk,
            block_q=bq, block_k=bk, num_k_blocks=nk,
            precision=_precision(q.dtype),
        ),
        grid=(b, h, nq, nk),
        in_specs=[
            q_spec,
            pl.BlockSpec((1, 1, bk, d), lambda bi, hi, i, j: (bi, hi, j, 0)),  # k
            pl.BlockSpec((1, 1, bk, d), lambda bi, hi, i, j: (bi, hi, j, 0)),  # v
            q_spec,  # do
            row_spec,  # lse
            row_spec,  # delta
        ],
        out_specs=q_spec,
        out_shape=sds(q.shape, q.dtype, q),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q, k, v, do, lse, delta)

    # dK/dV: grid over k blocks (parallel), q blocks innermost (accumulating)
    kv_spec = pl.BlockSpec((1, 1, bk, d), lambda bi, hi, i, j: (bi, hi, i, 0))
    q_inner = pl.BlockSpec((1, 1, bq, d), lambda bi, hi, i, j: (bi, hi, j, 0))
    row_inner = pl.BlockSpec((1, 1, bq, LANES), lambda bi, hi, i, j: (bi, hi, j, 0))
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, sm_scale=sm_scale, causal=causal, seq_len_k=true_sk,
            block_q=bq, block_k=bk, num_q_blocks=nq,
            precision=_precision(q.dtype),
        ),
        grid=(b, h, nk, nq),
        in_specs=[
            q_inner,  # q
            kv_spec,  # k
            kv_spec,  # v
            q_inner,  # do
            row_inner,  # lse
            row_inner,  # delta
        ],
        out_specs=[kv_spec, kv_spec],
        out_shape=[
            sds(k.shape, k.dtype, q),
            sds(v.shape, v.dtype, q),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public API: [B, S, H, D] layout with padding + custom_vjp
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_padded(q, k, v, causal: bool, sm_scale: float, true_sk: int):
    out, _ = _fwd(q, k, v, causal, sm_scale, true_sk)
    return out


def _flash_padded_fwd(q, k, v, causal, sm_scale, true_sk):
    out, lse = _fwd(q, k, v, causal, sm_scale, true_sk)
    return out, (q, k, v, out, lse)


_flash_padded.defvjp(_flash_padded_fwd, _bwd)


def flash_attention(q, k, v, *, causal: bool = False, sm_scale: float | None = None):
    """Flash attention over [B, S, H, D]; returns [B, Sq, H, D] in v.dtype.

    Pads Sq to 128-token and Sk to 256-token tiles; padding is masked in-kernel (keys) or
    sliced off (queries) and is gradient-exact. head_dim is used unpadded (must be <= 128).
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if d > LANES:
        raise ValueError(f"head_dim {d} > {LANES} unsupported")
    if sm_scale is None:
        sm_scale = d ** -0.5

    bq, bk = _block_sizes(sq, sk)
    sq_p, sk_p = _round_up(sq, bq), _round_up(sk, bk)

    def prep(x, s_p):
        x = jnp.transpose(x, (0, 2, 1, 3))  # [B, H, S, D]
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_p - x.shape[2]), (0, 0)))

    out = _flash_padded(prep(q, sq_p), prep(k, sk_p), prep(v, sk_p), causal, sm_scale, sk)
    out = out[:, :, :sq, :]
    return jnp.transpose(out, (0, 2, 1, 3)).astype(v.dtype)
