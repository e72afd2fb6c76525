"""Whole-block attention for short-to-medium sequences (S <= MAX_BLOCK_SEQ = 320), Pallas TPU.

The CLIP encoder regime (vision S=50, text S=77 @ B=256) spends more time moving data than
multiplying it: XLA's attention relayouts q/k/v to head-major ([B,S,W] copies), writes the
f32 [B,H,S,S] probs to HBM in forward and reads them back in backward, and leaves the QKV/out
projections as four separate matmuls with layout boundaries (measured ~1.1 ms/block of
fwd+bwd overhead beyond the pure projection matmuls, segment probe on v5e).

This kernel fuses the whole attention half of a residual block — QKV projections + per-image
per-head softmax(QK^T)V + output projection — into ONE program per group of G images:

  * the projection matmuls ([G*S, W] @ [W, W]) give each program MXU-sized work, which the
    earlier whole-sequence kernel (fused_attention.py) lacked at short S (its per-(batch,
    head-pair) programs were [64,128]-tiny — 3.1 ms vs XLA's 1.2 ms at S=50);
  * q/k/v/probs/attention outputs never exist in HBM: no relayout copies, no S^2 traffic;
  * backward recomputes q/k/v/probs in-VMEM (cheaper than saving: probs alone would be
    30 MB/block), emits dx plus the per-token gradients dq/dk/dv and the pre-projection
    attention output, and leaves the [W, G*S]@[G*S, W] weight-gradient reductions to XLA
    where they are single efficient matmuls over the whole batch.

Semantics match the XLA path (scaled dot-product over heads, optional causal mask) to bf16
rounding; counterpart of the reference's nn.MultiheadAttention core
(align_clip/transformer.py:193-248).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_tpu.ops.pallas_util import sds

NEG_INF = -1e30
MAX_BLOCK_SEQ = 320
# v5e/v5p have 128 MB of VMEM; the default 16 MB scoped limit rejects the S>128 block
# shapes (measured 21.6 MB at S=197), so raise it for these kernels specifically
VMEM_LIMIT = 64 * 1024 * 1024


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def block_attn_supported(batch: int, seq: int, width: int, heads: int) -> bool:
    head_dim = width // heads
    # Lane-aligned head_dims (32/64/128: sublane-free per-head slices) and other
    # 8-multiples (ViT-H/14's 80, ViT-g/14's 88 — Mosaic lowers the misaligned lane
    # slices with shuffles) are both DEFAULT-ON: the head-dim-80 A/B measured the kernel
    # at 98.9 samples/s vs 77.7 on the XLA fallback for ViT-H/14 b32 (+27%, MFU 57.5 vs
    # 45.2, BENCH r3 sweep). MMTPU_BLOCK_ATTN_ALIGNED_ONLY=1 reverts to the aligned set.
    import os

    dim_ok = head_dim in (32, 64, 128) or (
        head_dim % 8 == 0
        and head_dim < 128
        and not os.environ.get("MMTPU_BLOCK_ATTN_ALIGNED_ONLY")
    )
    return dim_ok and width % 128 == 0 and seq <= MAX_BLOCK_SEQ


def _images_per_program(batch: int, seq: int, fwd: bool) -> int:
    # VMEM budget expressed as total resident tokens per program (weights + x/y blocks +
    # per-image q/k/v/probs temporaries): 1024 tokens fwd (G=8 at the S=128 design point),
    # half that bwd, which carries 5 output blocks; at S>128 the backward runs one image
    # per program (stacked [H*S,S] buffers dominate; G=2 measured no gain at S=208).
    # MMTPU_BLOCK_ATTN_{FWD,BWD}_TOKENS override the budget for measured A/Bs.
    import os

    env = os.environ.get(
        "MMTPU_BLOCK_ATTN_FWD_TOKENS" if fwd else "MMTPU_BLOCK_ATTN_BWD_TOKENS"
    )
    if env:
        max_tokens = int(env)
    else:
        max_tokens = 1024 if fwd else (512 if seq <= 128 else 256)
    # larger groups under the raised VMEM limit regress (g=16/8 at S=50 measured 2185
    # vs 2385 samples/s: fewer grid programs = coarser DMA/compute pipelining)
    for g in (8, 4, 2, 1) if fwd else (4, 2, 1):
        if batch % g == 0 and g * seq <= max_tokens:
            return g
    return 1


def _causal_mask(s: int):
    row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    return col <= row


def _proj(x, w_ref, b_ref):
    """[R, W] @ [W, N] + b, f32 accumulation, result in x.dtype.

    MMTPU_BLOCK_ATTN_INT8=1 (experiment): run the projection W8A8 on the int8 MXU with
    in-VMEM dynamic scales (per-row activations, per-column weights) — the in-kernel
    counterpart of ops/quant.int8_dense_train's forward, for the attention share that
    the XLA-side --precision int8 cannot reach."""
    import os

    if os.environ.get("MMTPU_BLOCK_ATTN_INT8") == "1":
        w = w_ref[...]
        xa = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
        sx = jnp.maximum(xa, 1e-12) * (1.0 / 127.0)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
        wa = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
        sw = jnp.maximum(wa, 1e-12) * (1.0 / 127.0)
        wq = jnp.clip(jnp.round(w.astype(jnp.float32) / sw), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        y = acc.astype(jnp.float32) * sx * sw
        return (y + b_ref[...].astype(jnp.float32)).astype(x.dtype)
    y = jax.lax.dot_general(
        x, w_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return (y + b_ref[...].astype(jnp.float32)).astype(x.dtype)


def _ln_rows(x, gamma, beta, eps):
    """Row-wise LayerNorm with f32 statistics and compute-dtype arithmetic — the exact
    numerics of models.layers._LNCore (the reference's LayerNormFp32), so the fused-LN
    kernel path and the unfused XLA path quantize identically."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(jnp.square(x32), axis=-1, keepdims=True) - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
    return y * gamma.astype(x.dtype) + beta.astype(x.dtype)


def _stacked_probs(q, k, heads, head_dim, scale, causal, kv_len=None):
    """All heads' softmax probabilities as ONE [H*S, S] f32 array: tiny per-head logit dots
    write into a stacked buffer so the 5-pass softmax runs vectorized once instead of H
    times (the per-head [S,S] softmaxes were the kernel's hot spot at S=50).

    kv_len < S marks the tail keys as padding (the tile-alignment pad of the large-S
    whole-group path) and excludes them from the softmax."""
    s = q.shape[0]
    rows = []
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        # native-dtype operands + f32 accumulation: bf16 inputs keep the MXU at full
        # rate (explicit f32 casts halved it) while the products still accumulate in f32
        rows.append(jax.lax.dot_general(
            q[:, sl], k[:, sl],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ))
    logits = jnp.concatenate(rows, axis=0) * scale  # [H*S, S]
    masked = causal or (kv_len is not None and kv_len < s)
    if masked:
        # stacked mask built directly at [H*S, S] (tiling a bool vector is not a
        # legal vreg cast in Mosaic)
        row = jax.lax.broadcasted_iota(jnp.int32, (heads * s, s), 0) % s
        col = jax.lax.broadcasted_iota(jnp.int32, (heads * s, s), 1)
        keep = (col <= row) if causal else jnp.full(logits.shape, True)
        if kv_len is not None and kv_len < s:
            keep = jnp.logical_and(keep, col < kv_len)
        logits = jnp.where(keep, logits, NEG_INF)
    import os

    if os.environ.get("MMTPU_BLOCK_ATTN_NOSOFTMAX"):
        # TIMING PROBE ONLY (wrong numerics): bounds the softmax's share of kernel time
        return logits * (1.0 / s)
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    # MEASURED DEAD END, kept for A/B (MMTPU_BLOCK_ATTN_MXU_SUM=1): the softmax is 56%
    # of the isolated forward kernel (NOSOFTMAX probe 0.661 -> 0.390 ms) and moving the
    # row-sum onto the MXU as a [H*S,S]@[S,128] ones matmul measured -18% on the kernel
    # alone — but -2.3% END TO END (B/32 back-to-back: 2467.9/2458.2 VPU vs
    # 2416.5/2404.1 MXU): with the TensorCore at 100% occupancy the in-kernel VPU
    # softmax overlaps the schedule's surrounding MXU work, and the ones-matmul steals
    # exactly those contended cycles. The VPU sum stays the default both directions.
    if os.environ.get("MMTPU_BLOCK_ATTN_MXU_SUM") == "1":
        denom = jax.lax.dot_general(
            p, jnp.ones((s, 128), p.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )[:, :1]
        return p / denom
    return p / jnp.sum(p, axis=1, keepdims=True)


def _attend(q, k, v, heads, head_dim, scale, causal, kv_len=None):
    """Per-image attention on [S, W]-packed heads; returns [S, W] pre-projection output."""
    s = q.shape[0]
    p = _stacked_probs(q, k, heads, head_dim, scale, causal, kv_len).astype(q.dtype)
    outs = []
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        outs.append(jnp.dot(
            p[h * s : (h + 1) * s], v[:, sl],
            preferred_element_type=jnp.float32,
        ))
    return jnp.concatenate(outs, axis=1)


def _fwd_kernel(x_ref, *refs, g_imgs, heads, head_dim,
                scale, causal, kv_len=None, group_proj=True, ln_eps=None,
                residual=False):
    # NOTE: the four (LN x group) branches below are deliberately spelled out rather than
    # factored through shared helpers: Mosaic's lowering is sensitive to the exact traced
    # op sequence at these shapes (an innocuous [G,S,W]->[G*S,W] merge once sent ViT-B/16
    # compiles past 18 minutes — see the in-branch comments and docs/DESIGN.md), so each
    # measured-good trace is kept verbatim. The guards differ on purpose: the non-LN
    # group branch also requires g_imgs > 1 (at g=1 the collapse buys nothing), while the
    # LN fold is only enabled at S>128 where the group path is always profitable.
    if ln_eps is not None:
        gamma, beta, wq, bq, wk, bk, wv, bv, wo, bo, y_ref = refs
    else:
        gamma = beta = None
        wq, bq, wk, bk, wv, bv, wo, bo, y_ref = refs
    s, w = x_ref.shape[1], x_ref.shape[2]
    if ln_eps is not None:
        # pre-LN fold: normalize the residual-stream block in VMEM; the LN output never
        # exists in HBM (saves one [B,S,W] write + read per layer vs the XLA pre-pass)
        x_all = _ln_rows(
            x_ref[...].reshape(g_imgs * s, w), gamma[...], beta[...], ln_eps
        )
        if group_proj:
            q = _proj(x_all, wq, bq)
            k = _proj(x_all, wk, bk)
            v = _proj(x_all, wv, bv)
            outs = []
            for g in range(g_imgs):
                r = slice(g * s, (g + 1) * s)
                outs.append(
                    _attend(q[r], k[r], v[r], heads, head_dim, scale, causal, kv_len))
            attn = jnp.concatenate(outs, axis=0).astype(x_all.dtype)
            y = _proj(attn, wo, bo).reshape(g_imgs, s, w)
            # fused residual: the raw pre-LN stream is already resident — adding it here
            # deletes the whole [B,S,W] XLA add op (2 reads + 1 write of HBM per layer)
            y_ref[...] = y + x_ref[...] if residual else y
            return
        for g in range(g_imgs):
            x = x_all[g * s : (g + 1) * s]
            q = _proj(x, wq, bq)
            k = _proj(x, wk, bk)
            v = _proj(x, wv, bv)
            attn = _attend(q, k, v, heads, head_dim, scale, causal, kv_len).astype(x.dtype)
            y = _proj(attn, wo, bo)
            y_ref[g] = y + x_ref[g] if residual else y
        return
    if group_proj and g_imgs > 1:
        # ONE [G*S, W] matmul per projection: per-image [S, W] projs leave the MXU at M=50
        # (measured 74 vs 134 TF/s on the same-size MLP matmuls). At S>128 the collapse
        # requires the 16-aligned sequence pad (block_attention wrapper): the unaligned
        # [G,197,W] -> [G*197,W] merge sent Mosaic's lowering pathological (ViT-B/16
        # compile >18 min); at S_pad=208 it is a free view.
        x = x_ref[...].reshape(g_imgs * s, w)
        q = _proj(x, wq, bq)
        k = _proj(x, wk, bk)
        v = _proj(x, wv, bv)
        outs = []
        for g in range(g_imgs):
            r = slice(g * s, (g + 1) * s)
            outs.append(_attend(q[r], k[r], v[r], heads, head_dim, scale, causal, kv_len))
        attn = jnp.concatenate(outs, axis=0).astype(x.dtype)
        y_ref[...] = _proj(attn, wo, bo).reshape(g_imgs, s, w)
        return
    for g in range(g_imgs):
        x = x_ref[g]  # [S, W]
        q = _proj(x, wq, bq)
        k = _proj(x, wk, bk)
        v = _proj(x, wv, bv)
        attn = _attend(q, k, v, heads, head_dim, scale, causal, kv_len).astype(x.dtype)
        y_ref[g] = _proj(attn, wo, bo)


def _bwd_kernel(x_ref, dy_ref, *refs, g_imgs, heads, head_dim,
                scale, causal, kv_len=None, ln_eps=None, residual=False):
    if ln_eps is not None:
        (gamma, beta, wq, bq, wk, bk, wv, bv, wo, bo,
         dx_ref, dq_ref, dk_ref, dv_ref, attnpre_ref, ln_ref, dg_ref, db_ref) = refs
    else:
        gamma = beta = ln_ref = dg_ref = db_ref = None
        (wq, bq, wk, bk, wv, bv, wo, bo,
         dx_ref, dq_ref, dk_ref, dv_ref, attnpre_ref) = refs
    s, w = x_ref.shape[1], x_ref.shape[2]
    # whole-group [G*S, W] projections/recompute (see _fwd_kernel MXU note)
    x_all = x_ref[...].reshape(g_imgs * s, w)
    if ln_eps is not None:
        # recompute the fwd LN (f32 stats kept for the LN backward below); emit the LN
        # output so XLA's weight-gradient matmuls read it instead of recomputing
        x_raw32 = x_all.astype(jnp.float32)
        ln_mean = jnp.mean(x_raw32, axis=-1, keepdims=True)
        ln_var = jnp.maximum(
            jnp.mean(jnp.square(x_raw32), axis=-1, keepdims=True) - ln_mean * ln_mean, 0.0)
        ln_inv = jax.lax.rsqrt(ln_var + ln_eps)
        xhat = (x_all - ln_mean.astype(x_all.dtype)) * ln_inv.astype(x_all.dtype)
        x_all = (xhat * gamma[...].astype(x_all.dtype)
                 + beta[...].astype(x_all.dtype))
        ln_ref[...] = x_all.reshape(g_imgs, s, w)
    dy_all = dy_ref[...].reshape(g_imgs * s, w)
    q_all = _proj(x_all, wq, bq)
    k_all = _proj(x_all, wk, bk)
    v_all = _proj(x_all, wv, bv)
    # do = dy @ Wo^T  (contract dy's W with wo's output dim; native-dtype operands,
    # f32 accumulation — explicit f32 casts would halve the MXU rate on bf16)
    do_all = jax.lax.dot_general(
        dy_all, wo[...],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    do_all_lp = do_all.astype(x_all.dtype)
    dq_rows, dk_rows, dv_rows, attn_rows = [], [], [], []
    for g in range(g_imgs):
        r = slice(g * s, (g + 1) * s)
        q, k, v, do = q_all[r], k_all[r], v_all[r], do_all_lp[r]
        # probs in the compute dtype — matches what the forward's P@V consumed, so the
        # gradients are exact for the quantized forward
        p = _stacked_probs(q, k, heads, head_dim, scale, causal, kv_len).astype(
            x_all.dtype)  # [H*S, S]
        attn_parts, dv_parts, dp_rows = [], [], []
        for h in range(heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            ph = p[h * s : (h + 1) * s]
            vh = v[:, sl]
            doh = do[:, sl]
            attn_parts.append(jnp.dot(ph, vh, preferred_element_type=jnp.float32))
            # dv = P^T dO ; dP = dO V^T
            dv_parts.append(jax.lax.dot_general(
                ph, doh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32))
            dp_rows.append(jax.lax.dot_general(
                doh, vh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32))
        dp = jnp.concatenate(dp_rows, axis=0)  # [H*S, S] f32
        # dS = P*(dP - rowsum(dP*P)) — one vectorized pass across all heads
        p32 = p.astype(jnp.float32)
        ds = (p32 * (dp - jnp.sum(dp * p32, axis=1, keepdims=True))).astype(x_all.dtype)
        dq_parts, dk_parts = [], []
        for h in range(heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            dsh = ds[h * s : (h + 1) * s]
            dq_parts.append(jnp.dot(
                dsh, k[:, sl], preferred_element_type=jnp.float32) * scale)
            dk_parts.append(jax.lax.dot_general(
                dsh, q[:, sl], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale)
        dq_rows.append(jnp.concatenate(dq_parts, axis=1))
        dk_rows.append(jnp.concatenate(dk_parts, axis=1))
        dv_rows.append(jnp.concatenate(dv_parts, axis=1))
        attn_rows.append(jnp.concatenate(attn_parts, axis=1))
    dq = jnp.concatenate(dq_rows, axis=0).astype(x_all.dtype)  # [G*S, W]
    dk = jnp.concatenate(dk_rows, axis=0).astype(x_all.dtype)
    dv = jnp.concatenate(dv_rows, axis=0).astype(x_all.dtype)
    attnpre_ref[...] = jnp.concatenate(attn_rows, axis=0).astype(
        x_all.dtype).reshape(g_imgs, s, w)
    dq_ref[...] = dq.reshape(g_imgs, s, w)
    dk_ref[...] = dk.reshape(g_imgs, s, w)
    dv_ref[...] = dv.reshape(g_imgs, s, w)
    # dx = dq Wq^T + dk Wk^T + dv Wv^T — whole-group [G*S, W] matmuls, weights in VMEM
    dx = jax.lax.dot_general(
        dq, wq[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx += jax.lax.dot_general(
        dk, wk[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx += jax.lax.dot_general(
        dv, wv[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if ln_eps is not None:
        # LN backward in-VMEM: dx currently holds g = d(ln_out); per-program partial
        # dgamma/dbeta sums stream out as [1, W] rows for a single XLA reduction
        xhat32 = (x_raw32 - ln_mean) * ln_inv
        # Mosaic requires the sublane dim of an output block be 8-divisible: the [W]
        # partial sums ride in row 0 of an (8, W) block padded with zero rows, so the
        # wrapper's cross-program reduction is a plain sum
        zpad = jnp.zeros((7, w), jnp.float32)
        dg_ref[...] = jnp.concatenate(
            [jnp.sum(dx * xhat32, axis=0).reshape(1, w), zpad], axis=0)
        db_ref[...] = jnp.concatenate(
            [jnp.sum(dx, axis=0).reshape(1, w), zpad], axis=0)
        dxhat = dx * gamma[...].astype(jnp.float32)
        dx = ln_inv * (
            dxhat
            - jnp.mean(dxhat, axis=-1, keepdims=True)
            - xhat32 * jnp.mean(dxhat * xhat32, axis=-1, keepdims=True)
        )
    if residual:
        # y = x + f(LN(x)): the passthrough cotangent is dy itself, folded in-VMEM
        dx = dx + dy_all.astype(jnp.float32)
    dx_ref[...] = dx.astype(x_all.dtype).reshape(g_imgs, s, w)


def _bwd_kernel_large(x_ref, dy_ref, wq, bq, wk, bk, wv, bv, wo, bo,
                      dx_ref, dq_ref, dk_ref, dv_ref, attnpre_ref, *, g_imgs, heads,
                      head_dim, scale, causal, kv_len=None):
    """Backward for LONG-short sequences (128 < S <= 256, e.g. ViT-B/16's S=197).

    The stacked-[H*S, S] softmax layout of _bwd_kernel keeps three f32 [H*S, S] buffers
    plus concat copies live at once — 21.6 MB of VMEM at S=197/W=768, over the 16 MB
    scoped limit. Here each head's [S, S] probabilities live only inside one loop
    iteration and per-token gradients stream directly into the output refs; at this S the
    per-head softmax rows are wide enough that the stacked-vectorization trick no longer
    pays for its memory."""
    s = x_ref.shape[1]
    cmask = _causal_mask(s) if causal else None
    if kv_len is not None and kv_len < s:
        col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        kmask = col < kv_len
        cmask = kmask if cmask is None else jnp.logical_and(cmask, kmask)
    for g in range(g_imgs):
        x = x_ref[g]
        dy = dy_ref[g]
        q = _proj(x, wq, bq)
        k = _proj(x, wk, bk)
        v = _proj(x, wv, bv)
        do = jax.lax.dot_general(
            dy, wo[...],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        for h in range(heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            qh = q[:, sl]
            kh = k[:, sl]
            vh = v[:, sl]
            doh = do[:, sl]
            logits = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            ) * scale
            if cmask is not None:
                logits = jnp.where(cmask, logits, NEG_INF)
            m = jnp.max(logits, axis=1, keepdims=True)
            e = jnp.exp(logits - m)
            p32 = e / jnp.sum(e, axis=1, keepdims=True)
            p = p32.astype(x.dtype)
            attnpre_ref[g, :, sl] = jnp.dot(
                p, vh, preferred_element_type=jnp.float32).astype(x.dtype)
            dv_ref[g, :, sl] = jax.lax.dot_general(
                p, doh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            dp = jax.lax.dot_general(
                doh, vh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            ds = (p32 * (dp - jnp.sum(dp * p32, axis=1, keepdims=True))).astype(x.dtype)
            dq_ref[g, :, sl] = (jnp.dot(
                ds, kh, preferred_element_type=jnp.float32) * scale).astype(x.dtype)
            dk_ref[g, :, sl] = (jax.lax.dot_general(
                ds, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ) * scale).astype(x.dtype)
        # dx = dq Wq^T + dk Wk^T + dv Wv^T, reading the per-token grads back from VMEM refs
        dx = jax.lax.dot_general(
            dq_ref[g], wq[...],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        dx += jax.lax.dot_general(
            dk_ref[g], wk[...],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        dx += jax.lax.dot_general(
            dv_ref[g], wv[...],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        dx_ref[g] = dx.astype(x.dtype)


def _attn_wgrad(a, dz, out_dtype):
    """dw = a^T dz contracted over the token axis — the whole-batch weight-gradient
    reduction left to XLA by both backward variants.

    MMTPU_ATTN_WGRAD selects the formulation (identical math, different XLA layout
    pressure — see docs/DESIGN.md "copy tail"):
      flat (default): one [B*S, W]^T @ [B*S, W] dot. XLA's layout assignment wants
        batch-minor ({0,2,1}) operands for the N-contraction, and since a Pallas
        custom-call's output layout is pinned row-major ({2,1,0}), every kernel output
        feeding a wgrad pays a materialized transpose copy (~62 us each on B/32).
      batched: per-image [S, W]^T @ [S, W] batched dot on row-major operands, reduced
        over B afterwards — no batch-minor request, at the price of B smaller GEMMs
        plus a [B, W, W] f32 reduction.
    """
    f32 = jnp.float32
    if os.environ.get("MMTPU_ATTN_WGRAD") == "batched":
        acc = jax.lax.dot_general(
            a, dz, (((1,), (1,)), ((0,), (0,))), preferred_element_type=f32)
        return jnp.sum(acc, axis=0).astype(out_dtype)
    w = dz.shape[-1]
    return jax.lax.dot_general(
        a.reshape(-1, a.shape[-1]), dz.reshape(-1, w), (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).astype(out_dtype)


def _weight_specs(width: int):
    wspec = pl.BlockSpec((width, width), lambda i: (0, 0))
    bspec = pl.BlockSpec((width,), lambda i: (0,))
    return [wspec, bspec] * 4


def _group_proj_enabled(s: int) -> bool:
    """Whole-group [G*S, W] projections: always at short S; at S>128 only on a 16-aligned
    sequence (the wrapper pads to one) and not explicitly disabled."""
    import os

    if s <= 128:
        return True
    return s % 16 == 0 and not os.environ.get("MMTPU_BLOCK_ATTN_NO_LARGE_GROUP")


def stream_pad_len(batch: int, seq: int, width: int, heads: int) -> int | None:
    """The 16-aligned padded length a TOWER should hold its residual stream at, or None.

    At S>128 this kernel needs a 16-aligned sequence for the whole-group [G*S, W]
    projection collapse, and block_attention() pads/slices around every call when it
    isn't. Measured on ViT-B/16 (S=197->208, B=256), those externalized per-layer pads
    are ~10 ms/step of pure HBM byte-shuffling: `pad` + `slice` fwd and their transposes
    bwd, x12 layers (docs/DESIGN.md, B/16 step audit). A tower that pads ONCE after its
    stem, runs every block at the padded length with ``kv_len=<real S>``, and slices once
    before pooling deletes all of it. Real-row numerics are identical: padded keys are
    softmax-masked inside the kernel, padded query rows never feed real rows, and the
    final slice gives padded rows zero cotangent, so every weight gradient is exact.

    Returns None whenever per-call behavior would not pad anyway (short S, aligned S,
    kernel-unsupported shape, non-TPU backend, or env-disabled). MMTPU_STREAM_PAD=0
    disables; MMTPU_STREAM_PAD=force skips the backend check (CPU parity tests)."""
    import os

    env = os.environ.get("MMTPU_STREAM_PAD", "")
    if env == "0":
        return None
    if env != "force" and (
        jax.devices()[0].platform != "tpu" or os.environ.get("MMTPU_DISABLE_BLOCK_ATTN")
    ):
        return None
    if seq <= 128 or seq % 16 == 0:
        return None
    s_pad = seq + (-seq) % 16
    if not block_attn_supported(batch, s_pad, width, heads):
        return None
    if not _group_proj_enabled(s_pad):
        return None
    return s_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _block_attention(x, wq, bq, wk, bk, wv, bv, wo, bo, heads, causal, kv_len):
    b, s, w = x.shape
    g_imgs = _images_per_program(b, s, fwd=True)
    head_dim = w // heads
    xspec = pl.BlockSpec((g_imgs, s, w), lambda i: (i, 0, 0))
    kern = functools.partial(
        _fwd_kernel, g_imgs=g_imgs, heads=heads, head_dim=head_dim,
        scale=head_dim ** -0.5, causal=causal, kv_len=kv_len,
        group_proj=_group_proj_enabled(s),
    )
    return pl.pallas_call(
        kern,
        grid=(b // g_imgs,),
        in_specs=[xspec] + _weight_specs(w),
        out_specs=xspec,
        out_shape=sds((b, s, w), x.dtype, x),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",), vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=_interpret(),
    )(x, wq, bq, wk, bk, wv, bv, wo, bo)


def _block_attention_fwd(x, wq, bq, wk, bk, wv, bv, wo, bo, heads, causal, kv_len):
    out = _block_attention(x, wq, bq, wk, bk, wv, bv, wo, bo, heads, causal, kv_len)
    return out, (x, wq, bq, wk, bk, wv, bv, wo, bo)


def _bwd_via_xla(heads, causal, kv_len, residuals, dy):
    """Hybrid-mode backward: recompute the attention forward in plain XLA and let autodiff
    derive the gradients (kernel forward + XLA backward). Selected by MMTPU_BLOCK_ATTN_BWD=xla
    for A/B measurement against the Pallas backward."""
    x, wq, bq, wk, bk, wv, bv, wo, bo = residuals

    def fwd(x, wq, bq, wk, bk, wv, bv, wo, bo):
        b, s, w = x.shape
        hd = w // heads
        q = (x @ wq + bq).reshape(b, s, heads, hd)
        k = (x @ wk + bk).reshape(b, s, heads, hd)
        v = (x @ wv + bv).reshape(b, s, heads, hd)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
        ) * hd ** -0.5
        if causal:
            logits = jnp.where(_causal_mask(s)[None, None], logits, NEG_INF)
        if kv_len is not None and kv_len < s:
            keys = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, s), 3)
            logits = jnp.where(keys < kv_len, logits, NEG_INF)
        p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, s, w)
        return out @ wo + bo

    _, vjp = jax.vjp(fwd, x, wq, bq, wk, bk, wv, bv, wo, bo)
    return vjp(dy)


def _block_attention_bwd(heads, causal, kv_len, residuals, dy):
    import os

    if os.environ.get("MMTPU_BLOCK_ATTN_BWD") == "xla":
        return _bwd_via_xla(heads, causal, kv_len, residuals, dy)
    x, wq, bq, wk, bk, wv, bv, wo, bo = residuals
    b, s, w = x.shape
    g_imgs = _images_per_program(b, s, fwd=False)
    head_dim = w // heads
    xspec = pl.BlockSpec((g_imgs, s, w), lambda i: (i, 0, 0))
    # stacked bwd everywhere the sequence is 16-aligned (block_attention pads S>128 to
    # one): measured 8.63 vs 9.17 ms/block at ViT-B/16 dims over the per-head streaming
    # kernel, which stays as the MMTPU_BLOCK_ATTN_BWD_LARGE fallback (and the only
    # option for unaligned large S, where the group collapse is Mosaic-pathological)
    use_stacked = (s <= 128 or s % 16 == 0) and not os.environ.get(
        "MMTPU_BLOCK_ATTN_BWD_LARGE"
    )
    bwd = _bwd_kernel if use_stacked else _bwd_kernel_large
    kern = functools.partial(
        bwd, g_imgs=g_imgs, heads=heads, head_dim=head_dim,
        scale=head_dim ** -0.5, causal=causal, kv_len=kv_len,
    )
    shape = sds((b, s, w), x.dtype, x)
    dx, dq, dk, dv, attnpre = pl.pallas_call(
        kern,
        grid=(b // g_imgs,),
        in_specs=[xspec, xspec] + _weight_specs(w),
        out_specs=[xspec] * 5,
        out_shape=[shape] * 5,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",), vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=_interpret(),
    )(x, dy, wq, bq, wk, bk, wv, bv, wo, bo)

    # weight/bias grads: single whole-batch reductions — efficient as plain XLA matmuls
    f32 = jnp.float32
    dwq, dwk, dwv = (_attn_wgrad(x, dz, wq.dtype) for dz in (dq, dk, dv))
    dwo = _attn_wgrad(attnpre, dy, wo.dtype)
    dbq = jnp.sum(dq.astype(f32), axis=(0, 1)).astype(bq.dtype)
    dbk = jnp.sum(dk.astype(f32), axis=(0, 1)).astype(bk.dtype)
    dbv = jnp.sum(dv.astype(f32), axis=(0, 1)).astype(bv.dtype)
    dbo = jnp.sum(dy.astype(f32), axis=(0, 1)).astype(bo.dtype)
    return dx, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo


_block_attention.defvjp(_block_attention_fwd, _block_attention_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14, 15))
def _block_attention_ln(x, gamma, beta, wq, bq, wk, bk, wv, bv, wo, bo,
                        heads, causal, kv_len, ln_eps, residual=False):
    b, s, w = x.shape
    g_imgs = _images_per_program(b, s, fwd=True)
    head_dim = w // heads
    xspec = pl.BlockSpec((g_imgs, s, w), lambda i: (i, 0, 0))
    gspec = pl.BlockSpec((w,), lambda i: (0,))
    kern = functools.partial(
        _fwd_kernel, g_imgs=g_imgs, heads=heads, head_dim=head_dim,
        scale=head_dim ** -0.5, causal=causal, kv_len=kv_len,
        group_proj=_group_proj_enabled(s), ln_eps=ln_eps, residual=residual,
    )
    return pl.pallas_call(
        kern,
        grid=(b // g_imgs,),
        in_specs=[xspec, gspec, gspec] + _weight_specs(w),
        out_specs=xspec,
        out_shape=sds((b, s, w), x.dtype, x),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",), vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=_interpret(),
    )(x, gamma, beta, wq, bq, wk, bk, wv, bv, wo, bo)


def _block_attention_ln_fwd(x, gamma, beta, wq, bq, wk, bk, wv, bv, wo, bo,
                            heads, causal, kv_len, ln_eps, residual=False):
    out = _block_attention_ln(
        x, gamma, beta, wq, bq, wk, bk, wv, bv, wo, bo, heads, causal, kv_len, ln_eps,
        residual)
    return out, (x, gamma, beta, wq, bq, wk, bk, wv, bv, wo, bo)


def _block_attention_ln_bwd(heads, causal, kv_len, ln_eps, residual, residuals, dy):
    x, gamma, beta, wq, bq, wk, bk, wv, bv, wo, bo = residuals
    b, s, w = x.shape
    g_imgs = _images_per_program(b, s, fwd=False)
    head_dim = w // heads
    n_prog = b // g_imgs
    xspec = pl.BlockSpec((g_imgs, s, w), lambda i: (i, 0, 0))
    gspec = pl.BlockSpec((w,), lambda i: (0,))
    pspec = pl.BlockSpec((8, w), lambda i: (i, 0))
    kern = functools.partial(
        _bwd_kernel, g_imgs=g_imgs, heads=heads, head_dim=head_dim,
        scale=head_dim ** -0.5, causal=causal, kv_len=kv_len, ln_eps=ln_eps,
        residual=residual,
    )
    shape = sds((b, s, w), x.dtype, x)
    pshape = sds((n_prog * 8, w), jnp.float32, x)
    dx, dq, dk, dv, attnpre, ln_out, dg_p, db_p = pl.pallas_call(
        kern,
        grid=(n_prog,),
        in_specs=[xspec, xspec, gspec, gspec] + _weight_specs(w),
        out_specs=[xspec] * 5 + [xspec, pspec, pspec],
        out_shape=[shape] * 5 + [shape, pshape, pshape],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",), vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=_interpret(),
    )(x, dy, gamma, beta, wq, bq, wk, bk, wv, bv, wo, bo)

    dgamma = jnp.sum(dg_p, axis=0).astype(gamma.dtype)
    dbeta = jnp.sum(db_p, axis=0).astype(beta.dtype)
    # weight/bias grads: single whole-batch reductions over the kernel-emitted LN output
    f32 = jnp.float32
    dwq, dwk, dwv = (_attn_wgrad(ln_out, dz, wq.dtype) for dz in (dq, dk, dv))
    dwo = _attn_wgrad(attnpre, dy, wo.dtype)
    dbq = jnp.sum(dq.astype(f32), axis=(0, 1)).astype(bq.dtype)
    dbk = jnp.sum(dk.astype(f32), axis=(0, 1)).astype(bk.dtype)
    dbv = jnp.sum(dv.astype(f32), axis=(0, 1)).astype(bv.dtype)
    dbo = jnp.sum(dy.astype(f32), axis=(0, 1)).astype(bo.dtype)
    return dx, dgamma, dbeta, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo


_block_attention_ln.defvjp(_block_attention_ln_fwd, _block_attention_ln_bwd)


def _xla_equivalent(x, wq, bq, wk, bk, wv, bv, wo, bo, *, heads, causal,
                    ln_scale, ln_bias, ln_eps, residual, kv_len):
    """Plain-XLA composition with the kernel's exact numerics (pre-LN fold, scaled-dot
    attention with -1e30 pad/causal masking, output projection, optional residual)."""
    from multimodal_tpu.ops.attention import _xla_attention

    b, s, w = x.shape
    head_dim = w // heads
    x_raw = x
    if ln_scale is not None:
        x = _ln_rows(x, ln_scale, ln_bias, ln_eps)
    q = (x @ wq + bq).reshape(b, s, heads, head_dim)
    k = (x @ wk + bk).reshape(b, s, heads, head_dim)
    v = (x @ wv + bv).reshape(b, s, heads, head_dim)
    mask = None
    if kv_len is not None and kv_len < s:
        mask = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, s), 3) < kv_len, 0.0, NEG_INF
        )
    out = _xla_attention(q, k, v, causal, mask).reshape(b, s, w)
    y = out @ wo + bo
    return x_raw + y if residual else y


def block_attention(x, wq, bq, wk, bk, wv, bv, wo, bo, *, heads: int, causal: bool = False,
                    ln_scale=None, ln_bias=None, ln_eps: float = 1e-5,
                    residual: bool = False, kv_len: int | None = None):
    """Fused QKV-projection + multi-head attention + output projection.

    x: [B, S, W] (post-LN residual-branch input); weights [W, W], biases [W].
    Returns [B, S, W] in x.dtype (the pre-residual attention-branch output).

    With ``ln_scale``/``ln_bias``, x is the PRE-LN residual stream and the pre-attention
    LayerNorm (the reference's ln_1, transformer.py:200) is folded into the kernel: the
    normalized activations never round-trip HBM in forward, and the backward applies the
    LN vjp in-VMEM, emitting per-program dgamma/dbeta partials. Disable with
    MMTPU_BLOCK_ATTN_LN=0 (falls back to an identical-numerics XLA LN pre-pass).

    At S>128 the sequence is zero-padded to the next multiple of 16 so the kernel's
    whole-group [G*S, W] projection collapse is tile-aligned (padded keys are softmax-masked
    inside the kernel; padded query rows are sliced off here, and their cotangents enter
    the backward as zeros through this slice's vjp). Padded rows of a pre-LN input
    normalize to the bias vector, which the same masks make inert.

    With ``residual=True`` (requires ``ln_scale``) the return value is the complete
    residual update ``x + attn(LN(x))`` — on the fused-LN kernel path the add happens
    in-VMEM on the already-resident raw block (forward) and the passthrough cotangent
    folds into dx in-VMEM (backward), deleting the standalone [B,S,W] XLA adds. On
    fallback paths the add is a plain XLA op with identical numerics. Disable the
    in-kernel form with MMTPU_BLOCK_ATTN_RESIDUAL=0 (A/B).

    With ``kv_len`` the caller runs a STREAM-PADDED residual stream (see stream_pad_len):
    x arrives already padded to a 16-aligned S, keys at index >= kv_len are softmax-masked
    in-kernel, and no per-call pad/slice happens here. Padded rows flow through as
    don't-care values."""
    import os

    if residual and ln_scale is None:
        raise ValueError("residual=True requires the fused pre-LN form (ln_scale)")
    from multimodal_tpu.ops.pallas_util import match_vma

    # under shard_map: weights are replicated (vma={}) while x varies over the batch
    # axes — pvary them up so every primitive (and the pallas out_shape) type-checks
    wq, bq, wk, bk, wv, bv, wo, bo = match_vma(x, wq, bq, wk, bk, wv, bv, wo, bo)
    if ln_scale is not None:
        ln_scale, ln_bias = match_vma(x, ln_scale, ln_bias)
    if _interpret() and getattr(jax.typeof(x), "vma", None):
        # CPU interpret mode inside shard_map: the HLO interpreter replays the kernel
        # body as JAX ops, where in-body constants (iota masks) fail check_vma. Use the
        # identical-numerics XLA composition instead (real TPU takes the kernel path,
        # whose out_shape carries the vma via pallas_util.sds).
        return _xla_equivalent(
            x, wq, bq, wk, bk, wv, bv, wo, bo, heads=heads, causal=causal,
            ln_scale=ln_scale, ln_bias=ln_bias, ln_eps=ln_eps,
            residual=residual, kv_len=kv_len,
        )
    x_raw = x
    s = x.shape[1]
    if kv_len is not None and (s % 16 != 0 and s > 128):
        raise ValueError(f"stream-padded call needs a 16-aligned sequence, got S={s}")
    # Default: fold only at S>128 — measured +1.8% on ViT-B/16 (S=197) where the
    # [B,S,W] LN round-trips are large, but -2.8% on ViT-B/32 (S=50) where the extra
    # in-kernel VMEM/ln_out emission costs more than the small LN traffic it saves.
    # MMTPU_BLOCK_ATTN_LN=1 forces the fold at every S, =0 disables it everywhere.
    ln_env = os.environ.get("MMTPU_BLOCK_ATTN_LN", "")
    fused_ln = (
        ln_scale is not None
        and (ln_env == "1" or (ln_env != "0" and s > 128))
        # the LN kernel pair only has the whole-group [G*S,W] form (fwd LN + stacked
        # bwd both collapse the group); at S>128 that requires the 16-aligned group
        # collapse to be available — with MMTPU_BLOCK_ATTN_NO_LARGE_GROUP set, fall
        # back to the XLA LN pre-pass + per-image/streaming kernels instead of running
        # the collapse unaligned (the Mosaic-pathological configuration)
        and (s <= 128 or _group_proj_enabled(s + (-s) % 16))
        and os.environ.get("MMTPU_BLOCK_ATTN_BWD") != "xla"
        and not os.environ.get("MMTPU_BLOCK_ATTN_BWD_LARGE")
    )
    fused_residual = (
        residual and fused_ln
        and os.environ.get("MMTPU_BLOCK_ATTN_RESIDUAL") != "0"
    )
    if ln_scale is not None and not fused_ln:
        x = _ln_rows(x, ln_scale, ln_bias, ln_eps)
        ln_scale = ln_bias = None
    if s > 128 and s % 16 != 0 and _group_proj_enabled(s + (-s) % 16):
        s_pad = s + (-s) % 16
        x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
        if ln_scale is not None:
            out = _block_attention_ln(
                x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo,
                heads, causal, s, ln_eps, fused_residual)
        else:
            out = _block_attention(x, wq, bq, wk, bk, wv, bv, wo, bo, heads, causal, s)
        out = out[:, :s]
    elif ln_scale is not None:
        out = _block_attention_ln(
            x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo,
            heads, causal, kv_len, ln_eps, fused_residual)
    else:
        out = _block_attention(
            x, wq, bq, wk, bk, wv, bv, wo, bo, heads, causal, kv_len
        )
    if residual and not fused_residual:
        out = x_raw + out
    return out
