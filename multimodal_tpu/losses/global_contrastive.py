"""Global-batch contrastive at scale: chunked and ring-streamed InfoNCE.

The reference's "model-scale" axis is the contrastive batch: features are all-gathered and a
[B_local, B_global] (or [B_global, B_global]) logits matrix is built per rank
(align_clip/loss.py:20-131). At very large global batch that matrix is the memory bottleneck
— SURVEY.md §5 identifies sharding the B x B logits as this workload's ring-attention-shaped
component. Two TPU-native forms, both exact (values AND gradients match the dense loss):

  * ``chunked_clip_loss`` — after the feature all-gather, the CE's logsumexp is accumulated
    over column chunks under ``jax.checkpoint``: peak logits memory is one
    [B_local, chunk] block in forward AND backward (the chunk body recomputes its logits).
    Works on one chip (giant local batch) or inside shard_map.

  * ``ring_clip_loss`` — shard_map-only: never gathers at all. Feature blocks of both
    modalities rotate around the ICI ring with ``jax.lax.ppermute`` while each step folds a
    [B_local, B_local] logits block into a streaming logsumexp; communication overlaps
    compute, and per-chip memory is one block + the running accumulators. Gradients flow
    through ppermute natively (reverse-direction permutation in the backward pass).

Both reproduce ``clip_loss``'s semantics: symmetric CE, ln(100) logit clamp, global-batch
mean, label smoothing (the smooth term needs the mean logit, which both streaming passes
accumulate alongside the logsumexp).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from multimodal_tpu.losses.clip_loss import LOGIT_CLAMP, _l2norm, gather_features


def _resolve_scale(logit_scale, scale_is_log):
    return jnp.exp(jnp.minimum(logit_scale, LOGIT_CLAMP)) if scale_is_log else logit_scale


def _streaming_ce(queries, keys, scale, pos_logits, chunk: int, label_smoothing: float):
    """Mean CE of queries against ALL keys with logsumexp accumulated over column chunks.

    queries [B, E]; keys [N, E] (N % chunk == 0); pos_logits [B] = the positive logit of each
    query row. Each chunk's logits are recomputed in backward (jax.checkpoint)."""
    b = queries.shape[0]
    n = keys.shape[0]
    num_chunks = n // chunk
    key_chunks = keys.reshape(num_chunks, chunk, -1)

    @jax.checkpoint
    def body(carry, key_chunk):
        m, s, lsum = carry
        logits = scale * queries @ key_chunk.T  # [B, chunk]
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        s = s * jnp.exp(m - m_new) + jnp.sum(jnp.exp(logits - m_new[:, None]), axis=-1)
        lsum = lsum + jnp.sum(logits, axis=-1)  # for the label-smoothing mean-logit term
        return (m_new, s, lsum), None

    # derive the accumulators from queries so they carry the right device-varying type
    # under shard_map (same typing rule as ring_clip_loss)
    zero = jnp.zeros_like(queries[:, 0]).astype(jnp.float32)
    init = (zero - jnp.inf, zero, zero)
    (m, s, lsum), _ = jax.lax.scan(body, init, key_chunks)
    lse = m + jnp.log(s)
    nll = lse - pos_logits
    if label_smoothing > 0.0:
        # smooth term: -mean_j log p_j = lse - mean_j logits_j
        smooth = lse - lsum / n
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    return nll.mean()


def chunked_clip_loss(
    image_features,
    text_features,
    logit_scale,
    *,
    chunk_size: int = 1024,
    label_smoothing: float = 0.0,
    normalize: bool = True,
    scale_is_log: bool = True,
    axis_name: Optional[str] = None,
):
    """Exact InfoNCE with O(B_local x chunk) peak logits memory (fwd and bwd)."""
    if normalize:
        image_features = _l2norm(image_features.astype(jnp.float32))
        text_features = _l2norm(text_features.astype(jnp.float32))
    scale = _resolve_scale(logit_scale, scale_is_log)

    all_images = gather_features(image_features, axis_name)
    all_texts = gather_features(text_features, axis_name)
    n = all_texts.shape[0]
    chunk = min(chunk_size, n)
    if n % chunk:  # static shapes: shrink to a divisor
        while n % chunk:
            chunk -= 1
    pos = scale * jnp.sum(image_features * text_features, axis=-1)

    loss_i = _streaming_ce(image_features, all_texts, scale, pos, chunk, label_smoothing)
    loss_t = _streaming_ce(text_features, all_images, scale, pos, chunk, label_smoothing)
    loss = 0.5 * (loss_i + loss_t)
    if axis_name is not None:
        loss = jax.lax.pmean(loss, axis_name)
    return loss


def ring_clip_loss(
    image_features,
    text_features,
    logit_scale,
    axis_name: str,
    *,
    normalize: bool = True,
    scale_is_log: bool = True,
    label_smoothing: float = 0.0,
):
    """Exact global-batch InfoNCE with NO feature all-gather: blocks rotate over the ring.

    Must run inside shard_map over ``axis_name``. Per step: fold the [B, B] block of logits
    against the currently-held remote block into a streaming logsumexp, then ppermute the
    block to the next device. W-1 ppermutes total — the all_gather's bandwidth, pipelined.
    Label smoothing streams the mean-logit accumulator alongside (same identity as the
    chunked form: smooth-NLL = lse - mean_j logits_j)."""
    if normalize:
        image_features = _l2norm(image_features.astype(jnp.float32))
        text_features = _l2norm(text_features.astype(jnp.float32))
    scale = _resolve_scale(logit_scale, scale_is_log)
    world = jax.lax.axis_size(axis_name)
    b = image_features.shape[0]
    perm = [(i, (i + 1) % world) for i in range(world)]

    pos = scale * jnp.sum(image_features * text_features, axis=-1)  # [B]

    def direction(queries, first_block):
        """Streaming (logsumexp, sum-of-logits) of queries vs all rotating key blocks."""

        def fold(m, s, lsum, block):
            logits = scale * queries @ block.T  # [B, B]
            m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
            s = s * jnp.exp(m - m_new) + jnp.sum(jnp.exp(logits - m_new[:, None]), axis=-1)
            return m_new, s, lsum + jnp.sum(logits, axis=-1)

        def body(carry, _):
            m, s, lsum, block = carry
            # permute-then-fold: the resident block was folded before the scan, so
            # exactly world-1 rotations run (a trailing rotation of an already-consumed
            # block would be dead ICI traffic in forward AND the mirrored backward)
            block = jax.lax.ppermute(block, axis_name, perm)
            m, s, lsum = fold(m, s, lsum, block)
            return (m, s, lsum, block), None

        # carry accumulators must carry the same device-varying type as the rotating block
        # (shard_map manual-axes typing); derive them from the varying queries
        zero = jnp.zeros_like(queries[:, 0])
        m0, s0, lsum0 = fold(zero - jnp.inf, zero, zero, first_block)
        (m, s, lsum, _), _ = jax.lax.scan(
            body, (m0, s0, lsum0, first_block), None, length=world - 1)
        return m + jnp.log(s), lsum  # [B], [B]

    lse_i, lsum_i = direction(image_features, text_features)  # img rows vs all text blocks
    lse_t, lsum_t = direction(text_features, image_features)
    nll_i = lse_i - pos
    nll_t = lse_t - pos
    if label_smoothing > 0.0:
        n = world * b
        smooth_i = lse_i - lsum_i / n
        smooth_t = lse_t - lsum_t / n
        nll_i = (1.0 - label_smoothing) * nll_i + label_smoothing * smooth_i
        nll_t = (1.0 - label_smoothing) * nll_t + label_smoothing * smooth_t
    loss = 0.5 * (nll_i.mean() + nll_t.mean())
    return jax.lax.pmean(loss, axis_name)
