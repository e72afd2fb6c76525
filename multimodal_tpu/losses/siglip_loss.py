"""SigLIP pairwise-sigmoid contrastive loss (Zhai et al. 2023) — beyond-reference loss
family (the reference stack is softmax-only: losses/clipLoss.py).

Chosen for the TPU because it removes the global softmax: the loss decomposes into a sum
of independent per-pair sigmoid terms,

    L = -1/B * sum_i sum_j log sigmoid(z_ij * (t * x_i . y_j + b)),   z_ij = +1 iff i == j,

with learnable log-temperature t' (t = exp(t'), init ln 10) and bias b (init -10). Because
no row normalization couples the pairs, the mesh-sharded form needs NO logsumexp
bookkeeping and no feature all-gather: text blocks rotate around the ICI ring (ppermute)
and every visited block contributes its pair terms exactly — this is the paper's own
"chunked" multi-device algorithm (their Fig. 4), expressed as XLA collectives. Per-device
memory never exceeds the local [B_local, B_local] block.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from multimodal_tpu.losses.clip_loss import _l2norm


def _pair_terms(fi, ft_block, t, b, diag: bool):
    """-sum of log-sigmoid pair losses for one [B, Bk] block. ``diag``: this block holds
    the positives (i == j on the block diagonal); otherwise every pair is a negative."""
    logits = t * (fi @ ft_block.T).astype(jnp.float32) + b  # [B, Bk]
    sign = (2.0 * jnp.eye(fi.shape[0], ft_block.shape[0], dtype=jnp.float32) - 1.0
            if diag else -1.0)
    # log sigmoid(z * l) = -softplus(-z * l), accumulated in f32
    return jnp.sum(jax.nn.softplus(-sign * logits))


def siglip_loss(
    image_features,
    text_features,
    logit_scale,
    logit_bias,
    *,
    normalize: bool = True,
    scale_is_log: bool = True,
    axis_name: Optional[str] = None,
):
    """Dense SigLIP loss. With ``axis_name`` (inside shard_map): the exact global-batch
    loss via ring-rotated text blocks — per-device peak is the local block only.

    Returns the global mean over images: -1/B_global * sum_ij log sigmoid(...). The
    sharded form pmeans internally (every device returns the GLOBAL value), matching
    ring_clip_loss's convention — required because reverse-mode through shard_map
    psums gradients wrt replicated (unvarying) inputs, so a per-device partial loss
    would make the engine's grads world-times too large.
    """
    fi = image_features.astype(jnp.float32)
    ft = text_features.astype(jnp.float32)
    if normalize:
        fi = _l2norm(fi)
        ft = _l2norm(ft)
    t = jnp.exp(logit_scale) if scale_is_log else logit_scale
    b = logit_bias.astype(jnp.float32)
    n_local = fi.shape[0]

    if axis_name is None:
        return _pair_terms(fi, ft, t, b, diag=True) / n_local

    world = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % world) for i in range(world)]

    # the local block holds the positives (block diagonal) and is folded BEFORE the ring
    # starts; each of the world-1 scan steps permutes-then-folds a negatives-only block
    # (global positions are irrelevant: every off-diagonal pair is a negative), so no
    # trailing dead rotation runs
    total = _pair_terms(fi, ft, t, b, diag=True)

    def body(carry, _):
        tot, block = carry
        block = jax.lax.ppermute(block, axis_name, perm)
        logits = t * (fi @ block.T).astype(jnp.float32) + b
        tot = tot + jnp.sum(jax.nn.softplus(logits))  # all negatives: -log sig(-l)
        return (tot, block), None

    (total, _), _ = jax.lax.scan(body, (total, ft), None, length=world - 1)
    return jax.lax.pmean(total / n_local, axis_name)
