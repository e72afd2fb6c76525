"""Uniformity proxy: mean angle to the k-th nearest neighbor, batched.

Counterpart of reference metrics/entropy.py:9-80 (self-similarity masked to -inf, batched to
avoid the N x N blow-up)."""

from __future__ import annotations

import jax.numpy as jnp

from multimodal_tpu.ops.sphere import l2_normalize


def average_kth_neighbor_angle(embeddings, k: int = 1, batch_size: int = 1000) -> float:
    """Mean angle (radians) between each embedding and its k-th nearest neighbor."""
    x = l2_normalize(jnp.asarray(embeddings, jnp.float32))
    n = x.shape[0]
    total = 0.0
    for start in range(0, n, batch_size):
        block = x[start : start + batch_size]
        sims = block @ x.T  # [b, N]
        rows = jnp.arange(block.shape[0])
        sims = sims.at[rows, rows + start].set(-jnp.inf)  # mask self-similarity
        kth = jnp.sort(sims, axis=-1)[:, -k]  # k-th largest cosine
        angles = jnp.arccos(jnp.clip(kth, -1.0, 1.0))
        total += float(jnp.sum(angles))
    return total / n


def entropy_metric(image_features, text_features, k: int = 1) -> dict:
    both = jnp.concatenate(
        [jnp.asarray(image_features), jnp.asarray(text_features)], axis=0
    )
    return {
        "image_knn_angle": average_kth_neighbor_angle(image_features, k),
        "text_knn_angle": average_kth_neighbor_angle(text_features, k),
        "joint_knn_angle": average_kth_neighbor_angle(both, k),
    }
