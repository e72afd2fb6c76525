"""Image -> text top-k retrieval accuracy (counterpart of reference metrics/topk.py:7-106).

Each image's caption competes against every other caption by cosine similarity; a hit means
the paired caption ranks in the top-k."""

from __future__ import annotations

import jax.numpy as jnp

from multimodal_tpu.ops.sphere import l2_normalize


def paired_ranks(image_features, text_features, batch_size: int = 1024):
    """Rank (0-based) of each image's own caption among all N captions, [N] int.

    One pass over the similarity matrix: the rank is the count of captions scoring
    strictly higher than the paired one — no argsort, and every top-k follows as
    ``rank < k``."""
    img = l2_normalize(jnp.asarray(image_features, jnp.float32))
    txt = l2_normalize(jnp.asarray(text_features, jnp.float32))
    n = img.shape[0]
    ranks = []
    for start in range(0, n, batch_size):
        block = img[start : start + batch_size]
        sims = block @ txt.T  # [b, N]
        own = sims[jnp.arange(block.shape[0]), jnp.arange(start, start + block.shape[0])]
        ranks.append(jnp.sum(sims > own[:, None], axis=-1))
    return jnp.concatenate(ranks)


def top_k_score(image_features, text_features, k: int = 1, batch_size: int = 1024) -> float:
    """image_features [N,E] paired row-wise with text_features [N,E]."""
    ranks = paired_ranks(image_features, text_features, batch_size)
    return float(jnp.mean(ranks < k))


def topk_metrics(image_features, text_features, ks=(1, 5, 10, 100)) -> dict:
    """All ks from ONE similarity pass (top_k_score per k would recompute the [N,N]
    matmul len(ks) times)."""
    ranks = paired_ranks(image_features, text_features)
    return {f"top{k}": float(jnp.mean(ranks < k)) for k in ks}
