"""Image -> text top-k retrieval accuracy (counterpart of reference metrics/topk.py:7-106).

Each image's caption competes against every other caption by cosine similarity; a hit means
the paired caption ranks in the top-k."""

from __future__ import annotations

import jax.numpy as jnp

from multimodal_tpu.ops.sphere import l2_normalize


def top_k_score(image_features, text_features, k: int = 1, batch_size: int = 1024) -> float:
    """image_features [N,E] paired row-wise with text_features [N,E]."""
    img = l2_normalize(jnp.asarray(image_features, jnp.float32))
    txt = l2_normalize(jnp.asarray(text_features, jnp.float32))
    n = img.shape[0]
    hits = 0
    for start in range(0, n, batch_size):
        block = img[start : start + batch_size]
        sims = block @ txt.T  # [b, N]
        kk = min(k, n)
        top = jnp.argsort(-sims, axis=-1)[:, :kk]
        own = jnp.arange(start, min(start + batch_size, n))[:, None]
        hits += int(jnp.sum(jnp.any(top == own, axis=-1)))
    return hits / n


def topk_metrics(image_features, text_features, ks=(1, 5, 10, 100)) -> dict:
    return {f"top{k}": top_k_score(image_features, text_features, k) for k in ks}
