"""Cross-modal retrieval: R@K both directions with multi-captions-per-image index maps.

Counterparts: reference main/retrieval.py:7-102 (COCO/Flickr, 5 captions/image, dense
text @ image^T argsort, T->I and I->T recall@K) and main/train.py:338-356 (get_clip_metrics:
paired-val R@{1,5,10} + mean/median rank)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from multimodal_tpu.ops.sphere import l2_normalize


def recall_at_k(
    image_features,
    text_features,
    text_to_image: np.ndarray,
    ks=(1, 5, 10),
) -> dict:
    """image_features [Ni,E]; text_features [Nt,E]; text_to_image [Nt] maps each caption to
    its image index. Returns {'text_to_image_R@k', 'image_to_text_R@k'}."""
    img = np.asarray(l2_normalize(jnp.asarray(image_features, jnp.float32)))
    txt = np.asarray(l2_normalize(jnp.asarray(text_features, jnp.float32)))
    t2i = np.asarray(text_to_image)
    sims = txt @ img.T  # [Nt, Ni]
    out = {}

    # text -> image: rank images per caption; hit if the paired image is in top-k
    order = np.argsort(-sims, axis=-1)
    for k in ks:
        hits = (order[:, :k] == t2i[:, None]).any(axis=-1)
        out[f"text_to_image_R@{k}"] = float(hits.mean())

    # image -> text: rank captions per image; hit if ANY of its captions is in top-k
    order_i = np.argsort(-sims.T, axis=-1)  # [Ni, Nt]
    for k in ks:
        topk = order_i[:, :k]
        hits = t2i[topk] == np.arange(img.shape[0])[:, None]
        out[f"image_to_text_R@{k}"] = float(hits.any(axis=-1).mean())
    return out


def get_clip_metrics(image_features, text_features, logit_scale=1.0) -> dict:
    """Paired-set retrieval stats: R@{1,5,10}, mean & median rank, both directions
    (train.py:338-356; one caption per image, diagonal is the target)."""
    img = np.asarray(l2_normalize(jnp.asarray(image_features, jnp.float32)))
    txt = np.asarray(l2_normalize(jnp.asarray(text_features, jnp.float32)))
    logits_per_image = float(logit_scale) * img @ txt.T
    metrics = {}
    for name, logits in [
        ("image_to_text", logits_per_image),
        ("text_to_image", logits_per_image.T),
    ]:
        ranking = np.argsort(-logits, axis=-1)
        n = logits.shape[0]
        preds = np.argmax(ranking == np.arange(n)[:, None], axis=-1)
        metrics[f"{name}_mean_rank"] = float(preds.mean() + 1)
        metrics[f"{name}_median_rank"] = float(np.floor(np.median(preds)) + 1)
        for k in (1, 5, 10):
            metrics[f"{name}_R@{k}"] = float((preds < k).mean())
    return metrics
