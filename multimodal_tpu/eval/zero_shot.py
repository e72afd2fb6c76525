"""Zero-shot classification: template-averaged classifier weights + top-k accuracy.

Counterparts: align_clip/zero_shot_classifier.py:25-72 (build: for each class embed all
templates, mean, renormalize — batched over classes), main/zero_shot.py:18-48 (run: logits =
100 * feats @ classifier, top-1/top-5 accuracy)."""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

import jax.numpy as jnp
import numpy as np

from multimodal_tpu.data.tokenizer import tokenize
from multimodal_tpu.eval.metadata import apply_templates


def build_zero_shot_classifier(
    encode_text_fn: Callable,
    classnames: Sequence[str],
    templates: Sequence[str],
    batch_classes: int = 10,
    tokenizer=None,
    context_length: int = 77,
) -> jnp.ndarray:
    """Return [E, C] classifier weights. encode_text_fn: [N,ctx] int32 -> [N,E] features."""
    num_templates = len(templates)
    weights = []
    for start in range(0, len(classnames), batch_classes):
        chunk = classnames[start : start + batch_classes]
        texts = [t for c in chunk for t in apply_templates(c, list(templates))]
        tokens = tokenize(texts, context_length=context_length, tokenizer=tokenizer)
        feats = np.array(encode_text_fn(jnp.asarray(tokens)), np.float32, copy=True)
        feats = feats.reshape(len(chunk), num_templates, -1)
        feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
        mean = feats.mean(axis=1)
        mean /= np.linalg.norm(mean, axis=-1, keepdims=True)
        weights.append(mean)
    return jnp.asarray(np.concatenate(weights, axis=0).T)  # [E, C]


def accuracy_counts(logits, targets, topk=(1, 5)):
    """Counts of top-k hits (main/zero_shot.py:18-21)."""
    logits = np.asarray(logits)
    targets = np.asarray(targets)
    order = np.argsort(-logits, axis=-1)
    out = []
    for k in topk:
        kk = min(k, logits.shape[-1])
        out.append(float((order[:, :kk] == targets[:, None]).any(axis=-1).sum()))
    return out


def zero_shot_eval(
    encode_image_fn: Callable,
    classifier: jnp.ndarray,
    batches: Iterable,
    topk=(1, 5),
) -> dict:
    """batches yield (images, labels). Returns {'top1': acc, 'top5': acc}."""
    counts = [0.0 for _ in topk]
    n = 0
    for images, labels in batches:
        feats = encode_image_fn(jnp.asarray(images))
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        logits = 100.0 * feats @ classifier
        c = accuracy_counts(logits, labels, topk)
        counts = [a + b for a, b in zip(counts, c)]
        n += len(labels)
    return {f"top{k}": counts[i] / max(n, 1) for i, k in enumerate(topk)}
