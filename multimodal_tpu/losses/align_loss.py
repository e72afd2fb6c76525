"""AlignCLIP in-modality separation loss (with optional NL semantic supervision).

Counterpart of reference align_clip/loss.py:135-273 (ClipInModalityLoss) and the
losses/alignCLIPLoss.py:2-8 wrapper (alpha=1.0, beta=0.5, nl_semantic_supervision=True).

Structure: total = alpha * (CE(img->txt) + CE(txt->img))                 [inter-modal]
                 + beta * CE over intra-modal I@I / T@T similarity logits [in-modality]
with optional SBERT semantic weighting: intra-modal logits are multiplied elementwise by
(1 - S S^T) of the caption sentence embeddings, then the paired image-text diagonal is added
back (loss.py:227-256) — pushing same-meaning pairs together and different-meaning pairs
apart inside each modality.

Mesh-sharded (axis_name) variant follows the local_loss design of clip_loss: local-B x
global-B blocks with axis-offset labels."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from multimodal_tpu.losses.clip_loss import LOGIT_CLAMP, _l2norm, cross_entropy, gather_features


def align_clip_loss(
    image_features,
    text_features,
    logit_scale,
    *,
    semantic_features=None,
    alpha: float = 1.0,
    beta: float = 0.5,
    separate_text: bool = True,
    separate_image: bool = False,
    normalize: bool = True,
    scale_is_log: bool = True,
    axis_name: Optional[str] = None,
    local_loss: bool = True,
) -> dict:
    """Returns {'total_loss', 'clip_loss', 'inModality_loss'}."""
    if normalize:
        image_features = _l2norm(image_features.astype(jnp.float32))
        text_features = _l2norm(text_features.astype(jnp.float32))
    scale = (
        jnp.exp(jnp.minimum(logit_scale, LOGIT_CLAMP)) if scale_is_log else logit_scale
    )

    if axis_name is not None and local_loss:
        all_images = gather_features(image_features, axis_name)
        all_texts = gather_features(text_features, axis_name)
        b = image_features.shape[0]
        labels = jnp.arange(b) + b * jax.lax.axis_index(axis_name)
    else:
        if axis_name is not None:  # global-matrix form, every shard computes all
            image_features = gather_features(image_features, axis_name)
            text_features = gather_features(text_features, axis_name)
            if semantic_features is not None:
                semantic_features = gather_features(semantic_features, axis_name)
        all_images, all_texts = image_features, text_features
        labels = jnp.arange(image_features.shape[0])

    logits_ii = image_features @ all_images.T  # unscaled intra-modal similarities
    logits_tt = text_features @ all_texts.T
    logits_it = scale * image_features @ all_texts.T
    logits_ti = scale * text_features @ all_images.T

    if semantic_features is not None:
        sem = _l2norm(semantic_features.astype(jnp.float32))
        all_sem = gather_features(sem, axis_name) if (axis_name and local_loss) else sem
        semantic_sim = 1.0 - sem @ all_sem.T  # dissimilarity weights (loss.py:231-233)
        # paired image-text diagonal, re-added after weighting (loss.py:240)
        b = image_features.shape[0]
        paired = jnp.sum(image_features * text_features, axis=-1)  # diag(I @ T^T)
        cols = labels  # the global column of each local row's positive
        eye_paired = jnp.zeros_like(logits_ii).at[jnp.arange(b), cols].set(paired)
        terms = []
        if separate_text:
            terms.append(cross_entropy(scale * (logits_tt * semantic_sim + eye_paired), labels).mean())
        if separate_image:
            terms.append(cross_entropy(scale * (logits_ii * semantic_sim + eye_paired), labels).mean())
        in_modality = beta * sum(terms) if terms else jnp.float32(0.0)
    else:
        in_modality = beta * (
            cross_entropy(scale * logits_ii, labels).mean()
            + cross_entropy(scale * logits_tt, labels).mean()
        )

    inter = alpha * (
        cross_entropy(logits_it, labels).mean() + cross_entropy(logits_ti, labels).mean()
    )
    if axis_name is not None:
        inter = jax.lax.pmean(inter, axis_name)
        in_modality = jax.lax.pmean(in_modality, axis_name)
    return {
        "total_loss": inter + in_modality,
        "clip_loss": inter,
        "inModality_loss": in_modality,
    }
