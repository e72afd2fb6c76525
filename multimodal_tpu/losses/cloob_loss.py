"""CLOOB loss: modern-Hopfield retrieval + InfoLOOB (arXiv 2110.11316).

Counterpart of reference losses/cloobLoss.py:10-61. Pure functions of [B, E] features;
retrieval keeps the reference's column-normalization convention (cloobLoss.py:43-47) and
InfoLOOB excludes positives from the denominator by -10000 masking (:24-32)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LARGE_NEG = -10000.0


def hopfield_retrieval(state_patterns, stored_patterns, scale_hopfield):
    """Retrieve each state pattern from the stored-pattern memory.

    state [Bs, E], stored [Bm, E] -> retrieved [Bs, E], rows L2-normalized.
    Equivalent to the reference's column-vector formulation (stored^T @ softmax(beta *
    stored @ state^T, dim=0), column-normalized) transposed to row convention."""
    attn = jax.nn.softmax(
        scale_hopfield
        * jnp.einsum("me,se->sm", stored_patterns, state_patterns).astype(jnp.float32),
        axis=-1,
    )
    retrieved = attn @ stored_patterns.astype(jnp.float32)
    return retrieved / jnp.maximum(jnp.linalg.norm(retrieved, axis=-1, keepdims=True), 1e-12)


def infoloob_loss(x, y, inv_tau):
    """Negative mean log odds of positive pairs; positives are the diagonal. x, y: [B, E]."""
    k = (x @ y.T) * inv_tau
    b = k.shape[0]
    eye = jnp.eye(b, dtype=bool)
    positives = -jnp.mean(jnp.sum(jnp.where(eye, k, 0.0), axis=1))
    masked = jnp.where(eye, _LARGE_NEG, k)
    negatives = jnp.mean(jax.scipy.special.logsumexp(masked, axis=1))
    return positives + negatives


def cloob_loss(image_features, text_features, inv_tau, scale_hopfield):
    """CLOOB: InfoLOOB after Hopfield retrieval of both modalities from both memories
    (cloobLoss.py:10-22). Rescaled like the reference (divide by inv_tau/2 for the original).
    """
    u_img = hopfield_retrieval(image_features, image_features, scale_hopfield)  # p_xx
    u_txt = hopfield_retrieval(text_features, text_features, scale_hopfield)  # p_yy
    v_img = hopfield_retrieval(text_features, image_features, scale_hopfield)  # p_xy: texts from image memory
    v_txt = hopfield_retrieval(image_features, text_features, scale_hopfield)  # p_yx: images from text memory
    loss_img = infoloob_loss(u_img, v_img, inv_tau)
    loss_txt = infoloob_loss(u_txt, v_txt, inv_tau)
    return 0.5 * (loss_img + loss_txt)
