"""InfoNCE contrastive losses — single-device and mesh-sharded global-batch variants.

Counterparts:
  * reference losses/clipLoss.py:13-121 (single-device, label smoothing, logit-scale
    clamp-then-exp) and :24-79 (``forward_sampled`` Monte-Carlo [S,B,E] variant for vCLIP);
  * reference align_clip/loss.py:67-133 (distributed ClipLoss: feature all-gather with
    gradient, ``local_loss`` local-vs-global logits with rank-offset labels).

TPU-native distributed design: when ``axis_name`` is given the function must run inside
shard_map/pjit over a mesh axis; features are all-gathered with ``jax.lax.all_gather``
(gradient flows through natively — the semantics of gather_with_grad=True at loss.py:49-51;
the reference's grad-splice fallback is a torch workaround with identical gradients, so it
needs no separate implementation). ``local_loss=True`` computes only the local-B x global-B
logit block with axis_index-offset labels (loss.py:94-117) — the efficient form that never
materializes the global x global matrix on one chip.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

LOGIT_CLAMP = 4.6052  # ln(100) (clipLoss.py:105)
LOGIT_CLAMP_SAMPLED = 3.912  # (clipLoss.py:37)


def _l2norm(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def cross_entropy(logits, labels, label_smoothing: float = 0.0):
    """Per-example CE with label smoothing, f32 accumulation. logits [N, C], labels [N]."""
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    if label_smoothing > 0.0:
        smooth = -log_probs.mean(axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    return nll


def gather_features(features, axis_name: Optional[str]):
    """All-gather features across the mesh axis, gradient preserved (loss.py:20-64)."""
    if axis_name is None:
        return features
    return jax.lax.all_gather(features, axis_name, axis=0, tiled=True)


def contrastive_logits(
    image_features,
    text_features,
    scale,
    axis_name: Optional[str] = None,
    local_loss: bool = True,
):
    """Return (logits_per_image, logits_per_text, labels).

    Single device: [B,B] both ways, labels arange(B). On a mesh axis with local_loss: local@global
    [B, B*W] logits and labels offset by axis_index*B; without local_loss: the full global
    matrix [B*W, B*W] (every shard computes it — only for parity testing)."""
    if axis_name is None:
        logits_per_image = scale * image_features @ text_features.T
        labels = jnp.arange(image_features.shape[0])
        return logits_per_image, logits_per_image.T, labels
    all_images = gather_features(image_features, axis_name)
    all_texts = gather_features(text_features, axis_name)
    if local_loss:
        b = image_features.shape[0]
        logits_per_image = scale * image_features @ all_texts.T
        logits_per_text = scale * text_features @ all_images.T
        labels = jnp.arange(b) + b * jax.lax.axis_index(axis_name)
        return logits_per_image, logits_per_text, labels
    logits_per_image = scale * all_images @ all_texts.T
    labels = jnp.arange(all_images.shape[0])
    return logits_per_image, logits_per_image.T, labels


def clip_loss(
    image_features,
    text_features,
    logit_scale,
    *,
    label_smoothing: float = 0.0,
    normalize: bool = True,
    scale_is_log: bool = True,
    axis_name: Optional[str] = None,
    local_loss: bool = True,
):
    """Symmetric InfoNCE. Returns a scalar; on a mesh axis the value is the global-batch mean
    (identical on every shard via pmean)."""
    if normalize:
        image_features = _l2norm(image_features.astype(jnp.float32))
        text_features = _l2norm(text_features.astype(jnp.float32))
    scale = (
        jnp.exp(jnp.minimum(logit_scale, LOGIT_CLAMP)) if scale_is_log else logit_scale
    )
    li, lt, labels = contrastive_logits(
        image_features, text_features, scale, axis_name, local_loss
    )
    loss = 0.5 * (
        cross_entropy(li, labels, label_smoothing).mean()
        + cross_entropy(lt, labels, label_smoothing).mean()
    )
    if axis_name is not None:
        loss = jax.lax.pmean(loss, axis_name)
    return loss


def clip_loss_sampled(
    image_samples,
    text_samples,
    logit_scale,
    *,
    label_smoothing: float = 0.1,
    scale_is_log: bool = True,
):
    """Monte-Carlo InfoNCE over [S, B, E] samples -> per-sample losses [S]
    (clipLoss.py:24-79: normalize, batched [S,B,B] logits with the 3.912 clamp, flat CE)."""
    image_samples = _l2norm(image_samples.astype(jnp.float32))
    text_samples = _l2norm(text_samples.astype(jnp.float32))
    scale = (
        jnp.exp(jnp.minimum(logit_scale, LOGIT_CLAMP_SAMPLED))
        if scale_is_log
        else logit_scale
    )
    s, b, _ = image_samples.shape
    logits_per_image = scale * jnp.einsum("sbe,sce->sbc", image_samples, text_samples)
    logits_per_text = jnp.swapaxes(logits_per_image, 1, 2)
    labels = jnp.broadcast_to(jnp.arange(b), (s, b)).reshape(-1)
    loss_img = cross_entropy(logits_per_image.reshape(s * b, b), labels, label_smoothing)
    loss_txt = cross_entropy(logits_per_text.reshape(s * b, b), labels, label_smoothing)
    per_sample = 0.5 * (loss_img.reshape(s, b).mean(axis=1) + loss_txt.reshape(s, b).mean(axis=1))
    return per_sample
