"""Variational CLIP loss: Monte-Carlo InfoNCE + KL-to-uniform + variance-matching regularizer.

Counterpart of reference losses/vclipLoss.py:43-212. Distribution-generic over the
multimodal_tpu.distributions family (PowerSpherical / VonMisesFisher / ProjectedNormal /
NormalDiag); the KL term dispatches per type exactly like _compute_kl_divergence
(vclipLoss.py:164-212):
  * NormalDiag -> sum-over-dims KL to N(0, I), mean over batch;
  * spherical dists -> KL(p || HypersphericalUniform) = -H(p) + log area(S^{d-1}).

All sampling happens on device with explicit PRNG keys — the reference's .rsample((20,)) hot
loop (trainer.ipynb:cell 19, 20 x B x 512) becomes one batched reparameterized draw."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from multimodal_tpu.distributions.normal import NormalDiag
from multimodal_tpu.distributions.power_spherical import PowerSpherical
from multimodal_tpu.losses.clip_loss import clip_loss, clip_loss_sampled


def _kl_to_prior(dist):
    if isinstance(dist, NormalDiag):
        return dist.kl_standard_normal().sum(axis=-1).mean()
    return dist.kl_uniform().mean()


def _mean_direction(dist):
    """Point estimate for mean-only mode (vclipLoss.py:32-40: normalized mean/mode)."""
    return dist.mode


def _expected_embedding(dist):
    """E[x] for PowerSpherical (power_spherical_mean2, vclipLoss.py:16-21)."""
    if isinstance(dist, PowerSpherical):
        return dist.mean
    return dist.mode


def vclip_loss(
    image_dist,
    text_dist,
    image_vars,
    text_vars,
    logit_scale,
    *,
    key=None,
    clip_weight: float = 1.0,
    kl_weight: float = 1.0,
    num_samples: int = 20,
    var_reg_weight: float = 0.1,
    use_mean_only: bool = False,
    expected_value: bool = False,
    label_smoothing: float = 0.1,
    is_train: bool = True,
    kl_weight_override: Optional[float] = None,
) -> dict:
    """Returns {'total_loss', 'clip_loss', 'image_kl_loss', 'text_kl_loss', 'var_reg'}.

    Control flow mirrors vclipLoss.forward (vclipLoss.py:78-162): sampling is used when
    kl_weight > 0 and training; otherwise the mean/mode point estimates feed the plain
    InfoNCE."""
    kl_w = kl_weight_override if kl_weight_override is not None else kl_weight
    use_sampling = (kl_w > 0) and is_train and not use_mean_only

    if use_sampling:
        if expected_value:
            contrastive = clip_loss(
                _expected_embedding(image_dist),
                _expected_embedding(text_dist),
                logit_scale,
                label_smoothing=label_smoothing,
                normalize=False,
            )
        else:
            assert key is not None, "sampling mode needs a PRNG key"
            import jax

            k_img, k_txt = jax.random.split(key)
            image_samples = image_dist.rsample(k_img, (num_samples,))
            text_samples = text_dist.rsample(k_txt, (num_samples,))
            contrastive = clip_loss_sampled(
                image_samples, text_samples, logit_scale, label_smoothing=label_smoothing
            ).mean()
    else:
        contrastive = clip_loss(
            _mean_direction(image_dist),
            _mean_direction(text_dist),
            logit_scale,
            label_smoothing=label_smoothing,
        )

    kl_image = _kl_to_prior(image_dist)
    kl_text = _kl_to_prior(text_dist)

    # variance-matching: penalize log-ratio of the concentration heads (vclipLoss.py:145-152)
    log_iv_ = jnp.log(image_vars + 1e-8)
    log_tv = jnp.log(text_vars + 1e-8)
    if isinstance(image_dist, NormalDiag):
        var_reg = jnp.mean(jnp.sum(jnp.square(log_iv_ - log_tv), axis=-1))
    else:
        var_reg = jnp.mean(jnp.square(log_iv_ - log_tv))

    total = (
        clip_weight * contrastive
        + 0.5 * kl_w * (kl_image + kl_text)
        + var_reg_weight * var_reg
    )
    return {
        "total_loss": total,
        "clip_loss": contrastive,
        "image_kl_loss": kl_image,
        "text_kl_loss": kl_text,
        "var_reg": var_reg,
    }
