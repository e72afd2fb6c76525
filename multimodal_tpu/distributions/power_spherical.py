"""Power Spherical distribution (De Cao & Aziz, 2020) — exactly reparameterizable on TPU.

Counterpart of the external ``power_spherical`` package the reference pins
(reference pyproject.toml:36-38, used throughout Notebooks/trainer.ipynb:cell 19 and
losses/vclipLoss.py). Density on S^{d-1}:

    p(x; mu, kappa) = N(kappa, d)^{-1} (1 + mu^T x)^kappa

with log N = (alpha + beta) log 2 + beta log pi + lgamma(alpha) - lgamma(alpha + beta),
alpha = (d-1)/2 + kappa, beta = (d-1)/2.

Sampling is fully reparameterized (no rejection): t = 2 Z - 1 with Z ~ Beta(alpha, beta),
a uniform tangent direction on S^{d-2}, and a Householder reflection onto mu — every step is
a fixed-shape XLA-friendly computation, unlike the reference's host-side samplers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from multimodal_tpu.ops.sphere import (
    householder_rotation,
    log_sphere_surface_area,
    sample_uniform_sphere,
)


@struct.dataclass
class PowerSpherical:
    loc: jax.Array  # [..., d] unit mean directions
    scale: jax.Array  # [...] concentration kappa >= 0

    @property
    def dim(self):
        return self.loc.shape[-1]

    def _alpha_beta(self):
        beta = (self.dim - 1.0) / 2.0
        alpha = beta + self.scale
        return alpha, jnp.full_like(alpha, beta)

    def log_normalizer(self):
        """-log N(kappa, d); log_prob = log_normalizer + kappa * log1p(mu^T x)."""
        alpha, beta = self._alpha_beta()
        return -(
            (alpha + beta) * jnp.log(2.0)
            + beta * jnp.log(jnp.pi)
            + jax.lax.lgamma(alpha)
            - jax.lax.lgamma(alpha + beta)
        )

    def log_prob(self, x):
        dot = jnp.sum(self.loc * x, axis=-1)
        return self.log_normalizer() + self.scale * jnp.log1p(
            jnp.clip(dot, -1.0 + 1e-7, 1.0)
        )

    def rsample(self, key, sample_shape=()):
        sample_shape = tuple(sample_shape)
        shape = sample_shape + self.scale.shape
        k_beta, k_dir = jax.random.split(key)
        # Beyond kappa ~ 1e8 the f32 Beta reparameterization saturates (samples == loc exactly)
        # and its implicit gradient NaNs; clamp the sampling path only — log_prob/entropy/KL
        # stay exact, and the KL term still provides a (downward) kappa gradient up there.
        # The reference clamps its concentration head to <= 1e12 for the same fragility
        # (variationalClip.py:296-314).
        beta_dim = (self.dim - 1.0) / 2.0
        alpha = beta_dim + jnp.minimum(self.scale, 1e8)
        beta = jnp.full_like(alpha, beta_dim)
        z = jax.random.beta(k_beta, alpha, beta, shape=shape)
        # keep t strictly inside (-1, 1): at t = +-1 the sqrt(1 - t^2) factor has an
        # infinite derivative and the implicit Beta gradient NaNs (low-kappa, low-dim risk)
        t = jnp.clip(2.0 * z - 1.0, -1.0 + 1e-6, 1.0 - 1e-6)
        v = sample_uniform_sphere(k_dir, shape + (self.dim - 1,), dtype=self.loc.dtype)
        y = jnp.concatenate(
            [t[..., None], jnp.sqrt(jnp.clip(1.0 - t * t, 0.0)) [..., None] * v],
            axis=-1,
        )
        return householder_rotation(y, jnp.broadcast_to(self.loc, shape + (self.dim,)))

    sample = rsample

    @property
    def mean(self):
        alpha, beta = self._alpha_beta()
        return self.loc * ((alpha - beta) / (alpha + beta))[..., None]

    @property
    def mode(self):
        return self.loc

    def marginal_t_mean(self):
        """E[mu^T x] = (alpha - beta)/(alpha + beta) — the reference's power_spherical_mean
        helpers (losses/vclipLoss.py:11-24)."""
        alpha, beta = self._alpha_beta()
        return (alpha - beta) / (alpha + beta)

    def entropy(self):
        alpha, beta = self._alpha_beta()
        log_norm = -self.log_normalizer()
        return log_norm - self.scale * (
            jnp.log(2.0) + jax.lax.digamma(alpha) - jax.lax.digamma(alpha + beta)
        )

    def kl_uniform(self):
        """KL(PowerSpherical || HypersphericalUniform) in closed form
        (= -entropy + log area(S^{d-1}); matches the registered torch KL used at
        reference losses/vclipLoss.py:185-189)."""
        return -self.entropy() + log_sphere_surface_area(self.dim, dtype=self.loc.dtype)
