"""Projected Normal distribution: an isotropic Gaussian radially projected onto S^{d-1}.

Counterpart of reference losses/distributions/ProjectedNormal.py:7-118. The reference's
log_prob/entropy are explicitly *approximations* (its docstring calls them "simplified form" /
normal-entropy proxy); we keep the same approximation contract so loss dynamics match:

  * rsample — exact and trivially reparameterized: normalize(mu + sigma * eps)
    (reference :41-49);
  * log_prob — Gaussian-quadratic approximation in the dot product mu^T x
    (reference :51-88);
  * entropy — entropy of the underlying Normal (reference :89-99).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from multimodal_tpu.ops.sphere import l2_normalize, log_sphere_surface_area


@struct.dataclass
class ProjectedNormal:
    mu: jax.Array  # [..., d] (not necessarily unit norm)
    sigma: jax.Array  # [..., d] or broadcastable std of the underlying normal

    @property
    def dim(self):
        return self.mu.shape[-1]

    @property
    def loc(self):
        return l2_normalize(self.mu)

    @property
    def mean(self):
        return self.loc

    @property
    def mode(self):
        return self.loc

    def rsample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.mu.shape
        eps = jax.random.normal(key, shape, dtype=self.mu.dtype)
        return l2_normalize(self.mu + self.sigma * eps)

    sample = rsample

    def log_prob(self, value):
        value = l2_normalize(value)
        sigma = jnp.broadcast_to(self.sigma, self.mu.shape)
        mu_norm_sq = jnp.sum(jnp.square(self.mu), axis=-1, keepdims=True)
        dot = jnp.sum(self.mu * value, axis=-1, keepdims=True)
        inv_var = 1.0 / jnp.square(sigma)
        exponent = -0.5 * jnp.sum(mu_norm_sq * inv_var, axis=-1) + 0.5 * jnp.sum(
            jnp.square(dot) * inv_var, axis=-1
        )
        log_norm = -0.5 * self.dim * jnp.log(2.0 * jnp.pi) - jnp.sum(
            jnp.log(sigma), axis=-1
        )
        return log_norm + exponent

    def entropy(self):
        sigma = jnp.broadcast_to(self.sigma, self.mu.shape)
        return 0.5 * self.dim * (1.0 + jnp.log(2.0 * jnp.pi)) + jnp.sum(
            jnp.log(sigma), axis=-1
        )

    def kl_uniform(self):
        """Entropy-proxy KL to the uniform sphere (same convention as the spherical dists)."""
        return -self.entropy() + log_sphere_surface_area(self.dim, dtype=self.mu.dtype)
