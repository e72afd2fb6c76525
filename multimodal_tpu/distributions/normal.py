"""Diagonal Normal — used by the Gaussian mode of the variational CLIP loss
(reference vclipLoss.py:148-151, 180-189 use torch.distributions.Normal + KL to N(0, I))."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class NormalDiag:
    loc: jax.Array  # [..., d]
    scale: jax.Array  # [..., d] std

    def rsample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.loc.shape
        return self.loc + self.scale * jax.random.normal(key, shape, dtype=self.loc.dtype)

    sample = rsample

    @property
    def mean(self):
        return self.loc

    mode = mean

    def log_prob(self, x):
        var = jnp.square(self.scale)
        return -0.5 * (
            jnp.log(2.0 * jnp.pi) + jnp.log(var) + jnp.square(x - self.loc) / var
        )

    def entropy(self):
        return 0.5 * (1.0 + jnp.log(2.0 * jnp.pi)) + jnp.log(self.scale)

    def kl_standard_normal(self):
        """KL(N(mu, sigma^2) || N(0, 1)) per dimension."""
        var = jnp.square(self.scale)
        return 0.5 * (var + jnp.square(self.loc) - 1.0 - jnp.log(var))
