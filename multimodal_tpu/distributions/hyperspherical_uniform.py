"""Uniform distribution on the unit sphere S^{dim-1} embedded in R^dim.

Counterpart of the external ``power_spherical.HypersphericalUniform`` the reference pins as a
git dependency (reference pyproject.toml:36-38; used in losses/vclipLoss.py:185-189). We adopt
the convention that ``dim`` is the ambient dimension (points live in R^dim), matching how the
reference calls it with ``dim=distribution.loc.shape[-1]``.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from multimodal_tpu.ops.sphere import log_sphere_surface_area, sample_uniform_sphere


@struct.dataclass
class HypersphericalUniform:
    dim: int = struct.field(pytree_node=False)

    def log_prob(self, x):
        area = log_sphere_surface_area(self.dim, dtype=x.dtype)
        return jnp.broadcast_to(-area, x.shape[:-1])

    def entropy(self):
        return log_sphere_surface_area(self.dim)

    def sample(self, key, sample_shape=()):
        return sample_uniform_sphere(key, tuple(sample_shape) + (self.dim,))

    rsample = sample
