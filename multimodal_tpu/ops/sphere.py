"""Unit-sphere geometry helpers shared by the spherical distributions and losses."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log_sphere_surface_area(dim, dtype=jnp.float32):
    """log area(S^{dim-1}) = log(2 pi^{dim/2} / Gamma(dim/2)) for points living in R^dim."""
    half = jnp.asarray(dim, dtype) / 2.0
    return jnp.log(2.0) + half * jnp.log(jnp.pi) - jax.lax.lgamma(half)


def l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def sample_uniform_sphere(key, shape, dtype=jnp.float32):
    """Uniform samples on S^{shape[-1]-1} (Gaussian + normalize)."""
    g = jax.random.normal(key, shape, dtype=dtype)
    return l2_normalize(g)


def householder_rotation(x, mu):
    """Reflect samples so that the north pole e1 maps onto ``mu``.

    Given x sampled in a frame whose first coordinate is the ``mu`` direction (the standard
    trick for spherical samplers), reflect across the bisector of e1 and mu:
    H = I - 2 u u^T with u = normalize(e1 - mu). H e1 = mu, H is orthogonal.

    x: [..., d] samples; mu: [..., d] unit mean directions (broadcastable against x).
    """
    d = x.shape[-1]
    e1 = jnp.zeros_like(mu).at[..., 0].set(1.0)
    u = e1 - mu
    # When mu == e1 the reflection is degenerate; fall back to identity. Double-where:
    # norm's VJP at the zero vector is 0*inf = NaN even on the unselected branch, so the
    # norm must be taken over a vector that is safely nonzero everywhere.
    sq = jnp.sum(jnp.square(u), axis=-1, keepdims=True)
    safe = sq > 1e-12
    u_safe = jnp.where(safe, u, e1)  # any nonzero stand-in on the degenerate rows
    norm = jnp.linalg.norm(u_safe, axis=-1, keepdims=True)
    u = jnp.where(safe, u_safe / norm, jnp.zeros_like(u))
    proj = jnp.sum(u * x, axis=-1, keepdims=True)
    return x - 2.0 * proj * u


def tangent_project(grad, mu):
    """Project ``grad`` onto the tangent space of the sphere at ``mu`` (Riemannian gradient).

    Mirrors the riemannian_gradient_hook of the reference's vCLIP trainer
    (Notebooks/trainer.ipynb:cell 19): g_tan = g - (g . mu) mu.
    """
    radial = jnp.sum(grad * mu, axis=-1, keepdims=True)
    return grad - radial * mu


@jax.custom_vjp
def riemannian_grad(mu):
    """Identity whose backward projects the cotangent onto the sphere's tangent space at mu.

    The JAX equivalent of the reference's ``image_means.register_hook(riemannian_gradient_hook)``
    (Notebooks/trainer.ipynb train_epoch): applied to the (unit-norm) mean activations inside
    the loss, it makes every upstream gradient respect the spherical constraint without
    touching the forward values.
    """
    return mu


def _riemannian_grad_fwd(mu):
    return mu, mu


def _riemannian_grad_bwd(mu, g):
    return (tangent_project(g, mu),)


riemannian_grad.defvjp(_riemannian_grad_fwd, _riemannian_grad_bwd)


def exponential_map(mu, v):
    """Exponential map on the unit sphere: walk from mu along tangent vector v.

    Double-where guards the v == 0 case: norm's VJP at the zero vector would emit NaN
    into dv/dmu even though the identity branch is selected."""
    sq = jnp.sum(jnp.square(v), axis=-1, keepdims=True)
    safe = sq > 1e-18
    v_safe = jnp.where(safe, v, jnp.ones_like(v))
    norm = jnp.linalg.norm(v_safe, axis=-1, keepdims=True)
    stepped = jnp.cos(norm) * mu + jnp.sin(norm) * v_safe / norm
    return jnp.where(safe, stepped, mu)
