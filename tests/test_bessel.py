"""log-Bessel / vMF log-partition numerics vs scipy (the reference validates against
mpmath-backed exact values, losses/distributions/VonMisesFisher.py:15-46)."""

import numpy as np
import pytest
import scipy.special as sps

import jax
import jax.numpy as jnp

from multimodal_tpu.ops.bessel import bessel_iv_ratio, log_iv, vmf_log_normalizer
from multimodal_tpu.ops.sphere import log_sphere_surface_area

# orders used by the workloads: d in {2, 3, 10, 50, 128, 512} -> nu = d/2 - 1
ORDERS = [0.0, 0.5, 1.0, 4.0, 24.0, 63.0, 255.0]
ARGS = [1e-3, 0.1, 1.0, 5.0, 20.0, 100.0, 1e3, 1e4]


def scipy_log_iv(v, z):
    # exponentially scaled to avoid overflow: log I_v(z) = log ive(v, z) + z
    with np.errstate(divide="ignore"):
        out = np.log(sps.ive(v, z)) + z
    # scipy's ive underflows for large order + small argument; series head is exact there
    series = (
        v * np.log(z / 2.0)
        - sps.gammaln(v + 1.0)
        + np.log1p(z * z / (4.0 * (v + 1.0)))
    )
    return np.where(np.isfinite(out), out, series)


@pytest.mark.parametrize("v", ORDERS)
def test_log_iv_matches_scipy(v):
    z = np.array(ARGS, dtype=np.float64)
    expected = scipy_log_iv(v, z)
    got = np.asarray(log_iv(jnp.float32(v), jnp.asarray(z, jnp.float32)))
    # f32 evaluation of values spanning ~1e4 magnitude: allow 1e-4 relative
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("v", ORDERS)
def test_bessel_ratio_matches_scipy(v):
    z = np.array(ARGS, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        expected = sps.ive(v + 1, z) / sps.ive(v, z)
    # scipy underflows to 0/0 at large order + small argument; series head: z / (2(v+1))
    expected = np.where(np.isfinite(expected), expected, z / (2.0 * (v + 1.0)))
    got = np.asarray(bessel_iv_ratio(jnp.float32(v), jnp.asarray(z, jnp.float32)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)
    assert np.all(got >= 0.0) and np.all(got < 1.0)


@pytest.mark.parametrize("d", [3, 10, 128, 512])
def test_vmf_log_normalizer_gradient_is_neg_ratio(d):
    """d logC_d/d kappa = -I_{d/2}(k)/I_{d/2-1}(k) — the reference's custom backward
    (VonMisesFisher.py:50-62)."""
    kappa = jnp.asarray([0.5, 5.0, 50.0, 500.0], jnp.float32)
    grad = jax.vmap(jax.grad(lambda k: vmf_log_normalizer(d, k)))(kappa)
    k_np = np.asarray(kappa)
    with np.errstate(invalid="ignore"):
        expected = -sps.ive(d / 2.0, k_np) / sps.ive(d / 2.0 - 1.0, k_np)
    nu = d / 2.0 - 1.0
    series = -k_np / (2.0 * (nu + 1.0)) * (
        1.0 - (k_np * k_np / 4.0) / ((nu + 1.0) * (nu + 2.0))
    )
    expected = np.where(np.isfinite(expected), expected, series)
    np.testing.assert_allclose(np.asarray(grad), expected, rtol=1e-4, atol=1e-5)


def test_vmf_log_normalizer_zero_kappa_is_uniform():
    d = 128
    logc = vmf_log_normalizer(d, jnp.float32(0.0))
    np.testing.assert_allclose(
        float(logc), -float(log_sphere_surface_area(d)), rtol=1e-6
    )


def test_log_iv_jittable_and_huge_kappa_finite():
    f = jax.jit(lambda z: vmf_log_normalizer(512, z))
    out = f(jnp.float32(1e12))
    assert np.isfinite(float(out))
