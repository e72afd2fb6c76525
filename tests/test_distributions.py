"""Distribution test bench — deterministic pytest version of the reference's
distribution_training_comparisons/test_distributions.py (on-sphere assertions :77-80,
log_prob shapes, mean/mode/entropy availability :94-112, gradient flow :114+, high-dim sweep
d in {10,50,128,512} :274)."""

import numpy as np
import pytest
import scipy.special as sps

import jax
import jax.numpy as jnp

from multimodal_tpu.distributions import (
    HypersphericalUniform,
    PowerSpherical,
    ProjectedNormal,
    VonMisesFisher,
)
from multimodal_tpu.ops.sphere import l2_normalize

DIMS = [3, 10, 50, 128, 512]


def make_dist(kind, key, d, batch=4, kappa=20.0):
    mu = l2_normalize(jax.random.normal(key, (batch, d)))
    if kind == "power_spherical":
        return PowerSpherical(loc=mu, scale=jnp.full((batch,), kappa))
    if kind == "vmf":
        return VonMisesFisher(loc=mu, scale=jnp.full((batch,), kappa))
    if kind == "projected_normal":
        return ProjectedNormal(mu=mu * 3.0, sigma=jnp.full((batch, d), 0.5))
    raise ValueError(kind)


@pytest.mark.parametrize("kind", ["power_spherical", "vmf", "projected_normal"])
@pytest.mark.parametrize("d", DIMS)
def test_samples_on_unit_sphere(kind, d):
    key = jax.random.PRNGKey(0)
    dist = make_dist(kind, key, d)
    samples = dist.rsample(jax.random.PRNGKey(1), (16,))
    assert samples.shape == (16, 4, d)
    norms = np.asarray(jnp.linalg.norm(samples, axis=-1))
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    lp = dist.log_prob(samples)
    assert lp.shape == (16, 4)
    assert np.all(np.isfinite(np.asarray(lp)))


@pytest.mark.parametrize("kind", ["power_spherical", "vmf"])
def test_high_concentration_samples_near_mode(kind):
    d = 64
    dist = make_dist(kind, jax.random.PRNGKey(2), d, kappa=5000.0)
    samples = dist.rsample(jax.random.PRNGKey(3), (256,))
    cos = np.asarray(jnp.sum(samples * dist.loc[None], axis=-1))
    assert cos.mean() > 0.95


@pytest.mark.parametrize("kind", ["power_spherical", "vmf"])
def test_mc_entropy_matches_analytic(kind):
    d = 16
    dist = make_dist(kind, jax.random.PRNGKey(4), d, batch=2, kappa=30.0)
    samples = dist.rsample(jax.random.PRNGKey(5), (8192,))
    mc_entropy = -np.asarray(dist.log_prob(samples)).mean(axis=0)
    analytic = np.asarray(dist.entropy())
    np.testing.assert_allclose(mc_entropy, analytic, rtol=0.05, atol=0.05)


def test_vmf_sample_mean_resultant_length():
    d = 32
    kappa = 25.0
    dist = VonMisesFisher(
        loc=jnp.tile(l2_normalize(jnp.ones((1, d))), (1, 1)), scale=jnp.full((1,), kappa)
    )
    samples = dist.sample(jax.random.PRNGKey(6), (16384,))
    emp = np.asarray(jnp.sum(samples.mean(axis=0) * dist.loc, axis=-1))[0]
    expected = sps.ive(d / 2.0, kappa) / sps.ive(d / 2.0 - 1.0, kappa)
    np.testing.assert_allclose(emp, expected, rtol=0.03)


def test_power_spherical_marginal_t_mean():
    d = 512
    kappa = 40.0
    dist = PowerSpherical(
        loc=l2_normalize(jax.random.normal(jax.random.PRNGKey(7), (3, d))),
        scale=jnp.full((3,), kappa),
    )
    samples = dist.rsample(jax.random.PRNGKey(8), (8192,))
    emp = np.asarray(jnp.sum(samples * dist.loc[None], axis=-1)).mean(axis=0)
    alpha, beta = (d - 1) / 2 + kappa, (d - 1) / 2
    expected = (alpha - beta) / (alpha + beta)
    np.testing.assert_allclose(emp, expected, rtol=0.05, atol=0.01)
    np.testing.assert_allclose(np.asarray(dist.marginal_t_mean()), expected, rtol=1e-6)


@pytest.mark.parametrize("kind", ["power_spherical", "vmf", "projected_normal"])
def test_gradient_flow(kind):
    """Gradients reach loc and scale (reference bench :114+)."""
    d = 24

    def loss_fn(loc_raw, scale_raw, key):
        mu = l2_normalize(loc_raw)
        scale = jax.nn.softplus(scale_raw)
        if kind == "power_spherical":
            dist = PowerSpherical(loc=mu, scale=scale)
        elif kind == "vmf":
            dist = VonMisesFisher(loc=mu, scale=scale)
        else:
            dist = ProjectedNormal(mu=loc_raw, sigma=scale[..., None])
        s = dist.rsample(key, (8,))
        target = l2_normalize(jnp.ones((d,)))
        return -jnp.mean(jnp.sum(s * target, axis=-1)) - 0.01 * jnp.mean(
            dist.log_prob(jax.lax.stop_gradient(s))
        )

    loc_raw = jax.random.normal(jax.random.PRNGKey(9), (4, d))
    scale_raw = jnp.full((4,), 2.0)
    g_loc, g_scale = jax.grad(loss_fn, argnums=(0, 1))(
        loc_raw, scale_raw, jax.random.PRNGKey(10)
    )
    assert np.all(np.isfinite(np.asarray(g_loc)))
    assert np.all(np.isfinite(np.asarray(g_scale)))
    assert float(jnp.abs(g_loc).sum()) > 0
    assert float(jnp.abs(g_scale).sum()) > 0


def test_kl_uniform_nonnegative_and_vanishes():
    d = 64
    mu = l2_normalize(jax.random.normal(jax.random.PRNGKey(11), (5, d)))
    for kappa, expect_small in [(1e-4, True), (50.0, False)]:
        for cls in (PowerSpherical, VonMisesFisher):
            dist = cls(loc=mu, scale=jnp.full((5,), kappa))
            kl = np.asarray(dist.kl_uniform())
            assert np.all(kl > -1e-3)
            if expect_small:
                assert np.all(kl < 0.01)
            else:
                assert np.all(kl > 1.0)


def test_hyperspherical_uniform():
    d = 128
    u = HypersphericalUniform(dim=d)
    s = u.sample(jax.random.PRNGKey(12), (64,))
    assert s.shape == (64, d)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(s, axis=-1)), 1.0, atol=1e-5)
    lp = float(u.log_prob(s[0]))
    expected = -(
        np.log(2.0) + (d / 2.0) * np.log(np.pi) - sps.gammaln(d / 2.0)
    )
    np.testing.assert_allclose(lp, expected, rtol=1e-5)


def test_sampling_is_jittable():
    d = 32
    mu = l2_normalize(jax.random.normal(jax.random.PRNGKey(13), (8, d)))

    @jax.jit
    def draw(key):
        ps = PowerSpherical(loc=mu, scale=jnp.full((8,), 10.0)).rsample(key, (4,))
        vmf = VonMisesFisher(loc=mu, scale=jnp.full((8,), 10.0)).rsample(key, (4,))
        return ps, vmf

    ps, vmf = draw(jax.random.PRNGKey(14))
    assert ps.shape == vmf.shape == (4, 8, d)


def test_sphere_ops_finite_grads_at_degenerate_points():
    """householder_rotation at mu == e1 and exponential_map at v == 0 must have finite
    gradients (the where/norm trap: norm's VJP at the zero vector emits NaN even on the
    unselected branch without the double-where guard)."""
    import jax
    import jax.numpy as jnp

    from multimodal_tpu.ops.sphere import exponential_map, householder_rotation

    mu = jnp.zeros((3, 4)).at[:, 0].set(1.0)  # exactly the north pole
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 4))
    g = jax.grad(lambda m: jnp.sum(householder_rotation(x, m)))(mu)
    assert bool(jnp.isfinite(g).all())
    # the degenerate reflection is the identity
    np.testing.assert_allclose(np.asarray(householder_rotation(x, mu)), np.asarray(x),
                               rtol=1e-6)

    v = jnp.zeros((3, 4))
    np.testing.assert_allclose(np.asarray(exponential_map(mu, v)), np.asarray(mu))
    gv = jax.grad(lambda t: jnp.sum(exponential_map(mu, t)))(v)
    gm = jax.grad(lambda m: jnp.sum(exponential_map(m, v)))(mu)
    assert bool(jnp.isfinite(gv).all()) and bool(jnp.isfinite(gm).all())
