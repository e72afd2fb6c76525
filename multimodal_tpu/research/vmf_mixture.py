"""von Mises-Fisher mixture fitting by EM — fully vectorized JAX.

Counterpart of reference papers-1-and-2/em_algorithm.py:14-372 (+ the NumPy vMF in
von_mises_fisher.py). The reference solves each component's concentration with a bounded
scipy scalar optimization per EM iteration (em_algorithm.py:188-220, CPU, per-component
Python loop); here the whole EM step — responsibilities, weights, mean directions, and the
Bessel-ratio concentration solve — is one jitted program:

  * E-step: log-responsibilities via vmf log-density + logsumexp (em_algorithm.py:99-136);
  * M-step mean directions: normalized responsibility-weighted sums (:142-163);
  * concentrations: Banerjee et al. (2005) closed-form kappa ~= rbar(d - rbar^2)/(1 - rbar^2)
    (the reference's fallback, :222-233) refined by fixed-count Newton iterations on
    A_d(kappa) = I_{d/2}(kappa)/I_{d/2-1}(kappa) = rbar using the exact derivative
    A' = 1 - A^2 - (d-1)/kappa * A — matching the reference's root-find (:188-220) without
    host round-trips;
  * k-means++-style initialization on cosine distance (:47-97), seeded and deterministic.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tpu.ops.bessel import bessel_iv_ratio, vmf_log_normalizer

_NEWTON_ITERS = 8
_MAX_KAPPA = 1e6


def solve_concentration(rbar, dim: int):
    """kappa such that A_d(kappa) = rbar: Banerjee init + Newton on A_d (em:188-233)."""
    rbar = jnp.clip(rbar, 1e-6, 1.0 - 1e-6)
    d = float(dim)
    kappa = rbar * (d - rbar**2) / (1.0 - rbar**2)  # Banerjee approximation
    nu = d / 2.0 - 1.0

    def body(_, kappa):
        a = bessel_iv_ratio(nu, kappa)  # A_d(kappa) = I_{d/2}/I_{d/2-1}
        da = 1.0 - a * a - (d - 1.0) / jnp.maximum(kappa, 1e-6) * a
        step = (a - rbar) / jnp.where(jnp.abs(da) < 1e-12, 1e-12, da)
        return jnp.clip(kappa - step, 1e-4, _MAX_KAPPA)

    return jax.lax.fori_loop(0, _NEWTON_ITERS, body, kappa)


def _vmf_log_prob(x, mu, kappa):
    """[N,D] x [K,D] x [K] -> [N,K] log densities."""
    d = x.shape[-1]
    return vmf_log_normalizer(d, kappa)[None, :] + (x @ mu.T) * kappa[None, :]


@functools.partial(jax.jit, static_argnames=("n_components",))
def _em_step(x, weights, mus, kappas, n_components: int):
    """One full EM iteration. x [N,D] unit vectors."""
    log_w = jnp.log(jnp.maximum(weights, 1e-12))
    log_p = _vmf_log_prob(x, mus, kappas) + log_w[None, :]  # [N,K]
    log_norm = jax.scipy.special.logsumexp(log_p, axis=1, keepdims=True)
    log_resp = log_p - log_norm
    resp = jnp.exp(log_resp)  # [N,K]
    ll = jnp.mean(log_norm)

    nk = resp.sum(axis=0)  # [K]
    new_weights = nk / x.shape[0]
    sums = resp.T @ x  # [K,D]
    norms = jnp.linalg.norm(sums, axis=1)
    new_mus = sums / jnp.maximum(norms, 1e-12)[:, None]
    rbar = norms / jnp.maximum(nk, 1e-12)
    new_kappas = solve_concentration(rbar, x.shape[1])
    return new_weights, new_mus, new_kappas, ll


def _kmeanspp_init(key, x, k):
    """k-means++-style seeding on cosine distance (em_algorithm.py:47-97)."""
    n = x.shape[0]
    k0, key = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, n)
    centers = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(x[first])

    def body(i, carry):
        centers, key = carry
        sims = x @ centers.T  # [N, K]
        idx = jnp.arange(k)
        mask = (idx < i)[None, :]
        best = jnp.max(jnp.where(mask, sims, -jnp.inf), axis=1)
        dist = jnp.clip(1.0 - best, 0.0, 2.0)
        key, sub = jax.random.split(key)
        probs = dist / jnp.maximum(dist.sum(), 1e-12)
        choice = jax.random.choice(sub, n, p=probs)
        return centers.at[i].set(x[choice]), key

    centers, _ = jax.lax.fori_loop(1, k, body, (centers, key))
    return centers


@dataclass
class VMFMixtureEM:
    """EM fitter (em_algorithm.py:14 VonMisesFisherEM). fit() returns self; parameters in
    .weights/.mean_directions/.concentrations; .log_likelihoods_ tracks convergence."""

    n_components: int = 2
    max_iter: int = 100
    tol: float = 1e-5
    seed: int = 0
    init_kappa: float = 10.0
    weights: Optional[np.ndarray] = None
    mean_directions: Optional[np.ndarray] = None
    concentrations: Optional[np.ndarray] = None
    log_likelihoods_: list = field(default_factory=list)
    converged_: bool = False

    def fit(self, x: np.ndarray):
        x = np.asarray(x, np.float32)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        xj = jnp.asarray(x)
        key = jax.random.PRNGKey(self.seed)
        mus = _kmeanspp_init(key, xj, self.n_components)
        weights = jnp.full((self.n_components,), 1.0 / self.n_components)
        kappas = jnp.full((self.n_components,), self.init_kappa)

        self.log_likelihoods_ = []
        prev_ll = -np.inf
        for _ in range(self.max_iter):
            weights, mus, kappas, ll = _em_step(xj, weights, mus, kappas, self.n_components)
            ll = float(ll)
            self.log_likelihoods_.append(ll)
            if abs(ll - prev_ll) < self.tol:  # em_algorithm.py:284-291
                self.converged_ = True
                break
            prev_ll = ll

        self.weights = np.asarray(weights)
        self.mean_directions = np.asarray(mus)
        self.concentrations = np.asarray(kappas)
        return self

    def log_likelihood(self, x: np.ndarray) -> float:
        x = np.asarray(x, np.float32)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        log_p = _vmf_log_prob(
            jnp.asarray(x), jnp.asarray(self.mean_directions), jnp.asarray(self.concentrations)
        ) + jnp.log(jnp.asarray(self.weights))[None, :]
        return float(jnp.mean(jax.scipy.special.logsumexp(log_p, axis=1)))

    def perplexity(self, x: np.ndarray) -> float:
        return float(np.exp(-self.log_likelihood(x)))

    def predict(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float32)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        log_p = _vmf_log_prob(
            jnp.asarray(x), jnp.asarray(self.mean_directions), jnp.asarray(self.concentrations)
        ) + jnp.log(jnp.asarray(self.weights))[None, :]
        return np.asarray(jnp.argmax(log_p, axis=1))

    def to_dict(self) -> dict:
        return {
            "weights": self.weights.tolist(),
            "mean_directions": self.mean_directions.tolist(),
            "concentrations": self.concentrations.tolist(),
            "log_likelihoods": self.log_likelihoods_,
            "converged": self.converged_,
        }


def fit_von_mises_fisher_mixture(x, n_components: int = 2, **kw) -> VMFMixtureEM:
    """em_algorithm.py:345 entry point."""
    return VMFMixtureEM(n_components=n_components, **kw).fit(x)
