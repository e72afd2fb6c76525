"""Research toolkit: vMF mixture EM recovery, concentration solver accuracy, GMM selection,
PCA projections, and the loss-dynamics bench (the reference's committed-artifact regression:
pairs converge, concentrations grow)."""

import numpy as np
import pytest
import scipy.special as sps

import jax

from multimodal_tpu.research import (
    VMFMixtureEM,
    fit_von_mises_fisher_mixture,
    gmm_model_selection,
    pca_projection,
    project_embeddings,
    solve_concentration,
)
from multimodal_tpu.research.gmm_fit import modality_statistics
from multimodal_tpu.research.loss_bench import run_loss_bench


def _sample_vmf(rng, mu, kappa, n):
    """Reference-grade vMF sampler via scipy for test data (Wood's method, numpy)."""
    d = len(mu)
    # sample tangent + weight via rejection (small n, test only)
    out = []
    b = (-2 * kappa + np.sqrt(4 * kappa**2 + (d - 1) ** 2)) / (d - 1)
    x0 = (1 - b) / (1 + b)
    c = kappa * x0 + (d - 1) * np.log(1 - x0**2)
    while len(out) < n:
        z = rng.beta((d - 1) / 2, (d - 1) / 2)
        w = (1 - (1 + b) * z) / (1 - (1 - b) * z)
        u = rng.uniform()
        if kappa * w + (d - 1) * np.log(1 - x0 * w) - c >= np.log(u):
            v = rng.normal(size=d - 1)
            v /= np.linalg.norm(v)
            out.append(np.concatenate([[w], np.sqrt(1 - w**2) * v]))
    x = np.asarray(out)
    # rotate e1 -> mu (Householder)
    e1 = np.zeros(d); e1[0] = 1.0
    u = e1 - mu
    if np.linalg.norm(u) < 1e-12:
        return x
    u /= np.linalg.norm(u)
    return x - 2 * np.outer(x @ u, u)


def test_solve_concentration_inverts_bessel_ratio():
    for d in (3, 16, 128, 512):
        nu = d / 2 - 1
        for kappa in (0.5, 5.0, 50.0, 500.0):
            rbar = sps.iv(nu + 1, kappa) / sps.iv(nu, kappa)
            if not np.isfinite(rbar):  # scipy overflows at large kappa/d; skip those
                continue
            got = float(solve_concentration(np.float32(rbar), d))
            assert abs(got - kappa) / kappa < 0.02, (d, kappa, got)


def test_vmf_em_recovers_two_clusters():
    """em_algorithm.py:374-407's synthetic two-component recovery, deterministic."""
    rng = np.random.default_rng(0)
    d = 8
    mu1 = np.zeros(d); mu1[0] = 1.0
    mu2 = np.zeros(d); mu2[1] = 1.0
    x = np.concatenate([
        _sample_vmf(rng, mu1, 50.0, 300),
        _sample_vmf(rng, mu2, 50.0, 300),
    ])
    em = fit_von_mises_fisher_mixture(x, n_components=2, seed=1)
    assert em.converged_
    assert sorted(np.round(em.weights, 1)) == [0.5, 0.5]
    # each true mean matches one recovered component
    sims = np.abs(em.mean_directions @ np.stack([mu1, mu2]).T)
    assert sims.max(axis=0).min() > 0.98
    assert (em.concentrations > 25).all() and (em.concentrations < 100).all()
    # log-likelihood increased monotonically (up to tolerance)
    lls = em.log_likelihoods_
    assert lls[-1] >= lls[0]
    # predictions separate the clusters
    labels = em.predict(x)
    first, second = labels[:300], labels[300:]
    assert (first == first[0]).mean() > 0.95 and (second == second[0]).mean() > 0.95
    assert first[0] != second[0]


def test_vmf_em_perplexity_and_dict():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(100, 4))
    em = VMFMixtureEM(n_components=2, max_iter=10, seed=0).fit(x)
    assert np.isfinite(em.perplexity(x))
    d = em.to_dict()
    assert len(d["weights"]) == 2 and len(d["mean_directions"][0]) == 4


def test_gmm_model_selection_prefers_true_k():
    rng = np.random.default_rng(2)
    x = np.concatenate([
        rng.normal(-4, 1, (200, 3)),
        rng.normal(4, 1, (200, 3)),
    ])
    out = gmm_model_selection(x, component_range=(1, 2, 3, 4), seed=0)
    assert out["best_bic_k"] == 2
    assert out["best_silhouette_k"] == 2
    assert len(out["results"]) == 4


def test_modality_statistics():
    rng = np.random.default_rng(3)
    img = rng.normal(0, 1, (50, 8)) + 2.0  # shifted cluster = modality gap
    txt = rng.normal(0, 1, (50, 8)) - 2.0
    stats = modality_statistics(img, txt)
    assert stats["centroid_distance"] > 0.5
    assert stats["within_image_cosine"] > stats["cross_modal_cosine"]


def test_pca_projection_variance_order():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(200, 5)) * np.array([10.0, 3.0, 1.0, 0.1, 0.01])
    proj, comps, var = pca_projection(x, 3)
    assert proj.shape == (200, 3) and comps.shape == (3, 5)
    assert var[0] > var[1] > var[2]
    assert abs(abs(comps[0][0]) - 1.0) < 0.05  # first PC aligns with the big axis


def test_project_embeddings_pairs():
    rng = np.random.default_rng(5)
    out = project_embeddings(rng.normal(size=(20, 16)), rng.normal(size=(20, 16)),
                             method="pca-norm")
    assert out["image"].shape == (20, 2) and out["text"].shape == (20, 2)
    assert out["pairs"][0] == (0, 0) and len(out["pairs"]) == 20
    with pytest.raises(ValueError):
        project_embeddings(np.zeros((4, 4)), np.zeros((4, 4)), method="nope")


@pytest.mark.slow
@pytest.mark.parametrize("dist", ["power_spherical", "vmf", "projected_normal"])
def test_loss_bench_dynamics(dist):
    """The reference's regression criterion (BASELINE.md): pairs stay close/converge and the
    bench runs NaN-free; for PowerSpherical concentrations must GROW (0.1 -> ~28 in the
    reference's 1000-step run; we run 300 steps and require clear growth)."""
    res = run_loss_bench(dist, steps=300, seed=0)
    assert np.isfinite(res.final_total_loss)
    assert np.isfinite(res.grad_norm_last)
    assert res.final_arc_deg < 45.0  # positive pairs must not fly apart
    if dist == "power_spherical":
        assert res.final_concentration_a > 3 * res.initial_concentration_a
    text = res.summary_text()
    assert "Final losses" in text and dist in text


def test_tsne_projection_separates_clusters():
    """From-scratch exact t-SNE (research/projection.py:tsne_projection): two
    well-separated 32-D clusters must stay separated in 2-D, deterministically."""
    import numpy as np

    from multimodal_tpu.research.projection import project_embeddings, tsne_projection

    rng = np.random.default_rng(0)
    a = rng.standard_normal((40, 32)) * 0.05 + 5.0
    b = rng.standard_normal((40, 32)) * 0.05 - 5.0
    y = tsne_projection(np.concatenate([a, b]), iters=250, seed=1)
    assert y.shape == (80, 2) and np.isfinite(y).all()
    ca, cb = y[:40].mean(0), y[40:].mean(0)
    spread = max(y[:40].std(), y[40:].std())
    assert np.linalg.norm(ca - cb) > 3 * spread, "clusters collapsed"
    y2 = tsne_projection(np.concatenate([a, b]), iters=250, seed=1)
    np.testing.assert_array_equal(y, y2)
    # dispatch through the cone-effect entry point
    out = project_embeddings(a, b, method="tsne", n_components=2)
    assert out["image"].shape == (40, 2) and out["method"] == "tsne"
