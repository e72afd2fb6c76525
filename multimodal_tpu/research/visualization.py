"""Research figures: vMF mixture diagnostics + modality-gap ("cone effect") projections.

Counterpart of reference papers-1-and-2/visualization.py:17-555 (VonMisesFisherVisualizer:
weight/concentration bars, PCA mean-direction scatter, component similarity matrix, data
assignments, comprehensive panel) and cardelph_projection.py's paired-embedding scatter with
image-text pair lines. All functions write a PNG and return the path; matplotlib only
(headless Agg backend)."""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_mixture_summary(em, out_path: str = "mixture_summary.png") -> str:
    """Weights + concentrations bars, mean-direction PCA scatter, component similarity
    matrix, convergence curve — the reference's 'comprehensive figure' (:452)."""
    plt = _plt()
    from multimodal_tpu.research.projection import pca_projection

    k = len(em.weights)
    fig, axes = plt.subplots(2, 2, figsize=(11, 9))

    axes[0, 0].bar(range(k), em.weights)
    axes[0, 0].set_title("component weights")
    axes[0, 0].set_xlabel("component")

    axes[0, 1].bar(range(k), em.concentrations, color="tab:orange")
    axes[0, 1].set_title("concentrations (kappa)")
    axes[0, 1].set_xlabel("component")

    if em.mean_directions.shape[1] > 2 and k >= 2:
        proj, _, _ = pca_projection(em.mean_directions, 2, center=False)
    else:
        proj = em.mean_directions[:, :2]
    axes[1, 0].scatter(proj[:, 0], proj[:, 1], s=60, c=range(k), cmap="tab10")
    for i, (x, y) in enumerate(proj):
        axes[1, 0].annotate(str(i), (x, y))
    axes[1, 0].set_title("mean directions (PCA)")

    sim = em.mean_directions @ em.mean_directions.T
    im = axes[1, 1].imshow(sim, vmin=-1, vmax=1, cmap="coolwarm")
    axes[1, 1].set_title("component similarity")
    fig.colorbar(im, ax=axes[1, 1])

    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_convergence(log_likelihoods: Sequence[float], out_path: str = "convergence.png") -> str:
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(log_likelihoods)
    ax.set_xlabel("EM iteration")
    ax.set_ylabel("mean log-likelihood")
    ax.set_title("EM convergence")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_modality_gap(
    image_embeddings: np.ndarray,
    text_embeddings: np.ndarray,
    method: str = "pca-norm",
    max_pair_lines: int = 200,
    out_path: str = "modality_gap.png",
    seed: int = 0,
) -> str:
    """Paired image/text scatter with pair segments — the cone-effect figure
    (cardelph_projection.py:155+, metrics.ipynb:cell 22)."""
    plt = _plt()
    from multimodal_tpu.research.projection import project_embeddings

    proj = project_embeddings(image_embeddings, text_embeddings, method=method, seed=seed)
    img, txt = proj["image"], proj["text"]
    fig, ax = plt.subplots(figsize=(7, 6))
    ax.scatter(img[:, 0], img[:, 1], s=8, alpha=0.6, label="image", color="tab:blue")
    ax.scatter(txt[:, 0], txt[:, 1], s=8, alpha=0.6, label="text", color="tab:red")
    for i, j in proj["pairs"][:max_pair_lines]:
        ax.plot([img[i, 0], txt[j, 0]], [img[i, 1], txt[j, 1]],
                color="gray", alpha=0.15, linewidth=0.5)
    ax.legend()
    ax.set_title(f"modality gap ({method})")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_training_metrics(history: dict, out_path: str = "training_metrics.png") -> str:
    """Loss/arc/concentration/grad-norm panel from a loss-bench history
    (test_vclipLoss.py's training_metrics.png)."""
    plt = _plt()
    fig, axes = plt.subplots(2, 2, figsize=(11, 8))
    panels = [
        ("total", "total loss"),
        ("arc", "mean pair arc (deg)"),
        ("conc_a", "mean concentration"),
        ("grad_norm", "gradient norm"),
    ]
    for ax, (key, title) in zip(axes.ravel(), panels):
        if key in history:
            ax.plot(np.asarray(history[key]))
        ax.set_title(title)
        ax.set_xlabel("step")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
