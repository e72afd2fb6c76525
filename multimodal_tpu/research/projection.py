"""Embedding projections for modality-gap visualization (the "cone effect" figures).

Counterpart of reference papers-1-and-2/cardelph_projection.py:15-353 and
visualizations/visualizations.py: PCA / normalized-PCA / UMAP 2-D and 3-D projections of
paired image/text embeddings, with image-text pair segments. Plot-free core: returns
projected coordinates + pair indices; rendering (matplotlib) is the caller's concern.
UMAP is optional (not in the TPU image) and gated."""

from __future__ import annotations

import numpy as np


def pca_projection(x: np.ndarray, n_components: int = 2, center: bool = True):
    """Plain PCA via SVD. Returns (projected [N,k], components [k,D], explained_var [k])."""
    x = np.asarray(x, np.float64)
    mean = x.mean(axis=0) if center else np.zeros(x.shape[1])
    xc = x - mean
    u, s, vt = np.linalg.svd(xc, full_matrices=False)
    comps = vt[:n_components]
    proj = xc @ comps.T
    explained = (s[:n_components] ** 2) / max(len(x) - 1, 1)
    return proj, comps, explained


def project_embeddings(
    image_embeddings: np.ndarray,
    text_embeddings: np.ndarray,
    method: str = "pca",
    n_components: int = 2,
    normalize: bool = False,
    seed: int = 0,
) -> dict:
    """Joint projection of both modalities (cardelph_projection.py methods dispatch):
    method in {'pca', 'pca-norm', 'umap'}. Returns {'image': [N,k], 'text': [M,k],
    'pairs': [(i, j)], 'method': ...} where pairs link index i of image to j of text
    (identity pairing up to min(N, M), matching the COCO/LAION paired sets)."""
    img = np.asarray(image_embeddings, np.float64)
    txt = np.asarray(text_embeddings, np.float64)
    if normalize or method == "pca-norm":
        img = img / np.maximum(np.linalg.norm(img, axis=1, keepdims=True), 1e-12)
        txt = txt / np.maximum(np.linalg.norm(txt, axis=1, keepdims=True), 1e-12)
    both = np.concatenate([img, txt], axis=0)

    if method in ("pca", "pca-norm"):
        proj, _, _ = pca_projection(both, n_components)
    elif method == "umap":
        try:
            import umap
        except ImportError as e:
            raise RuntimeError("umap-learn not installed in this image") from e
        proj = umap.UMAP(n_components=n_components, random_state=seed).fit_transform(both)
    else:
        raise ValueError(f"unknown projection method {method!r}")

    n = img.shape[0]
    return {
        "image": proj[:n],
        "text": proj[n:],
        "pairs": [(i, i) for i in range(min(n, txt.shape[0]))],
        "method": method,
    }
