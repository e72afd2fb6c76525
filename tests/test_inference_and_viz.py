"""Embedder serving API, the mixture-fitting CLI, and the research figure writers."""

import io
import json
import os

import numpy as np
import pytest
from PIL import Image

from multimodal_tpu.inference import Embedder
from multimodal_tpu.models import add_model_config, create_model, init_params
from multimodal_tpu.research.fit_mixture import main as fit_main

# full CLIP vocab: real tokenizer ids must be in range (nn.Embed's take(mode='fill')
# returns NaN for out-of-vocab ids — tiny vocab configs only take synthetic tokens)
add_model_config(
    "tiny-fullvocab",
    {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 32, "patch_size": 16, "width": 64, "layers": 2, "heads": 2},
        "text_cfg": {"context_length": 16, "vocab_size": 49408, "width": 64, "layers": 2,
                     "heads": 2},
    },
)


@pytest.fixture(scope="module")
def embedder():
    model = create_model("tiny-fullvocab")
    return Embedder(model, init_params(model), batch_size=4)


def test_embed_texts_padding_and_norm(embedder):
    out = embedder.embed_texts(["a cat", "a dog", "three words here", "x", "y"])  # 5 > batch 4
    assert out.shape == (5, embedder.model.cfg.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-4)
    # determinism: same text same embedding regardless of batch position
    again = embedder.embed_texts(["y"])
    np.testing.assert_allclose(again[0], out[4], atol=1e-5)


def test_embed_image_bytes_with_failure(embedder):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG")
    emb, ok = embedder.embed_image_bytes(
        [buf.getvalue(), b"corrupt"], image_size=embedder.model.cfg.vision.image_size
    )
    assert list(ok) == [True, False]
    assert np.linalg.norm(emb[0]) > 0.9
    assert np.linalg.norm(emb[1]) == 0.0


def test_fit_mixture_cli_synthetic(tmp_path):
    out = tmp_path / "res.json"
    rc = fit_main(["--synthetic", "300", "--dim", "16", "--components", "3",
                   "--output", str(out), "--max-iter", "50"])
    assert rc == 0
    res = json.loads(out.read_text())
    assert len(res["model"]["weights"]) == 3
    assert res["test_perplexity"] > 0
    assert res["model"]["converged"]


def test_visualization_writers(tmp_path):
    from multimodal_tpu.research import fit_von_mises_fisher_mixture
    from multimodal_tpu.research.loss_bench import run_loss_bench
    from multimodal_tpu.research.visualization import (
        plot_convergence,
        plot_mixture_summary,
        plot_modality_gap,
        plot_training_metrics,
    )

    rng = np.random.default_rng(0)
    x = np.concatenate([rng.normal([3, 0, 0], 0.3, (80, 3)), rng.normal([0, 3, 0], 0.3, (80, 3))])
    em = fit_von_mises_fisher_mixture(x, 2, max_iter=20)
    p1 = plot_mixture_summary(em, str(tmp_path / "mix.png"))
    p2 = plot_convergence(em.log_likelihoods_, str(tmp_path / "conv.png"))
    p3 = plot_modality_gap(rng.normal(size=(30, 8)), rng.normal(size=(30, 8)),
                           out_path=str(tmp_path / "gap.png"))
    res = run_loss_bench("power_spherical", steps=20, keep_history=True)
    p4 = plot_training_metrics(res.history, str(tmp_path / "tm.png"))
    for p in (p1, p2, p3, p4):
        assert os.path.getsize(p) > 5000  # a real rendered figure, not an empty file


def test_visualize_mixture_model_full_suite(tmp_path):
    """The complete reference figure suite (papers-1-and-2/visualization.py:452-540)
    renders from a fitted mixture: parameters, PCA-2D, 3-D, similarity, assignments,
    entropies, comprehensive, convergence."""
    from multimodal_tpu.research import fit_von_mises_fisher_mixture
    from multimodal_tpu.research.visualization import visualize_mixture_model

    rng = np.random.default_rng(1)
    x = np.concatenate([
        rng.normal([3, 0, 0, 0], 0.3, (60, 4)),
        rng.normal([0, 3, 0, 0], 0.3, (60, 4)),
        rng.normal([0, 0, 3, 0], 0.3, (60, 4)),
    ])
    x = x / np.linalg.norm(x, axis=-1, keepdims=True)
    em = fit_von_mises_fisher_mixture(x, 3, max_iter=30)
    paths = visualize_mixture_model(em, x, output_dir=str(tmp_path / "viz"))
    names = {os.path.basename(p) for p in paths}
    assert names == {
        "component_parameters.png", "mean_directions_2d_pca.png",
        "similarity_matrix.png", "component_entropies.png",
        "comprehensive_visualization.png", "mean_directions_3d.png",
        "data_assignments.png", "convergence.png",
    }
    for p in paths:
        assert os.path.getsize(p) > 5000, p
