"""Semantic supervision side-input: hashing encoder structure, batch wiring, and the
full align-loss CLI run with NL semantic supervision enabled."""

import numpy as np

from multimodal_tpu.data.semantic import HashingSemanticEncoder, make_semantic_encoder
from multimodal_tpu.data.synthetic import SyntheticBatches


def test_hashing_encoder_similarity_structure():
    enc = HashingSemanticEncoder(dim=256)
    out = enc([
        "a photo of a red panda",
        "a picture of a red panda",
        "quarterly financial report",
    ])
    assert out.shape == (3, 256)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)
    sim_related = out[0] @ out[1]
    sim_unrelated = out[0] @ out[2]
    assert sim_related > 0.3 > sim_unrelated


def test_hashing_encoder_deterministic():
    a = HashingSemanticEncoder(dim=128)(["hello world"])
    b = HashingSemanticEncoder(dim=128)(["hello world"])
    np.testing.assert_array_equal(a, b)


def test_make_encoder_falls_back():
    enc = make_semantic_encoder("/nonexistent/model/path")
    assert isinstance(enc, HashingSemanticEncoder)


def test_synthetic_with_semantic_field():
    src = SyntheticBatches(batch_size=4, num_samples=8, image_size=16, with_semantic=64)
    batch = next(iter(src))
    assert batch["semantic"].shape == (4, 64)
    np.testing.assert_allclose(np.linalg.norm(batch["semantic"], axis=1), 1.0, atol=1e-5)


def test_cli_align_with_semantic_supervision(tmp_path):
    from multimodal_tpu.train.run import main

    rc = main([
        "--dataset-type", "synthetic", "--model", "tiny-test", "--batch-size", "16",
        "--train-num-samples", "32", "--epochs", "1", "--warmup", "2", "--lr", "1e-3",
        "--logs", str(tmp_path), "--name", "sem", "--log-every-n-steps", "1",
        "--clip-inModality-loss", "--nl_semantic_supervision", "--beta", "0.5",
    ])
    assert rc == 0
    import json

    records = [json.loads(l) for l in open(tmp_path / "sem" / "results.jsonl")]
    assert np.isfinite(records[-1]["loss"])
    assert "inModality_loss" in records[-1]
