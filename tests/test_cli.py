"""End-to-end CLI: synthetic train loop, checkpoint/resume, params.txt, results.jsonl.

Counterpart of the reference's synthetic-backend train-loop exercise (main/data.py:582-608 +
run.py:276): the full orchestration runs with no data and no network."""

import json
import os

import numpy as np
import pytest

from multimodal_tpu.train.run import evaluate, main


BASE = [
    "--dataset-type", "synthetic", "--model", "tiny-test", "--batch-size", "16",
    "--train-num-samples", "48", "--warmup", "2", "--lr", "1e-3",
    "--log-every-n-steps", "2", "--save-frequency", "1", "--seed", "3",
]


def test_cli_train_checkpoint_resume(tmp_path):
    logs = str(tmp_path)
    assert main(BASE + ["--epochs", "1", "--logs", logs, "--name", "exp"]) == 0

    exp = os.path.join(logs, "exp")
    assert os.path.exists(os.path.join(exp, "params.txt"))
    records = [json.loads(l) for l in open(os.path.join(exp, "results.jsonl"))]
    assert records and np.isfinite(records[-1]["loss"])
    assert records[-1]["samples_per_s"] > 0

    # resume continues from the saved step instead of restarting
    assert main(BASE + ["--epochs", "2", "--logs", logs, "--name", "exp",
                        "--resume", "latest"]) == 0
    records2 = [json.loads(l) for l in open(os.path.join(exp, "results.jsonl"))]
    assert records2[-1]["step"] > records[-1]["step"]
    assert records2[-1]["epoch"] == 1


def test_cli_vclip_with_kl_annealing(tmp_path):
    rc = main(BASE + [
        "--epochs", "1", "--logs", str(tmp_path), "--name", "v",
        "--variational", "--kl-warmup-epochs", "2", "--mc-samples", "4",
    ])
    assert rc == 0
    records = [json.loads(l) for l in open(tmp_path / "v" / "results.jsonl")]
    assert np.isfinite(records[-1]["loss"])
    assert "mean_image_concentration" in records[-1]


def test_cli_reference_recipe_flags_accepted(tmp_path):
    """The reference shell recipes' flags (train_alignCLIP.sh) must parse and run."""
    rc = main(BASE + [
        "--epochs", "1", "--logs", str(tmp_path), "--name", "a",
        "--clip-inModality-loss", "--alpha", "1", "--beta", "0.5",
        "--local-loss", "--gather-with-grad", "--horovod", "--ddp-static-graph",
    ])
    assert rc == 0
    params_txt = (tmp_path / "a" / "params.txt").read_text()
    assert "loss: align" in params_txt


def test_evaluate_clip_metrics():
    import jax.numpy as jnp

    from multimodal_tpu.data import DataInfo, SyntheticBatches
    from multimodal_tpu.models import create_model, init_params

    model = create_model("tiny-test")
    params = init_params(model)
    src = SyntheticBatches(batch_size=8, num_samples=16, image_size=model.cfg.vision.image_size,
                           context_length=model.cfg.text.context_length,
                           vocab_size=model.cfg.text.vocab_size)

    class Args:
        pass

    metrics = evaluate(model, params, DataInfo(src), None, epoch=0, args=Args())
    assert "image_to_text_R@1" in metrics and "text_to_image_mean_rank" in metrics
    assert np.isfinite(metrics["val_loss"])
    # uniformity + modality-gap probes (metrics.ipynb cells 25-26)
    assert 0.0 < metrics["knn_angle_image"] < 180.0
    assert 0.0 <= metrics["modality_separability"] <= 1.0


def test_evaluate_variational_uses_means():
    import jax.numpy as jnp

    from multimodal_tpu.data import DataInfo, SyntheticBatches
    from multimodal_tpu.models import create_model, init_params

    model = create_model("tiny-test", variational=True)
    params = init_params(model)
    src = SyntheticBatches(batch_size=8, num_samples=16,
                           image_size=model.cfg.vision.image_size,
                           context_length=model.cfg.text.context_length,
                           vocab_size=model.cfg.text.vocab_size)

    class Args:
        pass

    metrics = evaluate(model, params, DataInfo(src), None, epoch=0, args=Args())
    assert "image_to_text_R@1" in metrics and np.isfinite(metrics["val_loss"])
