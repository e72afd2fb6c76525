"""Zero-shot classification end to end through the CLI: folder-per-class eval set,
template-averaged classifier, eval-only mode (--epochs 0)."""

import io
import json
import os

import numpy as np
import pytest
from PIL import Image

from multimodal_tpu.data.datasets import LabeledImageFolder
from multimodal_tpu.train.run import main


@pytest.fixture(scope="module")
def eval_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cifar_like")
    rng = np.random.default_rng(0)
    for cls in ["airplane", "automobile", "bird"]:
        d = root / cls
        d.mkdir()
        for i in range(4):
            arr = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg", quality=90)
    return str(root)


def test_labeled_image_folder(eval_dir):
    ds = LabeledImageFolder(eval_dir, batch_size=5, image_size=32)
    assert ds.classes == ["airplane", "automobile", "bird"]
    assert len(ds) == 12
    images, labels = next(iter(ds))
    assert images.shape == (5, 32, 32, 3) and images.dtype == np.uint8
    assert labels.shape == (5,)
    total = sum(len(l) for _, l in ds)
    assert total == 12


def test_cli_eval_only_zero_shot(eval_dir, tmp_path):
    rc = main([
        "--dataset-type", "synthetic", "--model", "tiny-test", "--batch-size", "6",
        "--epochs", "0", "--logs", str(tmp_path), "--name", "zs",
        "--cifar10", eval_dir,
    ])
    assert rc == 0
    records = [json.loads(l) for l in open(tmp_path / "zs" / "results.jsonl")]
    rec = records[-1]
    assert "cifar10-zeroshot-top1" in rec
    assert 0.0 <= rec["cifar10-zeroshot-top1"] <= 1.0
    # 3 classes, random model: top-1 should be near chance but top5 (clamped to 3) == 1
    assert rec["cifar10-zeroshot-top5"] == 1.0


def test_cli_linear_probe(eval_dir, tmp_path):
    rc = main([
        "--dataset-type", "synthetic", "--model", "tiny-test", "--batch-size", "6",
        "--epochs", "0", "--logs", str(tmp_path), "--name", "lp",
        "--linear-probe-train", eval_dir, "--linear-probe-epochs", "10",
    ])
    assert rc == 0
    records = [json.loads(l) for l in open(tmp_path / "lp" / "results.jsonl")]
    rec = records[-1]
    assert 0.0 <= rec["linear_probe_accuracy"] <= 1.0
    assert "linear_probe_mean_per_class" in rec
