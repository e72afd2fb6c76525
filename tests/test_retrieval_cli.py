"""COCO retrieval through the CLI eval-only path, plus download-module offline behavior."""

import json

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    (root / "val2017").mkdir()
    (root / "annotations").mkdir()
    rng = np.random.default_rng(0)
    images, anns = [], []
    for i in range(5):
        fn = f"{i:012d}.jpg"
        arr = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / "val2017" / fn, quality=90)
        images.append({"id": i, "file_name": fn})
        for j in range(2):  # two captions per image
            anns.append({"image_id": i, "caption": f"photo {i} caption {j}"})
    (root / "annotations" / "captions_val2017.json").write_text(
        json.dumps({"images": images, "annotations": anns})
    )
    return str(root)


def test_cli_eval_only_retrieval(coco_root, tmp_path):
    from multimodal_tpu.train.run import main

    rc = main([
        "--dataset-type", "synthetic", "--model", "tiny-fullvocab-r", "--batch-size", "4",
        "--epochs", "0", "--logs", str(tmp_path), "--name", "ret",
        "--coco-retrieval", coco_root,
    ])
    assert rc == 0
    records = [json.loads(l) for l in open(tmp_path / "ret" / "results.jsonl")]
    rec = records[-1]
    assert "coco_retrieval-text_to_image_R@1" in rec
    assert "coco_retrieval-image_to_text_R@5" in rec
    # 5 images: R@5 must be 1.0 in both directions regardless of model quality
    assert rec["coco_retrieval-text_to_image_R@5"] == 1.0
    assert rec["coco_retrieval-image_to_text_R@5"] == 1.0


def test_download_module_offline_importable():
    """Zero-egress image: module imports, URL builders work, no network at import time."""
    from multimodal_tpu.data.download import CC12M_NUM_SHARDS, cc12m_shard_urls

    urls = cc12m_shard_urls(0, 2)
    assert len(urls) == 3 and urls[0].endswith("cc12m-train-0000.tar")
    assert CC12M_NUM_SHARDS == 1243


# register the full-vocab tiny model used above
from multimodal_tpu.models import add_model_config  # noqa: E402

add_model_config(
    "tiny-fullvocab-r",
    {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 32, "patch_size": 16, "width": 64, "layers": 2, "heads": 2},
        "text_cfg": {"context_length": 16, "vocab_size": 49408, "width": 64, "layers": 2,
                     "heads": 2},
    },
)
