"""Image pipeline tests (reference Datasets/preProcess.py:17-25, align_clip/transform.py)."""

import io

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

from multimodal_tpu.data.preprocess import (
    IMAGE_SIZE,
    OPENAI_DATASET_MEAN,
    OPENAI_DATASET_STD,
    eval_transform,
    normalize_images,
    preprocess_bytes,
    train_transform,
)
from multimodal_tpu.data.synthetic import SyntheticDataset


def _test_img(w=640, h=480):
    rng = np.random.default_rng(0)
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8), "RGB")


def test_eval_transform_shape_and_stats():
    arr = eval_transform(_test_img())
    assert arr.shape == (IMAGE_SIZE, IMAGE_SIZE, 3)
    assert arr.dtype == np.float32
    # uniform-noise image: after normalization mean ~ (0.5 - mean)/std
    expected = (0.5 - np.asarray(OPENAI_DATASET_MEAN)) / np.asarray(OPENAI_DATASET_STD)
    np.testing.assert_allclose(arr.mean(axis=(0, 1)), expected, atol=0.05)


def test_eval_transform_grayscale_and_small():
    gray = Image.fromarray(np.full((50, 40), 128, np.uint8), "L")
    arr = eval_transform(gray)
    assert arr.shape == (IMAGE_SIZE, IMAGE_SIZE, 3)


def test_train_transform_random_but_valid():
    rng = np.random.default_rng(1)
    a = train_transform(_test_img(), rng)
    b = train_transform(_test_img(), rng)
    assert a.shape == b.shape == (IMAGE_SIZE, IMAGE_SIZE, 3)
    assert not np.allclose(a, b)  # different random crops


def test_normalize_images_matches_host():
    img = np.random.default_rng(2).integers(0, 255, (2, 8, 8, 3), dtype=np.uint8)
    dev = np.asarray(normalize_images(img))
    host = (img.astype(np.float32) / 255.0 - np.asarray(OPENAI_DATASET_MEAN, np.float32)) / np.asarray(
        OPENAI_DATASET_STD, np.float32
    )
    np.testing.assert_allclose(dev, host, rtol=1e-6)


def test_preprocess_bytes_jpeg():
    buf = io.BytesIO()
    _test_img(300, 200).save(buf, format="JPEG")
    arr = preprocess_bytes(buf.getvalue())
    assert arr.shape == (IMAGE_SIZE, IMAGE_SIZE, 3)


def test_synthetic_dataset():
    ds = SyntheticDataset(num_samples=10)
    assert len(ds) == 10
    item = ds[0]
    assert item["image"].shape == (IMAGE_SIZE, IMAGE_SIZE, 3)
    assert item["text"].shape == (77,)
    batches = list(ds.batches(batch_size=4))
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, IMAGE_SIZE, IMAGE_SIZE, 3)
    assert batches[0]["text"].dtype == np.int32
