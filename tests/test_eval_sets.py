"""Native-format eval-set loaders against synthetic stock-layout fixtures: CIFAR pickle
batches, Food-101, Flowers-102 .mat, Stanford Cars devkit, and the ImageNet-C CLI branch
(reference main/data.py:123-257 + main/zero_shot.py:118-120)."""

import os
import pickle

import numpy as np
import pytest

from multimodal_tpu.data.eval_sets import (
    cifar_batches,
    flowers102,
    food101,
    open_eval_dataset,
    stanford_cars,
)


def _png(path, rgb, size=(40, 40)):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.new("RGB", size, rgb).save(path)


# ---------------------------------------------------------------- CIFAR fixtures


@pytest.fixture
def cifar10_root(tmp_path):
    d = tmp_path / "cifar-10-batches-py"
    d.mkdir()
    rng = np.random.default_rng(0)
    data = rng.integers(0, 255, (20, 3072), dtype=np.uint8)
    labels = list(rng.integers(0, 10, 20))
    with open(d / "test_batch", "wb") as f:
        pickle.dump({"data": data, "labels": labels}, f)
    with open(d / "data_batch_1", "wb") as f:
        pickle.dump({"data": data[:10], "labels": labels[:10]}, f)
    for i in range(2, 6):
        with open(d / f"data_batch_{i}", "wb") as f:
            pickle.dump({"data": data[:2], "labels": labels[:2]}, f)
    with open(d / "batches.meta", "wb") as f:
        pickle.dump({"label_names": [f"class{i}" for i in range(10)]}, f)
    return str(tmp_path), data, labels


def test_cifar10_pickle_batches(cifar10_root):
    root, data, labels = cifar10_root
    ds = cifar_batches(root, "10", "test", batch_size=8, image_size=32)
    assert len(ds) == 20 and len(ds.classes) == 10
    batches = list(ds)
    images = np.concatenate([b[0] for b in batches])
    got_labels = np.concatenate([b[1] for b in batches])
    assert images.shape == (20, 32, 32, 3) and images.dtype == np.uint8
    np.testing.assert_array_equal(got_labels, np.asarray(labels, np.int32))
    # row 0 is the R/G/B-plane layout of image 0; at image_size==32 no resampling happens
    np.testing.assert_array_equal(
        images[0], data[0].reshape(3, 32, 32).transpose(1, 2, 0)
    )


def test_cifar10_resizes_to_model_size(cifar10_root):
    root, _, _ = cifar10_root
    ds = cifar_batches(root, "10", "test", batch_size=32, image_size=64)
    images, _ = next(iter(ds))
    assert images.shape == (20, 64, 64, 3)


def test_cifar100_layout(tmp_path):
    d = tmp_path / "cifar-100-python"
    d.mkdir()
    rng = np.random.default_rng(1)
    data = rng.integers(0, 255, (6, 3072), dtype=np.uint8)
    with open(d / "test", "wb") as f:
        pickle.dump({"data": data, "fine_labels": [0, 5, 99, 1, 2, 3]}, f)
    with open(d / "meta", "wb") as f:
        pickle.dump({"fine_label_names": [f"f{i}" for i in range(100)]}, f)
    ds = cifar_batches(str(tmp_path), "100", "test", batch_size=4, image_size=32)
    assert len(ds.classes) == 100
    labels = np.concatenate([l for _, l in ds])
    np.testing.assert_array_equal(labels, [0, 5, 99, 1, 2, 3])


# ---------------------------------------------------------------- Food-101


def test_food101_layout(tmp_path):
    d = tmp_path / "food-101"
    (d / "meta").mkdir(parents=True)
    classes = ["apple_pie", "baby_back_ribs", "waffles"]
    (d / "meta" / "classes.txt").write_text("\n".join(classes) + "\n")
    rel = ["apple_pie/1", "waffles/2", "waffles/3"]
    (d / "meta" / "test.txt").write_text("\n".join(rel) + "\n")
    for r, color in zip(rel, [(255, 0, 0), (0, 255, 0), (0, 0, 255)]):
        _png(str(d / "images" / (r + ".jpg")), color)
    ds = food101(str(tmp_path), "test", batch_size=2, image_size=32)
    assert ds.classes == ["apple pie", "baby back ribs", "waffles"]
    labels = np.concatenate([l for _, l in ds])
    np.testing.assert_array_equal(labels, [0, 2, 2])
    images = np.concatenate([im for im, _ in ds])
    assert images.shape == (3, 32, 32, 3)
    assert images[0, 0, 0, 0] > 200  # red image decoded


# ---------------------------------------------------------------- Flowers-102


def test_flowers102_mat_layout(tmp_path):
    from scipy.io import savemat

    d = tmp_path / "flowers-102"
    (d / "jpg").mkdir(parents=True)
    labels = np.arange(1, 9)  # images 1..8 -> classes 1..8 (1-indexed)
    savemat(str(d / "imagelabels.mat"), {"labels": labels[None, :]})
    savemat(str(d / "setid.mat"), {
        "trnid": np.array([[1, 2]]), "valid": np.array([[3, 4]]),
        "tstid": np.array([[5, 6, 7, 8]]),
    })
    for i in range(1, 9):
        _png(str(d / "jpg" / f"image_{i:05d}.jpg"), (i * 20, 0, 0))
    ds = flowers102(str(tmp_path), "test", batch_size=3, image_size=32)
    assert len(ds) == 4 and len(ds.classes) == 102
    labels_got = np.concatenate([l for _, l in ds])
    np.testing.assert_array_equal(labels_got, [4, 5, 6, 7])  # 0-indexed


# ---------------------------------------------------------------- Stanford Cars


def test_stanford_cars_mat_layout(tmp_path):
    from scipy.io import savemat

    d = tmp_path / "stanford_cars"
    (d / "cars_test").mkdir(parents=True)
    (d / "devkit").mkdir()
    fnames = ["00001.jpg", "00002.jpg"]
    annos = np.array(
        [(np.array([f]), np.array([[c]])) for f, c in zip(fnames, [3, 196])],
        dtype=[("fname", "O"), ("class", "O")],
    )
    savemat(str(d / "cars_test_annos_withlabels.mat"), {"annotations": annos[None, :]})
    savemat(str(d / "devkit" / "cars_meta.mat"),
            {"class_names": np.array([np.array([f"car {i}"]) for i in range(1, 197)],
                                     dtype="O")[None, :]})
    for f in fnames:
        _png(str(d / "cars_test" / f), (10, 10, 10))
    ds = stanford_cars(str(tmp_path), "test", batch_size=4, image_size=32)
    assert len(ds.classes) == 196 and ds.classes[0] == "car 1"
    labels = np.concatenate([l for _, l in ds])
    np.testing.assert_array_equal(labels, [2, 195])


# ---------------------------------------------------------------- dispatch


def test_open_eval_dataset_dispatch(cifar10_root, tmp_path):
    root, _, _ = cifar10_root
    ds = open_eval_dataset("cifar10", root, batch_size=8, image_size=32)
    assert type(ds).__name__ == "ArrayEvalDataset"
    # a folder-per-class layout falls back to LabeledImageFolder
    folder = tmp_path / "folders"
    for cls in ["a", "b"]:
        _png(str(folder / cls / "x.jpg"), (0, 0, 0))
    ds2 = open_eval_dataset("cifar10", str(folder), batch_size=8, image_size=32)
    assert type(ds2).__name__ == "LabeledImageFolder"


def test_imagenet_c_cli_dispatch(tmp_path, monkeypatch):
    """--imagenet-c points at a severity folder (folder-per-class, as the reference's
    ImageFolder branch) and flows through zero_shot_eval_all."""
    import jax

    from multimodal_tpu.models import create_model, init_params
    from multimodal_tpu.train.params import parse_args
    from multimodal_tpu.train.run import ZERO_SHOT_DATASETS, zero_shot_eval_all

    assert "imagenet_c" in ZERO_SHOT_DATASETS

    root = tmp_path / "gaussian_noise" / "3"
    for cls, color in [("goldfish", (255, 120, 0)), ("tench", (0, 120, 255))]:
        for i in range(2):
            _png(str(root / cls / f"{i}.jpg"), color)

    args = parse_args([
        "--dataset-type", "synthetic", "--model", "tiny-test", "--batch-size", "4",
        "--imagenet-c", str(root),
    ])
    model = create_model("tiny-test")
    params = init_params(model, jax.random.PRNGKey(0))
    results = zero_shot_eval_all(model, params, args)
    assert "imagenet_c-zeroshot-top1" in results
    assert 0.0 <= results["imagenet_c-zeroshot-top1"] <= 1.0
