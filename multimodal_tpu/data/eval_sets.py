"""Native-format eval-set loaders: the stock on-disk layouts of the reference's zero-shot /
linear-probe benchmarks, read directly — no torchvision, no out-of-band conversion.

Counterpart of reference AlignCLIP/main/data.py:123-257 (get_imagenet/get_cifar/get_flowers/
get_food/get_stanford build torchvision datasets): the same archives those classes consume
are parsed here with numpy/PIL/scipy and batched into the repo's eval wire format —
(uint8 images [B, S, S, 3], int32 labels [B]) with a ``.classes`` list — identical to
``LabeledImageFolder``, so every consumer (zero-shot, linear probe) takes either.

Formats:
  * CIFAR-10/100 — the python pickle batches (``cifar-10-batches-py/test_batch``,
    ``cifar-100-python/test``) with R/G/B-plane rows;
  * Food-101 — ``images/<class>/<id>.jpg`` + ``meta/{classes,test,train}.txt``;
  * Flowers-102 — ``jpg/image_XXXXX.jpg`` + ``imagelabels.mat`` + ``setid.mat``;
  * Stanford Cars — ``cars_test/`` + ``cars_test_annos_withlabels.mat`` (+ devkit
    ``cars_meta.mat`` for display names when present).
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np

from multimodal_tpu.data import preprocess
from multimodal_tpu.data.wds import decode_images


class FileEvalDataset:
    """(path, label) items -> (uint8 [B,S,S,3], int32 [B]) batches; LabeledImageFolder's
    protocol with an explicit item list and class table."""

    def __init__(self, items, classes, *, batch_size: int,
                 image_size: int = preprocess.IMAGE_SIZE, limit: Optional[int] = None):
        self.items = items[:limit] if limit else items
        self.classes = list(classes)
        self.batch_size = batch_size
        self.image_size = image_size

    def __len__(self):
        return len(self.items)

    def __iter__(self):
        rng = np.random.default_rng(0)
        for start in range(0, len(self.items), self.batch_size):
            chunk = self.items[start : start + self.batch_size]
            buffers = []
            for p, _ in chunk:
                try:
                    with open(p, "rb") as f:
                        buffers.append(f.read())
                except OSError:
                    buffers.append(b"")
            arr, ok = decode_images(buffers, self.image_size, train=False, rng=rng)
            labels = np.asarray([l for _, l in chunk], np.int32)
            if not ok.all():  # drop undecodable eval images (labels matter, no backfill)
                arr, labels = arr[ok], labels[ok]
            if len(labels):
                yield arr, labels


class ArrayEvalDataset:
    """In-memory uint8 [N,H,W,3] images + labels, resized per batch with the eval
    transform (bicubic shorter-side resize + center crop, preProcess.py:17-25)."""

    def __init__(self, images: np.ndarray, labels: np.ndarray, classes, *,
                 batch_size: int, image_size: int = preprocess.IMAGE_SIZE,
                 limit: Optional[int] = None):
        if limit:
            images, labels = images[:limit], labels[:limit]
        self.images = images
        self.labels = np.asarray(labels, np.int32)
        self.classes = list(classes)
        self.batch_size = batch_size
        self.image_size = image_size

    def __len__(self):
        return len(self.images)

    def __iter__(self):
        from PIL import Image

        s = self.image_size
        for start in range(0, len(self.images), self.batch_size):
            chunk = self.images[start : start + self.batch_size]
            out = np.empty((len(chunk), s, s, 3), np.uint8)
            for i, arr in enumerate(chunk):
                img = preprocess._resize_shorter(Image.fromarray(arr), s)
                out[i] = preprocess._center_crop(np.asarray(img, np.uint8), s)
            yield out, self.labels[start : start + len(chunk)]


def _find_dir(root: str, name: str) -> str:
    """root may be the directory itself or its parent (torchvision's root convention)."""
    if os.path.basename(os.path.normpath(root)) == name:
        return root
    cand = os.path.join(root, name)
    return cand if os.path.isdir(cand) else root


def _unpickle(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f, encoding="latin1")


def cifar_batches(root: str, version: str = "10", split: str = "test", *,
                  batch_size: int, image_size: int = preprocess.IMAGE_SIZE,
                  limit: Optional[int] = None) -> ArrayEvalDataset:
    """Stock CIFAR python-pickle batches (the exact files torchvision's CIFAR10/CIFAR100
    read, main/data.py:237-257): rows are 3072 uint8 as R/G/B 32x32 planes."""
    if version == "10":
        d = _find_dir(root, "cifar-10-batches-py")
        files = [f"data_batch_{i}" for i in range(1, 6)] if split == "train" else ["test_batch"]
        label_key, meta_file, names_key = "labels", "batches.meta", "label_names"
    elif version == "100":
        d = _find_dir(root, "cifar-100-python")
        files = ["train"] if split == "train" else ["test"]
        label_key, meta_file, names_key = "fine_labels", "meta", "fine_label_names"
    else:
        raise ValueError(version)
    data, labels = [], []
    for fn in files:
        batch = _unpickle(os.path.join(d, fn))
        data.append(np.asarray(batch["data"], np.uint8))
        labels.extend(batch[label_key])
    images = np.concatenate(data).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    classes = _unpickle(os.path.join(d, meta_file))[names_key]
    return ArrayEvalDataset(images, np.asarray(labels), classes,
                            batch_size=batch_size, image_size=image_size, limit=limit)


def food101(root: str, split: str = "test", *, batch_size: int,
            image_size: int = preprocess.IMAGE_SIZE,
            limit: Optional[int] = None) -> FileEvalDataset:
    """Food-101 archive layout: images/<class>/<id>.jpg + meta/{classes,test,train}.txt."""
    d = _find_dir(root, "food-101")
    with open(os.path.join(d, "meta", "classes.txt")) as f:
        classes = [l.strip() for l in f if l.strip()]
    index = {c: i for i, c in enumerate(classes)}
    items = []
    with open(os.path.join(d, "meta", f"{split}.txt")) as f:
        for line in f:
            rel = line.strip()
            if not rel:
                continue
            cls = rel.split("/", 1)[0]
            items.append((os.path.join(d, "images", rel + ".jpg"), index[cls]))
    display = [c.replace("_", " ") for c in classes]
    return FileEvalDataset(items, display, batch_size=batch_size,
                           image_size=image_size, limit=limit)


def flowers102(root: str, split: str = "test", *, batch_size: int,
               image_size: int = preprocess.IMAGE_SIZE,
               limit: Optional[int] = None) -> FileEvalDataset:
    """Flowers-102 archive layout: jpg/image_%05d.jpg + imagelabels.mat + setid.mat
    (1-indexed ids and labels, as torchvision's Flowers102 reads them)."""
    from scipy.io import loadmat

    d = _find_dir(root, "flowers-102")
    labels = loadmat(os.path.join(d, "imagelabels.mat"))["labels"].ravel()  # 1..102
    setid = loadmat(os.path.join(d, "setid.mat"))
    ids = setid[{"train": "trnid", "val": "valid", "test": "tstid"}[split]].ravel()
    items = [
        (os.path.join(d, "jpg", f"image_{i:05d}.jpg"), int(labels[i - 1]) - 1) for i in ids
    ]
    try:
        from multimodal_tpu.eval.metadata import classnames

        classes = classnames("flowers102")
    except KeyError:  # pragma: no cover - table ships in-repo
        classes = [str(i) for i in range(102)]
    return FileEvalDataset(items, classes, batch_size=batch_size,
                           image_size=image_size, limit=limit)


def stanford_cars(root: str, split: str = "test", *, batch_size: int,
                  image_size: int = preprocess.IMAGE_SIZE,
                  limit: Optional[int] = None) -> FileEvalDataset:
    """Stanford Cars devkit layout: cars_{split}/ + the annos .mat (fields fname + class,
    1-indexed) + devkit/cars_meta.mat class names when present."""
    from scipy.io import loadmat

    d = _find_dir(root, "stanford_cars")
    if split == "test":
        annos_path = os.path.join(d, "cars_test_annos_withlabels.mat")
        img_dir = os.path.join(d, "cars_test")
    else:
        annos_path = os.path.join(d, "devkit", "cars_train_annos.mat")
        img_dir = os.path.join(d, "cars_train")
    annos = loadmat(annos_path)["annotations"].ravel()
    items = [(os.path.join(img_dir, str(a["fname"].item())), int(a["class"].item()) - 1)
             for a in annos]
    meta = os.path.join(d, "devkit", "cars_meta.mat")
    if os.path.exists(meta):
        classes = [str(c.item()) for c in loadmat(meta)["class_names"].ravel()]
    else:
        try:
            from multimodal_tpu.eval.metadata import classnames

            classes = classnames("stanford-cars")
        except KeyError:
            classes = [str(i) for i in range(196)]
    return FileEvalDataset(items, classes, batch_size=batch_size,
                           image_size=image_size, limit=limit)


# per-flag stock-layout markers: (dir name torchvision uses, layout-proving relpaths)
_NATIVE_MARKERS = {
    "cifar10": ("cifar-10-batches-py", ("test_batch",)),
    "cifar100": ("cifar-100-python", ("test", "meta")),
    "food": ("food-101", ("meta/classes.txt",)),
    "flowers": ("flowers-102", ("imagelabels.mat", "setid.mat")),
    "stanford_cars": ("stanford_cars", ("cars_test_annos_withlabels.mat",)),
}


def _is_native(flag: str, path: str) -> bool:
    if flag not in _NATIVE_MARKERS:
        return False
    dirname, rels = _NATIVE_MARKERS[flag]
    d = _find_dir(path, dirname)
    return all(os.path.exists(os.path.join(d, *r.split("/"))) for r in rels)


def open_eval_dataset(flag: str, path: str, *, batch_size: int,
                      image_size: int = preprocess.IMAGE_SIZE, split: str = "test",
                      limit: Optional[int] = None):
    """Dispatch an eval-set path to its native-format loader when the stock layout is
    present, else fall back to folder-per-class (LabeledImageFolder). ``flag`` is the CLI
    dataset key (run.py ZERO_SHOT_DATASETS)."""
    kw = dict(batch_size=batch_size, image_size=image_size, limit=limit)
    if _is_native(flag, path):
        if flag == "cifar10":
            return cifar_batches(path, "10", split, **kw)
        if flag == "cifar100":
            return cifar_batches(path, "100", split, **kw)
        if flag == "food":
            return food101(path, split, **kw)
        if flag == "flowers":
            return flowers102(path, "test" if split == "val" else split, **kw)
        if flag == "stanford_cars":
            return stanford_cars(path, split, **kw)
    from multimodal_tpu.data.datasets import LabeledImageFolder

    return LabeledImageFolder(path, batch_size=batch_size, image_size=image_size,
                              limit=limit)
