"""CLIP image preprocessing — host-side decode/geometry, device-side normalize.

Counterpart of reference Datasets/preProcess.py:17-25 (eval: bicubic resize -> center crop ->
RGB -> scale -> normalize with the OpenAI constants) and AlignCLIP/align_clip/transform.py
(train: RandomResizedCrop(scale=(0.9,1.0), bicubic) :108-117; eval Resize+CenterCrop :127-131).

TPU-first layout decisions:
  * images are channels-last ``[H, W, 3]`` float32/uint8 (XLA's preferred conv layout), not
    the reference's torchvision CHW;
  * normalization is exposed both host-side and as ``normalize_images`` for fusion into the
    on-device input prolog (keep uint8 on the host/ICI path, normalize in the first XLA op).
"""

from __future__ import annotations

import io

import numpy as np

try:
    from PIL import Image

    _HAS_PIL = True
except ImportError:  # pragma: no cover - PIL is in the image
    _HAS_PIL = False

# OpenAI CLIP dataset statistics (reference Datasets/preProcess.py:23-24,
# align_clip/constants.py:1-2)
OPENAI_DATASET_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_DATASET_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGE_SIZE = 224


def normalize_images(x, mean=OPENAI_DATASET_MEAN, std=OPENAI_DATASET_STD):
    """Scale uint8/float images to normalized float32. Pure jnp/np — jit-fusable prolog."""
    import jax.numpy as jnp

    x = jnp.asarray(x)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std


def _to_rgb(img):
    return img.convert("RGB") if img.mode != "RGB" else img


def _resize_shorter(img, size: int):
    w, h = img.size
    scale = size / min(w, h)
    new_w, new_h = max(round(w * scale), size), max(round(h * scale), size)
    return img.resize((new_w, new_h), Image.BICUBIC)


def _center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    h, w = arr.shape[:2]
    top = (h - size) // 2
    left = (w - size) // 2
    return arr[top : top + size, left : left + size]


def resize_max_size(img, max_size: int, fill: int = 0):
    """Letterbox transform (align_clip/transform.py:29-53 ResizeMaxSize): scale so the longer
    side equals ``max_size`` (bicubic), then center-pad to a ``max_size`` square with ``fill``.
    Returns a PIL image; preserves aspect ratio instead of cropping."""
    w, h = img.size
    scale = max_size / float(max(w, h))
    if scale == 1.0:
        return img
    new_w, new_h = round(w * scale), round(h * scale)
    img = img.resize((new_w, new_h), Image.BICUBIC)
    canvas = Image.new(img.mode, (max_size, max_size), fill)
    canvas.paste(img, ((max_size - new_w) // 2, (max_size - new_h) // 2))
    return canvas


def eval_transform(img, image_size: int = IMAGE_SIZE, normalize: bool = True) -> np.ndarray:
    """Resize(shorter side, bicubic) -> CenterCrop -> RGB -> [0,1] -> normalize; HWC f32."""
    img = _to_rgb(_resize_shorter(img, image_size))
    arr = _center_crop(np.asarray(img, dtype=np.float32) / 255.0, image_size)
    if normalize:
        arr = (arr - np.asarray(OPENAI_DATASET_MEAN, np.float32)) / np.asarray(
            OPENAI_DATASET_STD, np.float32
        )
    return arr


def train_transform(
    img,
    rng: np.random.Generator,
    image_size: int = IMAGE_SIZE,
    scale=(0.9, 1.0),
    ratio=(3.0 / 4.0, 4.0 / 3.0),
    normalize: bool = True,
) -> np.ndarray:
    """RandomResizedCrop(scale, ratio, bicubic) -> RGB -> [0,1] -> normalize; HWC f32.

    Same sampling procedure as torchvision's RandomResizedCrop (used by reference
    transform.py:108-117): 10 attempts at area/log-ratio sampling, fallback to center crop.
    """
    img = _to_rgb(img)
    w, h = img.size
    area = w * h
    log_ratio = (np.log(ratio[0]), np.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = np.exp(rng.uniform(log_ratio[0], log_ratio[1]))
        cw = int(round(np.sqrt(target_area * aspect)))
        ch = int(round(np.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            left = int(rng.integers(0, w - cw + 1))
            top = int(rng.integers(0, h - ch + 1))
            crop = img.crop((left, top, left + cw, top + ch))
            break
    else:  # fallback: central crop at the clamped aspect
        in_ratio = w / h
        if in_ratio < ratio[0]:
            cw, ch = w, int(round(w / ratio[0]))
        elif in_ratio > ratio[1]:
            cw, ch = int(round(h * ratio[1])), h
        else:
            cw, ch = w, h
        left, top = (w - cw) // 2, (h - ch) // 2
        crop = img.crop((left, top, left + cw, top + ch))
    arr = np.asarray(crop.resize((image_size, image_size), Image.BICUBIC), np.float32) / 255.0
    if normalize:
        arr = (arr - np.asarray(OPENAI_DATASET_MEAN, np.float32)) / np.asarray(
            OPENAI_DATASET_STD, np.float32
        )
    return arr


def decode_image(data: bytes):
    """JPEG/PNG bytes -> PIL image (the host decode stage of the input pipeline)."""
    return Image.open(io.BytesIO(data))


def preprocess_bytes(
    data: bytes,
    train: bool = False,
    rng=None,
    image_size: int = IMAGE_SIZE,
    scale=(0.9, 1.0),
    ratio=(3.0 / 4.0, 4.0 / 3.0),
):
    img = decode_image(data)
    if train:
        return train_transform(
            img, rng or np.random.default_rng(), image_size, scale=scale, ratio=ratio
        )
    return eval_transform(img, image_size)
