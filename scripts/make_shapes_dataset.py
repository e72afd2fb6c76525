"""Generate the compositional shapes webdataset used by the hardware E2E matrix.

6 colors x 4 shapes x 3 backgrounds = 72 caption classes; images are JPEG-encoded drawings
with randomized geometry/jitter so the mapping is learnable but not trivial. Output is
standard webdataset shards (NNNNNN.jpg + NNNNNN.txt) consumable by data/wds.py:WdsReader —
the dataset behind RESULTS.md "End-to-end training validation" (counterpart of the
reference's notebook sanity datasets, finetune.ipynb).

Usage:
  python scripts/make_shapes_dataset.py --out /tmp/shapes --train 16384 --val 1024 \
      [--holdout-frac 0.33] [--size 128]

--holdout-frac reserves a random subset of the 72 classes for zero-shot eval (those
classes appear only in val); class lists are written to <out>/classes.json.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import tarfile

import numpy as np
from PIL import Image, ImageDraw

COLORS = {
    "red": (220, 40, 40), "green": (40, 190, 60), "blue": (50, 80, 230),
    "yellow": (235, 220, 50), "purple": (160, 60, 200), "orange": (240, 150, 40),
}
SHAPES = ("circle", "square", "triangle", "star")
BACKGROUNDS = {"white": (245, 245, 245), "black": (25, 25, 25), "gray": (128, 128, 128)}


def draw_sample(rng: np.random.Generator, color: str, shape: str, bg: str, size: int):
    img = Image.new("RGB", (size, size), BACKGROUNDS[bg])
    d = ImageDraw.Draw(img)
    c = COLORS[color]
    # jitter the fill so color classification needs more than one pixel
    c = tuple(int(np.clip(v + rng.integers(-25, 25), 0, 255)) for v in c)
    r = int(size * rng.uniform(0.18, 0.34))
    cx = int(rng.uniform(r + 2, size - r - 2))
    cy = int(rng.uniform(r + 2, size - r - 2))
    if shape == "circle":
        d.ellipse([cx - r, cy - r, cx + r, cy + r], fill=c)
    elif shape == "square":
        ang = rng.uniform(0, np.pi / 2)
        pts = [(cx + r * np.cos(ang + k * np.pi / 2), cy + r * np.sin(ang + k * np.pi / 2))
               for k in range(4)]
        d.polygon(pts, fill=c)
    elif shape == "triangle":
        ang = rng.uniform(0, 2 * np.pi)
        pts = [(cx + r * np.cos(ang + k * 2 * np.pi / 3),
                cy + r * np.sin(ang + k * 2 * np.pi / 3)) for k in range(3)]
        d.polygon(pts, fill=c)
    else:  # star
        ang = rng.uniform(0, 2 * np.pi)
        pts = []
        for k in range(10):
            rr = r if k % 2 == 0 else r * 0.45
            pts.append((cx + rr * np.cos(ang + k * np.pi / 5),
                        cy + rr * np.sin(ang + k * np.pi / 5)))
        d.polygon(pts, fill=c)
    # pixel noise so JPEG decode work is realistic
    arr = np.asarray(img, np.int16)
    arr = np.clip(arr + rng.integers(-12, 12, arr.shape), 0, 255).astype(np.uint8)
    return Image.fromarray(arr)


def caption(color: str, shape: str, bg: str) -> str:
    return f"a {color} {shape} on a {bg} background"


def write_split(out_dir, split, n, classes, rng, size, shard_size, quality):
    os.makedirs(out_dir, exist_ok=True)
    n_shards = max(1, (n + shard_size - 1) // shard_size)
    written = 0
    for sh in range(n_shards):
        path = os.path.join(out_dir, f"{split}-{sh:06d}.tar")
        with tarfile.open(path, "w") as tar:
            for i in range(min(shard_size, n - written)):
                color, shape, bg = classes[rng.integers(len(classes))]
                img = draw_sample(rng, color, shape, bg, size)
                buf = io.BytesIO()
                img.save(buf, "JPEG", quality=quality)
                data = buf.getvalue()
                key = f"{split}{sh:04d}{i:06d}"
                cap = caption(color, shape, bg).encode()
                for ext, payload in (("jpg", data), ("txt", cap)):
                    info = tarfile.TarInfo(f"{key}.{ext}")
                    info.size = len(payload)
                    tar.addfile(info, io.BytesIO(payload))
                written += 1
    return n_shards


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--train", type=int, default=16384)
    ap.add_argument("--val", type=int, default=1024)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--holdout-frac", type=float, default=0.33)
    ap.add_argument("--shard-size", type=int, default=4096)
    ap.add_argument("--quality", type=int, default=85)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    all_classes = [(c, s, b) for c in COLORS for s in SHAPES for b in BACKGROUNDS]
    order = rng.permutation(len(all_classes))
    n_hold = int(len(all_classes) * args.holdout_frac)
    holdout = [all_classes[i] for i in order[:n_hold]]
    train_classes = [all_classes[i] for i in order[n_hold:]]

    n_train_shards = write_split(args.out, "train", args.train, train_classes, rng,
                                 args.size, args.shard_size, args.quality)
    n_val_shards = write_split(args.out, "val", args.val, all_classes, rng,
                               args.size, args.shard_size, args.quality)
    with open(os.path.join(args.out, "classes.json"), "w") as f:
        json.dump({
            "train_classes": [list(c) for c in train_classes],
            "holdout_classes": [list(c) for c in holdout],
            "captions": {"template": "a {color} {shape} on a {bg} background"},
        }, f, indent=1)
    print(json.dumps({
        "out": args.out, "train": args.train, "val": args.val,
        "train_shards": n_train_shards, "val_shards": n_val_shards,
        "train_classes": len(train_classes), "holdout_classes": len(holdout),
    }))


if __name__ == "__main__":
    main()
