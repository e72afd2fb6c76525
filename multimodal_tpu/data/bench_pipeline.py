"""Input-pipeline benchmark: measures every host-side stage that feeds the chip.

The reference's input path is its classic bottleneck risk (CPU dataloader workers doing
JPEG decode + tokenization per batch, AlignCLIP/main/data.py:424-548 pipeline and
train.py:100-101 H2D copies); this tool quantifies the TPU rebuild's native counterparts
stage by stage so "input-bound-free" is a measured claim, not an assumption:

  1. tar shard indexing + raw sample iteration (native/tar_index.cc)
  2. batched JPEG decode at several thread counts, eval and train crops
     (native/jpeg_pipeline.cc)
  3. BPE tokenization, native fast path vs pure Python (native/bpe_tokenizer.cc,
     data/tokenizer.py)
  4. the assembled WdsReader (shards -> shuffled, decoded, tokenized uint8/int32 batches)

Each stage prints one JSON line; the summary compares end-to-end samples/s against a
per-chip model consumption rate (default: the measured ViT-B/32 train throughput) to
report how many chips one host like this can feed.

Usage: python -m multimodal_tpu.data.bench_pipeline [--shards PATTERN] [--num-samples N]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import tarfile
import tempfile
import time

import numpy as np


def _natural_image(rng, side: int) -> np.ndarray:
    """Natural-statistics test image (smooth gradients + a few shapes): JPEG bitrate and
    entropy-decode cost in the ballpark of real photos. Uniform noise is ~3x the bits of
    a photo at the same quality — benchmarking on it measures the Huffman worst case,
    not the workload (kept available via --noise)."""
    y, x = np.mgrid[0:side, 0:side].astype(np.float32) / side
    fx, fy, ph = rng.uniform(2, 9), rng.uniform(2, 9), rng.uniform(0, 6.28)
    base = 127 + 80 * np.sin(fx * x * 3.14 + ph) * np.cos(fy * y * 3.14)
    img = np.stack([base, 255 * x * rng.uniform(0.4, 1.0),
                    255 * y * rng.uniform(0.4, 1.0)], -1)
    # a couple of hard-edged rectangles for realistic local detail
    for _ in range(3):
        x0, y0 = rng.integers(0, side - side // 4, 2)
        w, h = rng.integers(side // 8, side // 3, 2)
        img[y0:y0 + h, x0:x0 + w] = rng.integers(0, 256, 3)
    return np.clip(img, 0, 255).astype(np.uint8)


def _make_shards(root: str, num_samples: int, num_shards: int, side: int, quality: int,
                 noise: bool = False):
    """Synthesize webdataset shards of JPEGs + short captions."""
    from PIL import Image

    rng = np.random.default_rng(0)
    per = num_samples // num_shards
    captions = ["a photo of a %s %s" % (c, s)
                for c in ("red", "green", "blue", "yellow")
                for s in ("circle", "square", "star", "cat")]
    paths = []
    for sh in range(num_shards):
        path = os.path.join(root, f"bench-{sh:04d}.tar")
        with tarfile.open(path, "w") as tar:
            for i in range(per):
                arr = (rng.integers(0, 256, (side, side, 3), dtype=np.uint8)
                       if noise else _natural_image(rng, side))
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
                payload = buf.getvalue()
                key = f"{sh:04d}{i:06d}"
                for ext, data in (("jpg", payload),
                                  ("txt", captions[i % len(captions)].encode())):
                    info = tarfile.TarInfo(f"{key}.{ext}")
                    info.size = len(data)
                    tar.addfile(info, io.BytesIO(data))
        paths.append(path)
    return os.path.join(root, f"bench-{{0000..{num_shards - 1:04d}}}.tar")


def _emit(stage: str, value: float, unit: str, **extra):
    rec = {"stage": stage, "value": round(value, 2), "unit": unit, **extra}
    print(json.dumps(rec))
    return rec


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--shards", default=None,
                   help="existing webdataset pattern; default: synthesize a temp set")
    p.add_argument("--num-samples", type=int, default=2048)
    p.add_argument("--num-shards", type=int, default=4)
    p.add_argument("--source-size", type=int, default=320,
                   help="side of the synthesized source JPEGs")
    p.add_argument("--noise", action="store_true",
                   help="uniform-noise sources (Huffman worst case) instead of "
                        "natural-statistics images")
    p.add_argument("--quality", type=int, default=92)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--threads", default=None,
                   help="comma list of decode thread counts (default: 1,half,all)")
    p.add_argument("--model-rate", type=float, default=2464.0,
                   help="per-chip samples/s the chip consumes (headline ViT-B/32)")
    args = p.parse_args(argv)

    from multimodal_tpu.data import tokenizer as tok
    from multimodal_tpu.data.wds import WdsReader, expand_shards, iter_tar_samples
    from multimodal_tpu.native import bindings as nat

    ncpu = os.cpu_count() or 1
    threads = ([int(t) for t in args.threads.split(",")] if args.threads
               else sorted({1, max(ncpu // 2, 1), ncpu}))
    tmp = None
    pattern = args.shards
    if pattern is None:
        tmp = tempfile.TemporaryDirectory(prefix="mmtpu_bench_")
        pattern = _make_shards(tmp.name, args.num_samples, args.num_shards,
                               args.source_size, args.quality, noise=args.noise)
    try:
        shards, _ = expand_shards(pattern, None)
        print(f"[bench_pipeline] shards={len(shards)} native={nat.available()} "
              f"cpus={ncpu} batch={args.batch_size}", file=sys.stderr)

        # -- stage 1: raw tar iteration (index + read, no decode) ------------------
        t0 = time.perf_counter()
        n = 0
        nbytes = 0
        jpegs, texts = [], []
        for sample in iter_tar_samples(shards[0]):
            n += 1
            nbytes += sum(len(v) for v in sample.values())
            img = sample.get("jpg") or sample.get("jpeg")
            # the native decoder is JPEG-only (bindings.py: route others via is_jpeg)
            if img and nat.is_jpeg(img) and len(jpegs) < args.batch_size:
                jpegs.append(img)
                texts.append((sample.get("txt") or b"").decode("utf-8", "replace"))
        dt = time.perf_counter() - t0
        _emit("tar_iterate", n / dt, "samples/s", mb_per_s=round(nbytes / dt / 1e6, 1))

        # pad the probe batch up to batch_size by cycling the real samples
        base = len(jpegs)
        while jpegs and len(jpegs) < args.batch_size:
            jpegs.append(jpegs[len(jpegs) % base])
            texts.append(texts[len(texts) % base])

        # -- stage 2: batched JPEG decode -------------------------------------------
        if nat.available() and jpegs:
            for train in (False, True):
                for th in threads:
                    nat.decode_batch(jpegs[:32], image_size=args.image_size,
                                     train=train, num_threads=th)  # warm
                    t0 = time.perf_counter()
                    reps = 3
                    for _ in range(reps):
                        out, ok = nat.decode_batch(jpegs, image_size=args.image_size,
                                                   train=train, num_threads=th)
                    dt = (time.perf_counter() - t0) / reps
                    _emit("jpeg_decode", len(jpegs) / dt, "images/s",
                          mode="train" if train else "eval", threads=th,
                          failed=int((~ok).sum()))
        else:
            print("[bench_pipeline] decode stage skipped "
                  f"(native={nat.available()}, jpeg probes={len(jpegs)})",
                  file=sys.stderr)

        # -- stage 3: BPE tokenization -----------------------------------------------
        batch_texts = (texts or ["a photo of a cat"]) * max(
            1, 4096 // max(len(texts), 1))
        t0 = time.perf_counter()
        tok.tokenize(batch_texts)
        dt = time.perf_counter() - t0
        _emit("tokenize", len(batch_texts) / dt, "texts/s", native=nat.available())

        # -- stage 4: assembled reader end to end ------------------------------------
        reader = WdsReader(pattern, batch_size=args.batch_size, train=True,
                           image_size=args.image_size, seed=0)
        it = iter(reader)
        next(it, None)  # warm: first batch pays shard open + shuffle fill
        t0 = time.perf_counter()
        batches = 0
        for _ in it:
            batches += 1
        dt = time.perf_counter() - t0
        # needs >= 2 total batches to measure past the warm-up one
        e2e = batches * args.batch_size / dt if batches else None
        _emit("wds_reader_e2e", e2e if e2e is not None else 0.0, "samples/s",
              batches=batches, measured=e2e is not None)

        summary = {
            "stage": "summary",
            "e2e_samples_per_s": round(e2e, 1) if e2e is not None else None,
            "model_rate_per_chip": args.model_rate,
            "chips_fed_by_this_host": round(e2e / args.model_rate, 2) if e2e else 0.0,
            "cpus": ncpu,
        }
        print(json.dumps(summary))
        return summary
    finally:
        if tmp is not None:
            tmp.cleanup()


if __name__ == "__main__":
    main()
