"""Webdataset-style tar shard reading: sample grouping, non-throwing decode, batching.

Counterpart of the reference's webdataset pipeline (AlignCLIP/main/data.py:424-548):
tar -> samples grouped by key (:310-315 via the webdataset dep), sample shuffle buffer
(:483), decode 'pilrgb' + tokenize map (:487-492), batched collation (:493), with
log-and-continue error absorption (:276-279). TPU-first redesign:

  * shard indexing via the native C++ tar scanner (multimodal_tpu/native/tar_index.cc) with
    a pure-Python tarfile fallback;
  * image decode via the native batched libjpeg pipeline (jpeg_pipeline.cc) — whole batches
    decoded in one GIL-free call; PNG/webp and corrupt JPEGs fall back to PIL per sample;
  * batches leave as uint8 [B, S, S, 3] + int32 [B, 77] — normalization happens on-device
    (multimodal_tpu.train.engine.batch_images).
"""

from __future__ import annotations

import logging
import tarfile
from typing import Iterable, Iterator, Optional

import numpy as np

from multimodal_tpu.data import preprocess
from multimodal_tpu.data.shards import ShardSampler, expand_shards
from multimodal_tpu.data.tokenizer import CONTEXT_LENGTH, tokenize
from multimodal_tpu.native import bindings as native

log = logging.getLogger(__name__)

IMAGE_EXTS = ("jpg", "jpeg", "png", "webp", "ppm", "pgm", "pbm", "pnm")
TEXT_EXTS = ("txt", "text", "caption")


def iter_tar_samples(path: str) -> Iterator[dict]:
    """Yield {'__key__': str, ext: bytes, ...} samples from one tar shard, grouping
    consecutive members by basename-before-first-dot (the webdataset convention).
    Non-throwing: unreadable shards/members are logged and skipped (data.py:276-315)."""
    try:
        entries = (
            native.tar_index(path)
            if native.available()
            else [
                (m.name, m.offset_data, m.size)
                for m in tarfile.open(path, "r")
                if m.isreg()
            ]
        )
    except Exception as e:  # noqa: BLE001 - absorb shard-level failures
        log.warning("skipping unreadable shard %s: %r", path, e)
        return
    current_key, sample = None, {}
    try:
        with open(path, "rb") as f:
            for name, offset, size in entries:
                base = name.split("/")[-1]
                if base.startswith(".") or "." not in base:
                    continue
                key, ext = base.split(".", 1)
                ext = ext.lower()
                if key != current_key:
                    if sample:
                        yield sample
                    current_key, sample = key, {"__key__": key}
                f.seek(offset)
                sample[ext] = f.read(size)
    except OSError as e:
        log.warning("truncated shard %s: %r", path, e)
    if sample:
        yield sample


def _first(sample: dict, exts: Iterable[str]) -> Optional[bytes]:
    for e in exts:
        if e in sample:
            return sample[e]
    return None


def _pil_fallback(
    data: bytes, image_size: int, train: bool, rng, aug=None
) -> Optional[np.ndarray]:
    try:
        crop_kw = {"scale": aug.scale, "ratio": aug.ratio} if aug is not None else {}
        arr = preprocess.preprocess_bytes(
            data, train=train, rng=rng, image_size=image_size, **crop_kw
        )
        # preprocess returns normalized float; reconstruct uint8 wire format
        mean = np.asarray(preprocess.OPENAI_DATASET_MEAN, np.float32)
        std = np.asarray(preprocess.OPENAI_DATASET_STD, np.float32)
        return np.clip((arr * std + mean) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    except Exception:  # noqa: BLE001 - per-sample absorption
        return None


def decode_images(
    buffers: list[bytes],
    image_size: int,
    train: bool,
    seeds: Optional[np.ndarray] = None,
    rng: Optional[np.random.Generator] = None,
    aug=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Batch decode -> (uint8 [N,S,S,3], ok [N] bool). JPEGs go through the native batched
    path; everything else (and native failures) through PIL; failures come back ok=False.
    ``aug`` (data.augment.AugmentationCfg) parameterizes the train crop and adds the
    pixel-space augmentations (color jitter / grayscale / erasing) after decode."""
    n = len(buffers)
    out = np.zeros((n, image_size, image_size, 3), np.uint8)
    ok = np.zeros(n, bool)
    rng = rng or np.random.default_rng(0)
    if seeds is None:
        seeds = rng.integers(0, 2**63, n, dtype=np.uint64)
    crop_kw = {"scale": aug.scale, "ratio": aug.ratio} if aug is not None else {}
    if native.available():
        is_j = [native.is_jpeg(b) for b in buffers]
        jpeg_idx = [i for i in range(n) if is_j[i]]
        if jpeg_idx:
            imgs, good = native.decode_batch(
                [buffers[i] for i in jpeg_idx],
                image_size,
                train=train,
                seeds=seeds[jpeg_idx],
                **crop_kw,
            )
            for pos, i in enumerate(jpeg_idx):
                if good[pos]:
                    out[i] = imgs[pos]
                    ok[i] = True
        rest = [i for i in range(n) if not ok[i]]
    else:
        rest = list(range(n))
    for i in rest:
        arr = _pil_fallback(buffers[i], image_size, train, rng, aug=aug)
        if arr is not None:
            out[i] = arr
            ok[i] = True
    if train and aug is not None and aug.has_pixel_aug:
        from multimodal_tpu.data.augment import apply_pixel_augment

        out = apply_pixel_augment(out, rng, aug)
    return out, ok


class WdsReader:
    """Shards -> shuffled, decoded, tokenized uint8/int32 batches.

    One reader per (host, worker). Bad samples are backfilled with good ones from the same
    batch (the reference absorbs failures per sample, data.py:276-279; we additionally keep
    the batch shape static so XLA never recompiles)."""

    def __init__(
        self,
        urls: str,
        *,
        batch_size: int,
        train: bool = True,
        image_size: int = preprocess.IMAGE_SIZE,
        context_length: int = CONTEXT_LENGTH,
        shuffle_buffer: int = 2000,
        seed: int = 0,
        resampled: bool = False,
        weights: Optional[str] = None,
        num_hosts: int = 1,
        host_id: int = 0,
        num_workers: int = 1,
        worker_id: int = 0,
        caption_key: Optional[str] = None,
        semantic_encoder=None,
        aug_cfg=None,
    ):
        shards, w = expand_shards(urls, weights)
        self.sampler = ShardSampler(
            shards,
            weights=w,
            seed=seed,
            resampled=resampled,
            num_hosts=num_hosts,
            host_id=host_id,
            num_workers=num_workers,
            worker_id=worker_id,
        )
        self.batch_size = batch_size
        self.train = train
        self.image_size = image_size
        self.context_length = context_length
        self.shuffle_buffer = shuffle_buffer if train else 0
        self.seed = seed
        self.caption_key = caption_key
        # optional host-side caption embedder adding batch['semantic'] (AlignCLIP NL
        # semantic supervision side-input, run.py:375-376 / train.py:92-96)
        self.semantic_encoder = semantic_encoder
        from multimodal_tpu.data.augment import parse_aug_cfg

        self.aug = parse_aug_cfg(aug_cfg) if train else None
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        self.sampler.set_epoch(epoch)

    @property
    def num_batches(self):
        """Unknown for streamed shards (the tar carries no index); callers needing an epoch
        length pass --train-num-samples / --steps-per-epoch (data.py:505-517 semantics)."""
        return None

    def _raw_samples(self, rng) -> Iterator[tuple[bytes, str]]:
        buf: list[tuple[bytes, str]] = []
        for shard in self.sampler:
            for sample in iter_tar_samples(shard):
                img = _first(sample, IMAGE_EXTS)
                txt = (
                    sample.get(self.caption_key)
                    if self.caption_key
                    else _first(sample, TEXT_EXTS)
                )
                if img is None or txt is None:
                    continue
                text = txt.decode("utf-8", errors="replace") if isinstance(txt, bytes) else txt
                if self.shuffle_buffer:
                    buf.append((img, text))
                    if len(buf) >= self.shuffle_buffer:
                        idx = int(rng.integers(len(buf)))
                        buf[idx], item = buf[-1], buf[idx]
                        buf.pop()
                        yield item
                else:
                    yield (img, text)
        rng.shuffle(buf)
        yield from buf

    def __iter__(self) -> Iterator[dict]:
        rng = np.random.default_rng([self.seed, self.epoch, self.sampler.worker_id])
        images, texts = [], []
        for img_bytes, text in self._raw_samples(rng):
            images.append(img_bytes)
            texts.append(text)
            if len(images) == self.batch_size:
                batch = self._collate(images, texts, rng)
                images, texts = [], []
                if batch is not None:
                    yield batch

    def _collate(self, images: list[bytes], texts: list[str], rng) -> Optional[dict]:
        arr, ok = decode_images(images, self.image_size, self.train, rng=rng, aug=self.aug)
        if not ok.any():
            return None
        # static batch shape for XLA: backfill failed decodes with good samples instead of
        # shrinking the batch (a shrunk batch would trigger a recompile every time)
        good_idx = np.flatnonzero(ok)
        if len(good_idx) < len(images):
            fill = rng.choice(good_idx, size=len(images) - len(good_idx))
            bad_idx = np.flatnonzero(~ok)
            arr[bad_idx] = arr[fill]
            texts = list(texts)
            for b, g in zip(bad_idx, fill):
                texts[b] = texts[g]
        tokens = tokenize(texts, self.context_length)
        batch = {"image": arr, "text": tokens}
        if self.semantic_encoder is not None:
            batch["semantic"] = self.semantic_encoder(texts)
        return batch
