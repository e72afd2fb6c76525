"""Batch embedding extraction — the serving-side encode API.

Counterpart of reference papers-1-and-2/clip_embeddings.py:13-160 (CLIPEmbeddingExtractor:
batched text/image encoding, L2-normalized numpy out) and the notebook embed loops
(metrics.ipynb:cell 12 — which embedded at batch size 1; here everything is jitted at a
fixed batch with tail padding, so arbitrary request sizes hit one compiled program).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tpu.data.preprocess import IMAGE_SIZE
from multimodal_tpu.data.tokenizer import tokenize
from multimodal_tpu.data.wds import decode_images


def _wire_upsample(x, model, wire_size):
    """Device-side ``--wire-size`` analog for the embedding/serving path
    (train/engine.py:batch_images): normalize the uint8 wire crop, then bicubic-upsample
    to the model's resolution in XLA — resolution recovery costs MXU-adjacent compute
    instead of host decode time and wire bandwidth. Gated on an EXPLICIT wire_size: a
    spatial size that matches neither the model nor the declared wire format is a
    configuration error and raises at trace time."""
    s = model.cfg.vision.image_size
    if x.shape[1] == s and x.shape[2] == s:
        return x
    if wire_size is None or x.shape[1] != wire_size or x.shape[2] != wire_size:
        raise ValueError(
            f"images are {x.shape[1]}x{x.shape[2]} but the model expects {s}px — "
            f"construct the Embedder/EmbeddingService with wire_size={x.shape[1]} to "
            "opt into the on-device upsample"
        )
    if x.dtype == jnp.uint8:
        from multimodal_tpu.data.preprocess import normalize_images

        x = normalize_images(x)
    return jax.image.resize(
        x.astype(jnp.float32), (x.shape[0], s, s, x.shape[-1]), method="bicubic")


class Embedder:
    """Jitted, fixed-batch text/image embedding over a CLIP-family model."""

    def __init__(self, model, params, batch_size: int = 256, normalize: bool = True,
                 quantized: bool = False, wire_size: int | None = None):
        """quantized=True converts the params to W8A8 once (inference_quant.py) and serves
        every encode on the MXU's 2x-rate int8 path — forward-only, cosine>0.99 of f32.
        wire_size=N accepts [B, N, N, 3] uint8 batches and upsamples them to the model's
        resolution on device (the serving analog of the train path's --wire-size)."""
        self.model = model
        self.batch_size = batch_size
        self.normalize = normalize
        self.wire_size = wire_size

        if quantized:
            from multimodal_tpu.inference_quant import (
                encode_image_q,
                encode_text_q,
                quantize_clip_params,
            )

            cfg = model.cfg
            self.params = quantize_clip_params(params, cfg)

            @jax.jit
            def _encode_text(qparams, tokens):
                return encode_text_q(qparams, cfg, tokens, normalize=normalize)

            @jax.jit
            def _encode_image(qparams, images):
                x = _wire_upsample(images, model, wire_size)
                return encode_image_q(qparams, cfg, x, normalize=normalize)
        else:
            self.params = params

            @jax.jit
            def _encode_text(params, tokens):
                return model.apply(params, tokens, normalize=normalize,
                                   method=model.encode_text)

            @jax.jit
            def _encode_image(params, images):
                x = _wire_upsample(images, model, wire_size)
                if x.dtype == jnp.uint8:
                    from multimodal_tpu.data.preprocess import normalize_images

                    x = normalize_images(x)
                return model.apply(params, x, normalize=normalize,
                                   method=model.encode_image)

        self._encode_text = _encode_text
        self._encode_image = _encode_image

    def _batched(self, encode, array: np.ndarray) -> np.ndarray:
        """Pad the tail to the fixed batch so every call reuses one compiled program.

        Batches are dispatched ahead of the host fetch (bounded in-flight window) so the
        host->device transfer of batch i+1 overlaps the encode of batch i — JAX's async
        dispatch does the rest. Synchronous per-batch round trips were the serving-path
        bottleneck before compute was (uint8 wire + pipelining; see RESULTS.md)."""
        n = array.shape[0]
        in_flight: list[tuple[object, int]] = []
        outs = []

        def drain_one():
            out, pad = in_flight.pop(0)
            out = np.asarray(out)
            outs.append(out if not pad else out[:-pad])

        for start in range(0, n, self.batch_size):
            chunk = array[start : start + self.batch_size]
            pad = self.batch_size - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, axis=0)])
            in_flight.append((encode(self.params, jnp.asarray(chunk)), pad))
            if len(in_flight) > 3:
                drain_one()
        while in_flight:
            drain_one()
        return np.concatenate(outs, axis=0) if outs else np.zeros((0,))

    def embed_texts(self, texts: Sequence[str], context_length: Optional[int] = None):
        ctx = context_length or self.model.cfg.text.context_length
        return self._batched(self._encode_text, tokenize(list(texts), ctx))

    def embed_tokens(self, tokens: np.ndarray):
        return self._batched(self._encode_text, np.asarray(tokens, np.int32))

    def embed_images(self, images: np.ndarray):
        """images: [N, S, S, 3] uint8 or normalized float."""
        return self._batched(self._encode_image, images)

    def embed_image_bytes(self, buffers: Sequence[bytes], image_size: int = IMAGE_SIZE):
        """Raw encoded images (JPEG/PNG bytes) -> embeddings via the native decode pipeline;
        failed decodes come back as zero rows (flagged in the second return value)."""
        arr, ok = decode_images(list(buffers), image_size, train=False)
        emb = self.embed_images(arr)
        emb[~ok] = 0.0
        return emb, ok

    def embed_image_files(self, paths: Sequence[str], image_size: int = IMAGE_SIZE):
        buffers = []
        for p in paths:
            try:
                with open(p, "rb") as f:
                    buffers.append(f.read())
            except OSError:
                buffers.append(b"")
        return self.embed_image_bytes(buffers, image_size)
