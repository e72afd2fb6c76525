"""Production embedding service: dynamic request batching over the compiled encoders.

Beyond-reference capability (the reference stack has no serving path; its closest analog
is the batch extractor papers-1-and-2/clip_embeddings.py:13-160, which `inference.Embedder`
already covers). This module adds what a deployment actually needs on a TPU chip:

- **Dynamic batching.** Concurrent clients each send a handful of items; the chip wants
  one large batch. A single dispatcher thread coalesces queued requests up to
  ``max_batch`` items or ``max_wait_ms``, whichever comes first, then dispatches ONE
  compiled encode. One dispatcher per modality: JAX programs execute on a single device
  stream anyway, so extra dispatch threads would only contend.
- **Bucketed static shapes.** XLA compiles per shape. Coalesced batches are padded up to
  the next power-of-two bucket (≤ max_batch), so the service compiles at most
  log2(max_batch)+1 programs per modality ever — no shape-churn recompiles, the classic
  TPU serving failure mode.
- **uint8 wire for images** (4x less host→device traffic; normalization runs on device,
  fused into the encode — same policy as the training input pipeline).
- **Low-bandwidth wire formats** (``wire_size=N``): clients may POST raw uint8 N-px crops
  (``images_u8`` — host work is just b64decode+reshape, no JPEG decode) or pre-resized
  N-px JPEGs (``"wire": true`` — a much cheaper host decode); the upsample to model
  resolution runs on device in the encode prolog, exactly like the train path's
  ``--wire-size``. On a host-core-bound deployment this is the difference between
  decode-limited and chip-limited image serving.

The HTTP front end is stdlib (ThreadingHTTPServer): JSON in/out, base64 images, /healthz
and /v1/stats for probes. Handler threads do host work only (tokenize, JPEG decode);
device work is funneled through the dispatcher.
"""

from __future__ import annotations

import base64
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional, Sequence

import numpy as np


def _next_bucket(n: int, max_batch: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, max_batch)


class _Request:
    __slots__ = ("rows", "done", "result", "error")

    def __init__(self, rows: np.ndarray):
        self.rows = rows
        self.done = threading.Event()
        self.result: Optional[np.ndarray] = None
        self.error: Optional[BaseException] = None


class BatcherStats:
    """Counters a load balancer (or a test) can read: how well requests coalesce."""

    def __init__(self):
        self.lock = threading.Lock()
        self.requests = 0
        self.items = 0
        self.batches = 0
        self.max_occupancy = 0
        self.padded_items = 0

    def record(self, n_requests: int, n_items: int, bucket: int):
        with self.lock:
            self.requests += n_requests
            self.items += n_items
            self.batches += 1
            self.max_occupancy = max(self.max_occupancy, n_items)
            self.padded_items += bucket - n_items

    def snapshot(self) -> dict:
        with self.lock:
            mean = self.items / self.batches if self.batches else 0.0
            return {
                "requests": self.requests,
                "items": self.items,
                "batches": self.batches,
                "mean_batch_items": round(mean, 2),
                "max_batch_items": self.max_occupancy,
                "padded_items": self.padded_items,
            }


class DynamicBatcher:
    """Coalesce concurrent encode requests into bucketed device batches.

    ``encode``: np.ndarray [B, ...] -> array-like [B, D]; called only from the internal
    dispatcher thread, with B always a power-of-two bucket ≤ max_batch.
    """

    def __init__(self, encode: Callable, max_batch: int = 256, max_wait_ms: float = 5.0):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self.encode = encode
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.stats = BatcherStats()
        self._q: queue.Queue = queue.Queue()
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, rows: np.ndarray) -> np.ndarray:
        """Block until the rows are encoded; returns [len(rows), D]. Thread-safe."""
        if self._stop:
            raise RuntimeError("batcher is stopped")
        if rows.shape[0] == 0:
            return np.zeros((0,), np.float32)
        # oversize requests are split so one client can't exceed the bucket ceiling
        if rows.shape[0] > self.max_batch:
            parts = [
                self.submit(rows[i : i + self.max_batch])
                for i in range(0, rows.shape[0], self.max_batch)
            ]
            return np.concatenate(parts, axis=0)
        req = _Request(rows)
        self._q.put(req)
        req.done.wait()
        if req.error is not None:
            raise req.error
        return req.result

    def stop(self):
        self._stop = True
        self._q.put(None)  # wake the dispatcher
        self._thread.join(timeout=5)

    # ------------------------------------------------------------- dispatcher
    def _loop(self):
        while True:
            first = self._q.get()
            if first is None:
                return
            batch = [first]
            count = first.rows.shape[0]
            deadline = time.monotonic() + self.max_wait
            while count < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    self._flush(batch, count)
                    return
                if count + nxt.rows.shape[0] > self.max_batch:
                    # doesn't fit: dispatch what we have, start the next batch with it
                    self._flush(batch, count)
                    batch, count = [nxt], nxt.rows.shape[0]
                    deadline = time.monotonic() + self.max_wait
                else:
                    batch.append(nxt)
                    count += nxt.rows.shape[0]
            self._flush(batch, count)

    def _flush(self, batch: list, count: int):
        try:
            rows = np.concatenate([r.rows for r in batch], axis=0)
            bucket = _next_bucket(count, self.max_batch)
            if bucket > count:
                pad = np.repeat(rows[-1:], bucket - count, axis=0)
                rows = np.concatenate([rows, pad], axis=0)
            out = np.asarray(self.encode(rows))
            self.stats.record(len(batch), count, bucket)
            off = 0
            for r in batch:
                n = r.rows.shape[0]
                r.result = out[off : off + n]
                off += n
                r.done.set()
        except BaseException as e:  # surface to every waiting client, don't kill the loop
            for r in batch:
                r.error = e
                r.done.set()


class EmbeddingService:
    """The model-facing half of the server: tokenization/decode on the caller's thread,
    device encodes funneled through per-modality DynamicBatchers. Usable directly
    (in-process) or behind the HTTP front end."""

    def __init__(self, model, params, max_batch: int = 256, max_wait_ms: float = 5.0,
                 quantized: bool = False, normalize: bool = True,
                 wire_size: Optional[int] = None):
        from multimodal_tpu.inference import Embedder

        self.model = model
        self.wire_size = wire_size
        self._embedder = Embedder(model, params, batch_size=max_batch,
                                  normalize=normalize, quantized=quantized,
                                  wire_size=wire_size)
        p = self._embedder.params
        self.text_batcher = DynamicBatcher(
            lambda toks: self._embedder._encode_text(p, toks),
            max_batch=max_batch, max_wait_ms=max_wait_ms)
        self.image_batcher = DynamicBatcher(
            lambda imgs: self._embedder._encode_image(p, imgs),
            max_batch=max_batch, max_wait_ms=max_wait_ms)
        # the low-bandwidth wire format rides its OWN batcher: batches are coalesced by
        # concatenation, so each spatial shape needs its own stream (and its own
        # log2(max_batch)+1 family of bucketed programs — the compile-count contract is
        # per shape stream)
        self.image_wire_batcher = (
            DynamicBatcher(lambda imgs: self._embedder._encode_image(p, imgs),
                           max_batch=max_batch, max_wait_ms=max_wait_ms)
            if wire_size else None)
        self.started = time.time()

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        from multimodal_tpu.data.tokenizer import tokenize

        toks = tokenize(list(texts), self.model.cfg.text.context_length)
        return self.text_batcher.submit(toks)

    def embed_image_arrays(self, images: np.ndarray) -> np.ndarray:
        """Route by spatial size: wire-format batches ([N, wire, wire, 3]) go through
        the wire batcher (device-side upsample in the encode prolog); everything else
        through the native-resolution batcher."""
        if (self.image_wire_batcher is not None and images.ndim == 4
                and images.shape[1] == self.wire_size
                and images.shape[1] != self.model.cfg.vision.image_size):
            return self.image_wire_batcher.submit(images)
        return self.image_batcher.submit(images)

    def embed_image_bytes(self, buffers: Sequence[bytes], wire: bool = False):
        """wire=True decodes at ``wire_size`` (a much cheaper host decode — e.g. 128 px
        vs 224 px JPEG) and lets the device recover the resolution; requires the service
        to be constructed with wire_size."""
        from multimodal_tpu.data.wds import decode_images

        if wire and not self.wire_size:
            raise ValueError("wire decode requested but the service has no wire_size")
        size = self.wire_size if wire else self.model.cfg.vision.image_size
        arr, ok = decode_images(list(buffers), size, train=False)
        emb = self.embed_image_arrays(arr)
        emb = np.array(emb)
        emb[~ok] = 0.0
        return emb, ok

    def embed_image_raw(self, buffers: Sequence[bytes], size: Optional[int] = None):
        """Pre-decoded payloads: each buffer is raw uint8 HWC at ``size`` px (default:
        the service wire_size, else the model's native size) — the serving analog of the
        train path's uint8 wire format. Host work is just a reshape; no JPEG decode."""
        size = size or self.wire_size or self.model.cfg.vision.image_size
        n = size * size * 3
        bad = [i for i, b in enumerate(buffers) if len(b) != n]
        if bad:
            raise ValueError(
                f"raw image {bad[0]} has {len(buffers[bad[0]])} bytes, expected "
                f"{n} ({size}x{size}x3 uint8)")
        arr = np.frombuffer(b"".join(buffers), np.uint8).reshape(-1, size, size, 3)
        return self.embed_image_arrays(arr)

    def similarity(self, texts: Sequence[str], buffers: Sequence[bytes],
                   wire: bool = False):
        """Cosine-similarity matrix [n_images, n_texts] (embeddings are unit-norm)."""
        t = self.embed_texts(texts)
        i, ok = self.embed_image_bytes(buffers, wire=wire)
        return i @ t.T, ok

    def stats(self) -> dict:
        out = {
            "uptime_s": round(time.time() - self.started, 1),
            "text": self.text_batcher.stats.snapshot(),
            "image": self.image_batcher.stats.snapshot(),
        }
        if self.image_wire_batcher is not None:
            out["image_wire"] = self.image_wire_batcher.stats.snapshot()
        return out

    def close(self):
        self.text_batcher.stop()
        self.image_batcher.stop()
        if self.image_wire_batcher is not None:
            self.image_wire_batcher.stop()


class _Handler(BaseHTTPRequestHandler):
    service: EmbeddingService  # set on the subclass by make_server

    def log_message(self, fmt, *args):  # route through logging, not stderr
        import logging

        logging.getLogger("multimodal_tpu.serving").debug(fmt, *args)

    def _json(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _emb_payload(self, req: dict, emb: np.ndarray) -> dict:
        """Embedding response in the requested encoding. Default: JSON float lists
        (universally parseable). ``"encoding": "b64"``: base64 of packed little-endian
        float32 rows + shape — ~6x fewer response bytes and an order of magnitude less
        host serialization work, which is what bounds image serving at high concurrency
        on a host-core-limited deployment (RESULTS.md serving table)."""
        if req.get("encoding") == "b64":
            a = np.ascontiguousarray(emb, dtype="<f4")
            return {"embeddings_b64": base64.b64encode(a.tobytes()).decode(),
                    "shape": list(a.shape), "dtype": "float32"}
        return {"embeddings": emb.tolist()}

    def do_GET(self):
        if self.path == "/healthz":
            import jax

            self._json(200, {"ok": True, "platform": jax.devices()[0].platform})
        elif self.path == "/v1/stats":
            self._json(200, self.service.stats())
        else:
            self._json(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
        except (ValueError, json.JSONDecodeError) as e:
            return self._json(400, {"error": f"bad request body: {e}"})
        try:
            if self.path == "/v1/embed/text":
                texts = req.get("texts")
                if not isinstance(texts, list) or not texts:
                    return self._json(400, {"error": "'texts' must be a non-empty list"})
                emb = self.service.embed_texts(texts)
                return self._json(200, self._emb_payload(req, emb))
            if self.path == "/v1/embed/image":
                b64 = req.get("images_b64")
                raw = req.get("images_u8")
                if raw is not None:
                    # low-bandwidth pre-decoded payload: base64 of raw uint8 HWC rows at
                    # 'size' px (default: the service wire_size). Host work is only
                    # b64decode + reshape; the device upsamples in the encode prolog.
                    if not isinstance(raw, list) or not raw:
                        return self._json(
                            400, {"error": "'images_u8' must be a non-empty list"})
                    emb = self.service.embed_image_raw(
                        [base64.b64decode(s) for s in raw], size=req.get("size"))
                    return self._json(200, {**self._emb_payload(req, np.asarray(emb)),
                                            "decoded": [True] * len(raw)})
                if not isinstance(b64, list) or not b64:
                    return self._json(400,
                                      {"error": "'images_b64' must be a non-empty list"})
                buffers = [base64.b64decode(s) for s in b64]
                emb, ok = self.service.embed_image_bytes(
                    buffers, wire=bool(req.get("wire", False)))
                return self._json(200, {**self._emb_payload(req, emb),
                                        "decoded": ok.tolist()})
            if self.path == "/v1/similarity":
                texts, b64 = req.get("texts"), req.get("images_b64")
                raw = req.get("images_u8")
                if not texts or not (b64 or raw):
                    return self._json(400, {"error": "need 'texts' and 'images_b64' "
                                                     "(or 'images_u8')"})
                t = self.service.embed_texts(texts)
                if raw:
                    i = self.service.embed_image_raw(
                        [base64.b64decode(s) for s in raw], size=req.get("size"))
                    return self._json(200, {"similarity": (i @ t.T).tolist(),
                                            "decoded": [True] * len(raw)})
                sims, ok = self.service.similarity(
                    texts, [base64.b64decode(s) for s in b64],
                    wire=bool(req.get("wire", False)))
                return self._json(200, {"similarity": sims.tolist(),
                                        "decoded": ok.tolist()})
            return self._json(404, {"error": f"unknown path {self.path}"})
        except Exception as e:  # encode failures -> 500 with the message, server stays up
            return self._json(500, {"error": str(e)})


def make_server(service: EmbeddingService, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; ``port=0`` picks a free port
    (``server.server_address[1]`` has the real one). Run with serve_forever()."""
    handler = type("Handler", (_Handler,), {"service": service})
    return ThreadingHTTPServer((host, port), handler)


def main(argv: Optional[Sequence[str]] = None) -> int:
    import argparse
    import logging

    from multimodal_tpu.models import create_model, init_params

    ap = argparse.ArgumentParser(
        description="Serve CLIP-family embeddings over HTTP with dynamic batching")
    ap.add_argument("--model", default="ViT-B-32")
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoint dir (Orbax, as written by train.run); "
                         "omit for random init (smoke mode)")
    ap.add_argument("--ema", action="store_true",
                    help="serve the EMA params if the checkpoint carries them")
    ap.add_argument("--quantized", action="store_true", help="serve the int8 W8A8 path")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max-batch", type=int, default=256)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--wire-size", type=int, default=None,
                    help="accept low-bandwidth image payloads at this resolution "
                         "(raw uint8 'images_u8' or 'wire': true JPEG) and upsample "
                         "on device — the serving analog of train's --wire-size")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("multimodal_tpu.serving")

    model = create_model(args.model)
    params = init_params(model)
    if args.checkpoint:
        import jax

        from multimodal_tpu.train import (CheckpointManager, TrainState, make_optimizer,
                                          make_schedule)

        tx = make_optimizer(make_schedule("const", 0.0, 0, 1))
        mgr = CheckpointManager(args.checkpoint)
        restored = None
        for ema_tmpl in (args.ema, not args.ema):  # tolerate EMA-toggled checkpoints
            try:
                template = jax.device_get(TrainState.create(params, tx, ema=ema_tmpl))
                restored, _ = mgr.restore(template)
                break
            except Exception:
                continue
        if restored is None:
            raise SystemExit(f"no restorable checkpoint under {args.checkpoint}")
        params = (restored.ema_params
                  if args.ema and getattr(restored, "ema_params", None) is not None
                  else restored.params)
        log.info("restored step %s from %s", mgr.latest_step(), args.checkpoint)

    service = EmbeddingService(model, params, max_batch=args.max_batch,
                               max_wait_ms=args.max_wait_ms, quantized=args.quantized,
                               wire_size=args.wire_size)
    server = make_server(service, args.host, args.port)
    log.info("serving %s on http://%s:%d (max_batch=%d, wait=%.1fms)", args.model,
             *server.server_address, args.max_batch, args.max_wait_ms)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        service.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
