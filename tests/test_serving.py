"""Serving layer: dynamic batching semantics, HTTP API, concurrency, error surfacing."""

import base64
import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest
from PIL import Image

from multimodal_tpu.models import add_model_config, create_model, init_params
from multimodal_tpu.serving import (
    DynamicBatcher,
    EmbeddingService,
    _next_bucket,
    make_server,
)

add_model_config(
    "tiny-serve",
    {
        "embed_dim": 16,
        "vision_cfg": {"image_size": 32, "patch_size": 16, "width": 32, "layers": 1,
                       "heads": 2},
        "text_cfg": {"context_length": 16, "vocab_size": 49408, "width": 32, "layers": 1,
                     "heads": 2},
    },
)


def test_next_bucket():
    assert [_next_bucket(n, 8) for n in (1, 2, 3, 5, 8, 9)] == [1, 2, 4, 8, 8, 8]


def test_batcher_coalesces_and_matches_direct():
    calls = []

    def encode(rows):
        calls.append(rows.shape[0])
        return rows * 2.0

    b = DynamicBatcher(encode, max_batch=8, max_wait_ms=200.0)
    try:
        xs = [np.full((1, 4), float(i), np.float32) for i in range(6)]
        outs = [None] * 6

        def client(i):
            outs[i] = b.submit(xs[i])

        threads = [threading.Thread(target=client, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(6):
            np.testing.assert_array_equal(outs[i], xs[i] * 2.0)
        # 6 concurrent singletons within the wait window coalesce into few batches,
        # and every dispatched batch is a power-of-two bucket
        assert len(calls) < 6
        assert all(c & (c - 1) == 0 for c in calls)
        assert b.stats.snapshot()["requests"] == 6
    finally:
        b.stop()


def test_batcher_splits_oversize_and_dispatches_full_batches():
    b = DynamicBatcher(lambda r: r + 1.0, max_batch=4, max_wait_ms=1.0)
    try:
        big = np.zeros((11, 2), np.float32)
        out = b.submit(big)
        np.testing.assert_array_equal(out, big + 1.0)
        snap = b.stats.snapshot()
        assert snap["items"] == 11
        assert snap["max_batch_items"] <= 4
    finally:
        b.stop()


def test_batcher_error_propagates_and_loop_survives():
    def encode(rows):
        if rows[0, 0] < 0:
            raise ValueError("boom")
        return rows

    b = DynamicBatcher(encode, max_batch=4, max_wait_ms=1.0)
    try:
        with pytest.raises(ValueError, match="boom"):
            b.submit(np.full((1, 2), -1.0, np.float32))
        ok = b.submit(np.ones((2, 2), np.float32))  # the dispatcher is still alive
        np.testing.assert_array_equal(ok, np.ones((2, 2), np.float32))
    finally:
        b.stop()


@pytest.fixture(scope="module")
def service():
    model = create_model("tiny-serve")
    svc = EmbeddingService(model, init_params(model), max_batch=8, max_wait_ms=5.0)
    yield svc
    svc.close()


def _jpeg(seed: int, size: int = 32) -> bytes:
    rng = np.random.default_rng(seed)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 256, (size, size, 3), dtype=np.uint8)).save(
        buf, "JPEG")
    return buf.getvalue()


def test_service_text_matches_embedder(service):
    texts = ["a cat", "a dog on a mat", "x"]
    out = service.embed_texts(texts)
    assert out.shape == (3, 16)
    from multimodal_tpu.inference import Embedder

    direct = Embedder(service.model, service._embedder.params, batch_size=8)
    np.testing.assert_allclose(out, direct.embed_texts(texts), atol=1e-5)


def test_service_images_and_similarity(service):
    emb, ok = service.embed_image_bytes([_jpeg(0), b"corrupt", _jpeg(1)])
    assert list(ok) == [True, False, True]
    assert np.linalg.norm(emb[1]) == 0.0
    np.testing.assert_allclose(np.linalg.norm(emb[0]), 1.0, atol=1e-4)
    sims, ok2 = service.similarity(["a", "b"], [_jpeg(2)])
    assert sims.shape == (1, 2)
    assert np.all(np.abs(sims) <= 1.0 + 1e-5)


@pytest.fixture(scope="module")
def server(service):
    srv = make_server(service, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(url, json.dumps(payload).encode(),
                                 {"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_endpoints(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        assert json.loads(r.read())["ok"] is True

    code, out = _post(server + "/v1/embed/text", {"texts": ["hello world"]})
    assert code == 200
    assert len(out["embeddings"]) == 1 and len(out["embeddings"][0]) == 16

    code, out = _post(server + "/v1/embed/image",
                      {"images_b64": [base64.b64encode(_jpeg(3)).decode()]})
    assert code == 200 and out["decoded"] == [True]

    code, out = _post(server + "/v1/similarity",
                      {"texts": ["a", "b"],
                       "images_b64": [base64.b64encode(_jpeg(4)).decode()]})
    assert code == 200 and len(out["similarity"]) == 1

    code, out = _post(server + "/v1/embed/text", {"texts": []})
    assert code == 400
    code, out = _post(server + "/v1/nope", {})
    assert code == 404

    with urllib.request.urlopen(server + "/v1/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert stats["text"]["requests"] >= 2 and stats["image"]["batches"] >= 1


def test_http_concurrent_clients_coalesce(server, service):
    """Many single-text clients in flight at once: results are per-client correct and
    the text batcher dispatched fewer device batches than requests."""
    before = service.text_batcher.stats.snapshot()["batches"]
    texts = [f"caption number {i}" for i in range(12)]
    results = [None] * 12

    def client(i):
        results[i] = _post(server + "/v1/embed/text", {"texts": [texts[i]]})

    threads = [threading.Thread(target=client, args=(i,)) for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(code == 200 for code, _ in results)

    direct = service.embed_texts(texts)
    for i, (_, out) in enumerate(results):
        np.testing.assert_allclose(np.asarray(out["embeddings"][0], np.float32),
                                   direct[i], atol=1e-4)
    dispatched = service.text_batcher.stats.snapshot()["batches"] - before
    assert dispatched < 12


# --------------------------------------------------------------------------- wire path
# (round-5) low-bandwidth image payloads: raw uint8 / pre-resized JPEG at wire_size,
# upsampled to model resolution ON DEVICE in the encode prolog (the serving analog of
# the train path's --wire-size, train/engine.py:batch_images)

WIRE = 16  # model is 32 px


@pytest.fixture(scope="module")
def wire_service():
    model = create_model("tiny-serve")
    svc = EmbeddingService(model, init_params(model), max_batch=8, max_wait_ms=5.0,
                           wire_size=WIRE)
    yield svc
    svc.close()


def test_wire_upsample_matches_train_prolog(wire_service):
    """The serving wire encode must equal encoding through the TRAIN path's
    batch_images prolog (normalize -> device bicubic upsample) — one definition of the
    wire format across train and serve."""
    import jax

    from multimodal_tpu.train.engine import batch_images

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (3, WIRE, WIRE, 3), dtype=np.uint8)
    served = wire_service.embed_image_arrays(imgs)
    assert served.shape == (3, 16)

    model, params = wire_service.model, wire_service._embedder.params
    x = batch_images({"image": imgs}, model, wire_size=WIRE)
    expect = jax.jit(lambda p, x: model.apply(p, x, normalize=True,
                                              method=model.encode_image))(params, x)
    np.testing.assert_allclose(served, np.asarray(expect), atol=1e-4)
    # and the wire stream rode its own batcher, not the native-resolution one
    assert wire_service.stats()["image_wire"]["items"] >= 3


def test_wire_raw_and_jpeg_routes(wire_service):
    rng = np.random.default_rng(1)
    arrs = [rng.integers(0, 256, (WIRE, WIRE, 3), dtype=np.uint8) for _ in range(2)]
    raw = wire_service.embed_image_raw([a.tobytes() for a in arrs])
    np.testing.assert_allclose(np.linalg.norm(raw, axis=-1), 1.0, atol=1e-4)
    # raw route == array route (same bytes, same prolog)
    direct = wire_service.embed_image_arrays(np.stack(arrs))
    np.testing.assert_allclose(raw, direct, atol=1e-5)

    emb, ok = wire_service.embed_image_bytes([_jpeg(7, size=WIRE)], wire=True)
    assert list(ok) == [True] and np.isfinite(emb).all()

    with pytest.raises(ValueError, match="expected"):
        wire_service.embed_image_raw([b"short"])


def test_wire_requires_explicit_opt_in(service):
    """A non-native spatial size WITHOUT wire_size is a configuration error, not a
    silent upsample (same contract as the train path)."""
    rng = np.random.default_rng(2)
    with pytest.raises(ValueError, match="wire_size"):
        service.embed_image_arrays(
            rng.integers(0, 256, (2, WIRE, WIRE, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="wire"):
        service.embed_image_bytes([_jpeg(8)], wire=True)


def test_http_wire_endpoints(wire_service):
    srv = make_server(wire_service, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        rng = np.random.default_rng(3)
        arr = rng.integers(0, 256, (WIRE, WIRE, 3), dtype=np.uint8)
        code, out = _post(base + "/v1/embed/image",
                          {"images_u8": [base64.b64encode(arr.tobytes()).decode()]})
        assert code == 200 and out["decoded"] == [True]
        direct = wire_service.embed_image_arrays(arr[None])
        np.testing.assert_allclose(
            np.asarray(out["embeddings"][0], np.float32), direct[0], atol=1e-4)

        code, out = _post(base + "/v1/embed/image",
                          {"images_b64": [base64.b64encode(_jpeg(9, size=WIRE)).decode()],
                           "wire": True})
        assert code == 200 and out["decoded"] == [True]

        code, out = _post(base + "/v1/embed/image",
                          {"images_u8": [base64.b64encode(b"bogus").decode()]})
        assert code == 500 and "expected" in out["error"]

        code, out = _post(base + "/v1/similarity",
                          {"texts": ["a", "b"],
                           "images_u8": [base64.b64encode(arr.tobytes()).decode()]})
        assert code == 200 and len(out["similarity"]) == 1
        assert len(out["similarity"][0]) == 2

        # packed-float32 response encoding carries the same numbers as the JSON lists
        code, out = _post(base + "/v1/embed/text",
                          {"texts": ["hello"], "encoding": "b64"})
        assert code == 200 and out["shape"] == [1, 16]
        packed = np.frombuffer(base64.b64decode(out["embeddings_b64"]),
                               "<f4").reshape(out["shape"])
        code, plain = _post(base + "/v1/embed/text", {"texts": ["hello"]})
        np.testing.assert_allclose(packed, np.asarray(plain["embeddings"]), atol=1e-6)
        code, out = _post(base + "/v1/embed/image",
                          {"images_u8": [base64.b64encode(arr.tobytes()).decode()],
                           "encoding": "b64"})
        assert code == 200 and out["shape"] == [1, 16] and out["decoded"] == [True]

        with urllib.request.urlopen(base + "/v1/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["image_wire"]["items"] >= 2
    finally:
        srv.shutdown()
