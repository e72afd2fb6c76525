"""Int8 serving path (ops/quant.py, inference_quant.py): quantization primitives are exact
to their spec, and the quantized encoders track the f32 model to cosine > 0.99."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tpu.inference import Embedder
from multimodal_tpu.inference_quant import (
    encode_image_q,
    encode_text_q,
    quantize_clip_params,
)
from multimodal_tpu.models import create_model, init_params
from multimodal_tpu.ops.quant import int8_matmul, quantize_rows, quantize_weight


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    wq, scale = quantize_weight(w)
    assert wq.dtype == jnp.int8
    deq = wq.astype(jnp.float32) * scale[None, :]
    # max error is half an int8 step of the per-column scale
    err = np.max(np.abs(np.asarray(deq - w)), axis=0)
    assert np.all(err <= np.asarray(scale) * 0.5 + 1e-7)


def test_quantize_rows_range():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 64)) * 10, jnp.float32)
    xq, sx = quantize_rows(x)
    assert int(jnp.max(jnp.abs(xq.astype(jnp.int32)))) == 127  # max row value maps to 127


def test_int8_matmul_tracks_f32():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(16, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(128, 64)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
    wq, scale = quantize_weight(w)
    y_q = np.asarray(int8_matmul(x, wq, scale, bias=b, out_dtype=jnp.float32))
    y_f = np.asarray(x @ w + b)
    # relative error bounded by the two 8-bit roundings over a 128-deep contraction
    rel = np.linalg.norm(y_q - y_f) / np.linalg.norm(y_f)
    assert rel < 0.02, rel


def _cosine(a, b):
    a = a / np.linalg.norm(a, axis=-1, keepdims=True)
    b = b / np.linalg.norm(b, axis=-1, keepdims=True)
    return np.sum(a * b, axis=-1)


def test_quantized_encoders_track_f32_model():
    model = create_model("tiny-test")
    params = init_params(model, jax.random.PRNGKey(0))
    qparams = quantize_clip_params(params, model.cfg)

    rng = np.random.default_rng(3)
    c = model.cfg
    images = jnp.asarray(
        rng.integers(0, 256, (8, c.vision.image_size, c.vision.image_size, 3)), jnp.uint8)
    tokens = jnp.asarray(
        rng.integers(1, c.text.vocab_size - 1, (8, c.text.context_length)), jnp.int32)

    from multimodal_tpu.data.preprocess import normalize_images

    fi_f = np.asarray(model.apply(params, normalize_images(images), normalize=True,
                                  method=model.encode_image))
    ft_f = np.asarray(model.apply(params, tokens, normalize=True,
                                  method=model.encode_text))
    fi_q = np.asarray(encode_image_q(qparams, c, images))
    ft_q = np.asarray(encode_text_q(qparams, c, tokens))

    assert np.min(_cosine(fi_q, fi_f)) > 0.99, _cosine(fi_q, fi_f)
    assert np.min(_cosine(ft_q, ft_f)) > 0.99, _cosine(ft_q, ft_f)


def test_quantized_embedder_end_to_end():
    model = create_model("tiny-test")
    params = init_params(model, jax.random.PRNGKey(0))
    emb_f = Embedder(model, params, batch_size=8)
    emb_q = Embedder(model, params, batch_size=8, quantized=True)

    rng = np.random.default_rng(4)
    c = model.cfg
    images = rng.integers(
        0, 256, (13, c.vision.image_size, c.vision.image_size, 3)).astype(np.uint8)
    tokens = rng.integers(1, c.text.vocab_size - 1, (13, c.text.context_length)).astype(
        np.int32)

    fi = emb_q.embed_images(images)
    ft = emb_q.embed_tokens(tokens)
    assert fi.shape == (13, c.embed_dim) and ft.shape == (13, c.embed_dim)
    assert np.min(_cosine(fi, emb_f.embed_images(images))) > 0.99
    assert np.min(_cosine(ft, emb_f.embed_tokens(tokens))) > 0.99


def test_quantize_rejects_unsupported_block_structure():
    """Configs whose blocks carry structure the quantized forward doesn't implement
    (LayerScale, scaled-cosine attention, head scales, MoE) must be rejected at
    conversion time, not silently produce wrong embeddings."""
    import dataclasses

    import pytest

    base = create_model("tiny-test")
    params = init_params(base)
    cfg = base.cfg
    for field, value in (("ls_init_value", 1e-4), ("scaled_cosine", True),
                         ("scale_heads", True), ("moe_experts", 4)):
        bad = dataclasses.replace(cfg, vision=dataclasses.replace(cfg.vision,
                                                                  **{field: value}))
        with pytest.raises(AssertionError, match=field):
            quantize_clip_params(params, bad)
    with pytest.raises(AssertionError, match="activation"):
        quantize_clip_params(params, dataclasses.replace(cfg, act="relu"))


def test_quantized_gelu_and_gap_configs_track_f32():
    """The two cheap config extensions (act='gelu', global_average_pool) stay accurate."""
    import dataclasses

    base = create_model("tiny-test")
    cfg = dataclasses.replace(
        base.cfg, act="gelu",
        vision=dataclasses.replace(base.cfg.vision, global_average_pool=True),
    )
    from multimodal_tpu.models.clip import CLIP

    model = CLIP(cfg, dtype=jnp.float32)
    params = init_params(model)
    qp = quantize_clip_params(params, cfg)
    rng = np.random.default_rng(7)
    images = jnp.asarray(
        rng.normal(size=(5, cfg.vision.image_size, cfg.vision.image_size, 3)), jnp.float32)
    tokens = jnp.asarray(
        rng.integers(1, cfg.text.vocab_size - 1, (5, cfg.text.context_length)), jnp.int32)
    fi_q = np.asarray(encode_image_q(qp, cfg, images))
    ft_q = np.asarray(encode_text_q(qp, cfg, tokens))
    fi = np.asarray(model.apply(params, images, tokens)["image_features"])
    ft = np.asarray(model.apply(params, images, tokens)["text_features"])
    assert np.min(_cosine(fi_q, fi)) > 0.99
    assert np.min(_cosine(ft_q, ft)) > 0.99


def test_int8_dense_train_forward_tracks_matmul():
    """SwitchBack training GEMM (ops/quant.py:int8_dense_train): forward tracks the exact
    product within dynamic-int8 error; both grads flow and track the exact VJP."""
    import jax

    from multimodal_tpu.ops.quant import int8_dense_train

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(6, 48, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 96)) * 0.05, jnp.float32)

    y = np.asarray(int8_dense_train(x, w))
    y_ref = np.asarray(x @ w)
    denom = np.maximum(np.abs(y_ref), 1e-3)
    assert np.median(np.abs(y - y_ref) / denom) < 0.02
    assert np.min(_cosine(y.reshape(-1, 96), y_ref.reshape(-1, 96))) > 0.999

    def loss_q(x, w):
        return jnp.sum(jnp.sin(int8_dense_train(x, w)))

    def loss_f(x, w):
        return jnp.sum(jnp.sin(x @ w))

    gq = jax.grad(loss_q, argnums=(0, 1))(x, w)
    gf = jax.grad(loss_f, argnums=(0, 1))(x, w)
    # dx runs on the int8 path (approximate); dw is full precision against the int8
    # forward's sin' weighting — both should align direction-wise with the exact VJP
    for a, b, name in zip(gq, gf, ("dx", "dw")):
        cos = _cosine(np.asarray(a).reshape(1, -1), np.asarray(b).reshape(1, -1))
        assert cos.min() > 0.99, f"{name} diverged from the exact VJP (cos={cos.min()})"


def test_int8_forward_training_step_learns():
    """--precision int8 end to end: a tiny model trains under the SwitchBack GEMMs —
    loss finite every step and decreasing over a short rerun of the same batch."""
    import jax

    from multimodal_tpu.train import TrainState, make_optimizer, make_train_step

    model = create_model("tiny-test", int8_forward=True)
    assert model.cfg.int8_forward
    params = init_params(model)
    tx = make_optimizer(1e-3, weight_decay=0.0, grad_clip_norm=1.0)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, loss_type="clip", donate=False)
    c = model.cfg
    rng = jax.random.PRNGKey(0)
    batch = {
        "image": jax.random.normal(
            rng, (8, c.vision.image_size, c.vision.image_size, 3)),
        "text": jax.random.randint(rng, (8, c.text.context_length), 1,
                                   c.text.vocab_size - 1),
    }
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], f"no learning under int8 GEMMs: {losses}"


def test_int8_forward_composes_with_tensor_parallel():
    """--precision int8 under a ('data','model') TP mesh: GSPMD must partition the
    int8 dots (model-sharded MLP kernels) and the step must match... at least run and
    stay finite — the quantization scales are per-shard under TP (per-column weight
    scales shard cleanly; per-row activation scales are replicated row-wise)."""
    import jax

    from multimodal_tpu.parallel.tp import create_tp_mesh, shard_state, tp_state_shardings
    from multimodal_tpu.train import TrainState, make_optimizer, make_train_step

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs >= 4 devices")
    model = create_model("tiny-test", int8_forward=True)
    params = init_params(model)
    tx = make_optimizer(1e-3, grad_clip_norm=1.0)
    mesh = create_tp_mesh(len(jax.devices()) // 2, 2)
    state = TrainState.create(params, tx)
    shardings = tp_state_shardings(state, mesh)
    state = shard_state(state, mesh)
    step = make_train_step(model, tx, loss_type="clip", mesh=mesh,
                           state_shardings=shardings, donate=False)
    c = model.cfg
    rng = jax.random.PRNGKey(0)
    batch = jax.device_put(
        {
            "image": np.random.default_rng(0).standard_normal(
                (8, c.vision.image_size, c.vision.image_size, 3)).astype(np.float32),
            "text": np.random.default_rng(1).integers(
                1, c.text.vocab_size - 1, (8, c.text.context_length)).astype(np.int32),
        },
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")),
    )
    for _ in range(2):
        state, m = step(state, batch, rng)
        assert np.isfinite(float(m["loss"]))
