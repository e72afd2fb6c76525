"""SigLIP pairwise-sigmoid loss (losses/siglip_loss.py, beyond reference): the dense form
matches a hand-written reference, the ring form matches dense (values AND grads) on the
8-device mesh, the loss trains through the production engine, and the CLI guards hold."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from multimodal_tpu.losses.siglip_loss import siglip_loss
from multimodal_tpu.models import create_model, init_params
from multimodal_tpu.parallel import create_mesh, shard_batch
from multimodal_tpu.train import TrainState, make_optimizer, make_schedule, make_train_step

B, E = 32, 16


def _features(seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    img = jax.random.normal(k1, (B, E))
    txt = jax.random.normal(k2, (B, E))
    return img, txt


def _manual(img, txt, log_t, bias):
    """Direct transcription of the paper's eq: -1/B sum_ij log sigmoid(z_ij(t x.y + b)),
    using -log sigmoid(x) = log1p(exp(-x))."""
    fi = img / np.linalg.norm(img, axis=-1, keepdims=True)
    ft = txt / np.linalg.norm(txt, axis=-1, keepdims=True)
    logits = np.exp(log_t) * (fi @ ft.T) + bias
    z = 2.0 * np.eye(len(fi)) - 1.0
    return float(np.mean(np.sum(np.log1p(np.exp(-z * logits)), axis=-1)))


def test_dense_matches_manual():
    img, txt = _features()
    log_t, bias = 1.0, -3.0
    got = float(siglip_loss(img, txt, jnp.asarray(log_t), jnp.asarray(bias)))
    want = _manual(np.asarray(img), np.asarray(txt), log_t, bias)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_positive_pairs_drive_loss_down():
    # identical (normalized) towers with a hot diagonal must score lower than random ones
    img, _ = _features(1)
    aligned = float(siglip_loss(img, img, jnp.asarray(2.3), jnp.asarray(-10.0)))
    img2, txt2 = _features(2)
    random = float(siglip_loss(img2, txt2, jnp.asarray(2.3), jnp.asarray(-10.0)))
    assert aligned < random


@pytest.fixture(scope="module")
def mesh():
    return create_mesh()


def test_ring_matches_dense_on_mesh(mesh):
    img, txt = _features(3)
    log_t, bias = jnp.asarray(2.0), jnp.asarray(-5.0)
    dense = float(siglip_loss(img, txt, log_t, bias))

    def fn(i, t):
        # the loss pmeans internally: every device returns the global value
        return siglip_loss(i, t, log_t, bias, axis_name="data")

    ring = float(jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P()
    ))(img, txt))
    np.testing.assert_allclose(ring, dense, rtol=1e-5)


def test_ring_gradients_match_dense_on_mesh(mesh):
    img, txt = _features(4)

    def dense_loss(i, t, s, b):
        return siglip_loss(i, t, s, b)

    def ring_loss(i, t, s, b):
        return jax.shard_map(
            lambda a, c, s2, b2: siglip_loss(a, c, s2, b2, axis_name="data"),
            mesh=mesh, in_specs=(P("data"), P("data"), P(), P()), out_specs=P(),
        )(i, t, s, b)

    args = (img, txt, jnp.asarray(2.0), jnp.asarray(-5.0))
    g_dense = jax.grad(dense_loss, argnums=(0, 1, 2, 3))(*args)
    g_ring = jax.jit(jax.grad(ring_loss, argnums=(0, 1, 2, 3)))(*args)
    for gd, gr, name in zip(g_dense, g_ring, ["img", "txt", "scale", "bias"]):
        np.testing.assert_allclose(
            np.asarray(gr), np.asarray(gd), atol=1e-6, rtol=1e-5, err_msg=name
        )


def _batch(model, b=16):
    rng = np.random.default_rng(0)
    c = model.cfg
    return {
        "image": rng.integers(0, 256, (b, c.vision.image_size, c.vision.image_size, 3),
                              dtype=np.uint8),
        "text": rng.integers(1, c.text.vocab_size - 1, (b, c.text.context_length)).astype(
            np.int32),
    }


def test_siglip_trains_through_engine(mesh):
    model = create_model("tiny-test", siglip=True)
    params = init_params(model)
    assert float(params["params"]["logit_bias"]) == -10.0
    np.testing.assert_allclose(float(params["params"]["logit_scale"]), np.log(10.0),
                               rtol=1e-6)
    tx = make_optimizer(make_schedule("cosine", 1e-3, 2, 100), weight_decay=0.1,
                        grad_clip_norm=1.0)
    state = jax.device_put(
        TrainState.create(params, tx),
        jax.sharding.NamedSharding(mesh, P()))
    step = make_train_step(model, tx, loss_type="siglip", mesh=mesh, donate=False)
    batch = shard_batch(_batch(model), mesh)
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(6):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # the bias is learnable (moves off its init)
    assert float(state.params["params"]["logit_bias"]) != -10.0


def test_siglip_ring_step_matches_gspmd_step(mesh):
    """SigLIP through the shard_map (ring) train step reproduces the GSPMD dense step.

    SGD keeps the comparison at gradient scale — Adam's m/sqrt(v) amplifies the f32
    block-summation-order noise (~1e-7 relative) on near-zero-init leaves."""
    import optax

    model = create_model("tiny-test", siglip=True)
    params = init_params(model)
    tx = optax.sgd(0.1)
    batch = shard_batch(_batch(model), mesh)
    rng = jax.random.PRNGKey(0)

    sa = TrainState.create(params, tx)
    sb = TrainState.create(params, tx)
    step_a = make_train_step(model, tx, loss_type="siglip", mesh=mesh, donate=False)
    step_b = make_train_step(model, tx, loss_type="siglip", mesh=mesh,
                             use_shard_map=True, donate=False)
    for _ in range(2):
        sa, ma = step_a(sa, batch, rng)
        sb, mb = step_b(sb, batch, rng)
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(sa.params),
                    jax.tree_util.tree_leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_evaluate_scores_siglip_model_with_sigmoid_val_loss(mesh):
    """run.py:evaluate picks the pairwise-sigmoid val loss when the model has a
    logit_bias head (and the softmax CLIP loss otherwise)."""
    from multimodal_tpu.train.run import evaluate

    class _Args:
        pass

    model = create_model("tiny-test", siglip=True)
    params = init_params(model)
    data_val = [_batch(model, b=16)]
    m = evaluate(model, params, data_val, mesh, epoch=0, args=_Args())
    assert np.isfinite(m["val_loss"])
    # cross-check against the loss fn on the same (normalized) features
    p = params["params"]
    want = float(siglip_loss(
        *_features_from(model, params, data_val[0]),
        p["logit_scale"], p["logit_bias"], normalize=True,
    ))
    np.testing.assert_allclose(m["val_loss"], want, rtol=1e-4)


def _features_from(model, params, batch):
    from multimodal_tpu.train.engine import batch_images

    out = model.apply(params, batch_images(batch), batch["text"])
    return out["image_features"], out["text_features"]


def test_engine_rejects_siglip_without_bias_param():
    model = create_model("tiny-test")  # no logit_bias
    tx = make_optimizer(make_schedule("cosine", 1e-3, 2, 100))
    with pytest.raises(ValueError, match="logit_bias"):
        make_train_step(model, tx, loss_type="siglip", donate=False)


def test_cli_parses_siglip():
    from multimodal_tpu.train.params import parse_args

    args = parse_args(["--loss", "siglip", "--model", "tiny-test"])
    assert args.loss == "siglip"
    with pytest.raises(SystemExit):
        parse_args(["--loss", "siglip", "--model", "tiny-test", "--variational"])
    with pytest.raises(SystemExit):
        parse_args(["--loss", "siglip", "--model", "tiny-test",
                    "--accum-freq", "2", "--feature-cached-accum"])
