"""Tensor parallelism over the ('data','model') mesh: params actually shard, the train step
runs, and TP results match pure-DP results numerically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from multimodal_tpu.models import create_model, init_params
from multimodal_tpu.parallel import create_mesh
from multimodal_tpu.parallel.tp import (
    MODEL_AXIS,
    create_tp_mesh,
    shard_state,
    tp_spec_for_path,
    tp_state_shardings,
)
from multimodal_tpu.train import TrainState, make_optimizer, make_schedule, make_train_step


def _setup(mesh=None, state_shardings=None, use_shard_map=False):
    model = create_model("tiny-test")
    params = init_params(model)
    tx = make_optimizer(make_schedule("cosine", 1e-3, 2, 100), weight_decay=0.1,
                        grad_clip_norm=1.0)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, loss_type="clip", mesh=mesh,
                           state_shardings=state_shardings, use_shard_map=use_shard_map,
                           donate=False)
    return model, state, step


def _batch(model, b=16):
    rng = np.random.default_rng(0)
    c = model.cfg
    return {
        "image": rng.integers(0, 256, (b, c.vision.image_size, c.vision.image_size, 3),
                              dtype=np.uint8),
        "text": rng.integers(1, c.text.vocab_size - 1, (b, c.text.context_length)).astype(
            np.int32),
    }


def test_tp_specs():
    class Leaf:
        def __init__(self, shape):
            self.shape = shape
            self.ndim = len(shape)

    path = lambda s: tuple(jax.tree_util.DictKey(k) for k in s.split("/"))  # noqa: E731
    assert tp_spec_for_path(path("params/x/mlp/c_fc/kernel"), Leaf((64, 256)), 2) == P(None, MODEL_AXIS)
    assert tp_spec_for_path(path("params/x/mlp/c_proj/kernel"), Leaf((256, 64)), 2) == P(MODEL_AXIS, None)
    assert tp_spec_for_path(path("params/x/attn/query/kernel"), Leaf((64, 64)), 2) == P(None, MODEL_AXIS)
    assert tp_spec_for_path(path("params/ln/scale"), Leaf((64,)), 2) == P()
    # non-divisible dims stay replicated
    assert tp_spec_for_path(path("params/x/mlp/c_fc/kernel"), Leaf((64, 250)), 4) == P()


def test_tp_step_matches_dp():
    # DP baseline on the full 8-device data mesh
    mesh_dp = create_mesh()
    model, state_dp, step_dp = _setup(mesh=mesh_dp)
    batch = _batch(model)
    from multimodal_tpu.parallel import replicated_sharding, shard_batch

    state_dp = jax.device_put(state_dp, replicated_sharding(mesh_dp))
    rng = jax.random.PRNGKey(0)
    state_dp, m_dp = step_dp(state_dp, shard_batch(batch, mesh_dp), rng)

    # TP on a 4x2 mesh
    mesh_tp = create_tp_mesh(4, 2)
    model, state_tp, _ = _setup()
    shardings = tp_state_shardings(state_tp, mesh_tp)
    state_tp = shard_state(state_tp, mesh_tp)
    step_tp = make_train_step(
        model, state_tp_tx := make_optimizer(make_schedule("cosine", 1e-3, 2, 100),
                                             weight_decay=0.1, grad_clip_norm=1.0),
        loss_type="clip", mesh=mesh_tp, state_shardings=shardings, donate=False,
    )
    batch_tp = jax.device_put(
        batch, jax.sharding.NamedSharding(mesh_tp, P("data"))
    )
    state_tp, m_tp = step_tp(state_tp, batch_tp, rng)

    # params are REALLY sharded on the model axis
    kernel = state_tp.params["params"]["visual_transformer"]["resblock_0"]["mlp"]["c_fc"]["kernel"]
    assert kernel.sharding.spec == P(None, MODEL_AXIS)

    np.testing.assert_allclose(float(m_tp["loss"]), float(m_dp["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_tp["grad_norm"]), float(m_dp["grad_norm"]), rtol=1e-4)
    # updated params agree
    a = np.asarray(jax.device_get(state_dp.params["params"]["logit_scale"]))
    b = np.asarray(jax.device_get(state_tp.params["params"]["logit_scale"]))
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_tp_multiple_steps_finite():
    mesh_tp = create_tp_mesh(2, 4)  # model axis 4 (some layers fall back to replicated)
    model, state, _ = _setup()
    shardings = tp_state_shardings(state, mesh_tp)
    state = shard_state(state, mesh_tp)
    tx = make_optimizer(make_schedule("cosine", 1e-3, 2, 100), weight_decay=0.1)
    step = make_train_step(model, tx, loss_type="clip", mesh=mesh_tp,
                           state_shardings=shardings, donate=False)
    batch = jax.device_put(_batch(model), jax.sharding.NamedSharding(mesh_tp, P("data")))
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(3):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # optimizing on a fixed batch must descend
