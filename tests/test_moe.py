"""MoE MLP + expert parallelism (models/moe.py, parallel/ep.py): routing algebra is exact,
a single-expert MoE equals the dense MLP, EP-sharded training matches replicated training,
and the MoE CLIP config trains through the production engine with the aux loss collected."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_tpu.models import create_model, init_params
from multimodal_tpu.models.layers import MLP, quick_gelu
from multimodal_tpu.models.moe import MoEMLP, load_balance_loss
from multimodal_tpu.parallel import create_mesh, replicated_sharding, shard_batch
from multimodal_tpu.parallel.ep import (
    create_ep_mesh,
    ep_state_shardings,
    shard_state_ep,
)
from multimodal_tpu.train import TrainState, make_optimizer, make_schedule, make_train_step


def test_single_expert_equals_dense_mlp():
    """E=1 routes every token to the one expert with gate 1.0 -> must equal the MLP."""
    b, s, w = 4, 6, 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, s, w)), jnp.float32)

    moe = MoEMLP(w, num_experts=1, expansion=2.0, act=quick_gelu, capacity_factor=2.0)
    mv = moe.init(jax.random.PRNGKey(0), x)
    y_moe = moe.apply(mv, x)

    dense = MLP(w, expansion=2.0, act=quick_gelu)
    dv = dense.init(jax.random.PRNGKey(0), x)
    # transplant the expert-0 weights into the dense layout
    p = jax.device_get(mv["params"])
    dv = {
        "params": {
            "c_fc": {"kernel": p["w1"][0], "bias": p["b1"][0]},
            "c_proj": {"kernel": p["w2"][0], "bias": p["b2"][0]},
        }
    }
    y_dense = dense.apply(dv, x)
    np.testing.assert_allclose(np.asarray(y_moe), np.asarray(y_dense), rtol=1e-5, atol=1e-6)


def test_capacity_drop_zeroes_overflow():
    """capacity 1 per expert: at most E tokens survive, the rest return exactly zero."""
    b, s, w, e = 1, 16, 8, 2
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(b, s, w)), jnp.float32)
    # capacity = max(1, int(cf * t * k / e)) with cf tiny -> 1
    moe = MoEMLP(w, num_experts=e, expansion=1.0, capacity_factor=1e-9)
    mv = moe.init(jax.random.PRNGKey(0), x)
    y = np.asarray(moe.apply(mv, x)).reshape(s, w)
    nonzero_rows = np.sum(np.any(y != 0.0, axis=-1))
    assert nonzero_rows <= e


def test_top2_gates_renormalized():
    b, s, w, e = 2, 8, 8, 4
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(b, s, w)), jnp.float32)
    moe = MoEMLP(w, num_experts=e, expansion=1.0, top_k=2, capacity_factor=4.0)
    mv = moe.init(jax.random.PRNGKey(0), x)
    y = moe.apply(mv, x)
    assert np.all(np.isfinite(np.asarray(y)))
    # grads flow to every expert stack leaf
    g = jax.grad(lambda v: jnp.sum(jnp.square(moe.apply(v, x))))(mv)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_load_balance_loss_uniform_is_one():
    t, e = 64, 8
    probs = jnp.full((t, e), 1.0 / e)
    # perfectly uniform hard assignment: t/e tokens per expert
    mask = jnp.asarray(np.eye(e)[np.arange(t) % e], jnp.float32)
    val = float(load_balance_loss(probs, mask))
    np.testing.assert_allclose(val, 1.0, rtol=1e-6)


def _moe_batch(model, b=16, seed=0):
    rng = np.random.default_rng(seed)
    c = model.cfg
    return {
        "image": rng.integers(0, 256, (b, c.vision.image_size, c.vision.image_size, 3),
                              dtype=np.uint8),
        "text": rng.integers(1, c.text.vocab_size - 1, (b, c.text.context_length)).astype(
            np.int32),
    }


def test_moe_clip_trains_with_aux_loss():
    model = create_model("tiny-test-moe")
    params = init_params(model)
    # the MoE expert stacks exist on every other vision block only
    vt = params["params"]["visual_transformer"]
    assert "moe_mlp" in vt["resblock_1"] and "mlp" in vt["resblock_0"]
    assert vt["resblock_1"]["moe_mlp"]["w1"].shape[0] == 4

    tx = make_optimizer(make_schedule("cosine", 1e-3, 2, 100), weight_decay=0.1)
    mesh = create_mesh()
    state = jax.device_put(TrainState.create(params, tx), replicated_sharding(mesh))
    step = make_train_step(model, tx, loss_type="clip", mesh=mesh, donate=False)
    batch = shard_batch(_moe_batch(model), mesh)
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(3):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert float(m["moe_aux_loss"]) > 0.0


def test_ep_step_matches_replicated():
    model = create_model("tiny-test-moe")
    params = init_params(model)
    mk_tx = lambda: make_optimizer(  # noqa: E731
        make_schedule("cosine", 1e-3, 2, 100), weight_decay=0.1, grad_clip_norm=1.0)
    batch = _moe_batch(model)
    rng = jax.random.PRNGKey(0)

    mesh_dp = create_mesh()
    tx = mk_tx()
    state_dp = jax.device_put(TrainState.create(params, tx), replicated_sharding(mesh_dp))
    step_dp = make_train_step(model, tx, loss_type="clip", mesh=mesh_dp, donate=False)
    state_dp, m_dp = step_dp(state_dp, shard_batch(batch, mesh_dp), rng)

    mesh_ep = create_ep_mesh(2, 4)
    tx = mk_tx()
    state_ep = TrainState.create(params, tx)
    shardings = ep_state_shardings(state_ep, mesh_ep)
    state_ep = shard_state_ep(state_ep, mesh_ep)
    step_ep = make_train_step(model, tx, loss_type="clip", mesh=mesh_ep,
                              state_shardings=shardings, donate=False)
    batch_ep = jax.device_put(batch, NamedSharding(mesh_ep, P("data")))
    state_ep, m_ep = step_ep(state_ep, batch_ep, rng)

    # expert stacks are REALLY sharded over the expert axis
    w1 = state_ep.params["params"]["visual_transformer"]["resblock_1"]["moe_mlp"]["w1"]
    assert w1.sharding.spec[0] == "expert"

    np.testing.assert_allclose(float(m_ep["loss"]), float(m_dp["loss"]), rtol=1e-5)
    a = np.asarray(jax.device_get(state_dp.params["params"]["visual_transformer"]
                                  ["resblock_1"]["moe_mlp"]["w1"]))
    b = np.asarray(jax.device_get(w1))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)
