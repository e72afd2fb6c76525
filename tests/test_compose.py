"""Composed FSDP x TP 2-D sharding (parallel/compose.py): spec structure + train-step
parity vs the replicated dense step on the 8-device CPU mesh (round-5: real multi-chip
runs compose axes; isolated-axis parity is necessary but not sufficient)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from multimodal_tpu.models import create_model, init_params
from multimodal_tpu.parallel import shard_batch
from multimodal_tpu.parallel.compose import (
    fsdp_tp_state_shardings,
    shard_state_fsdp_tp,
)
from multimodal_tpu.parallel.tp import create_tp_mesh
from multimodal_tpu.train import TrainState, make_optimizer, make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)


def _setup(model_axis):
    model = create_model("tiny-test-shared", dtype=jnp.float32)
    params = init_params(model)
    tx = make_optimizer(1e-3, grad_clip_norm=1.0)
    mesh = create_tp_mesh(8 // model_axis, model_axis)
    return model, params, tx, mesh


def test_fsdp_tp_specs_are_2d():
    """TP-ruled kernels pick up BOTH axes (model on the TP dim, data on the largest free
    dim); non-TP large leaves get plain FSDP; small leaves stay replicated."""
    model, params, tx, mesh = _setup(4)
    state = TrainState.create(params, tx)
    sh = fsdp_tp_state_shardings(state, mesh, min_size=1024)
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): s
        for path, s in jax.tree_util.tree_flatten_with_path(sh.params)[0]
    }
    fc = next(s for k, s in flat.items() if "mlp/c_fc/kernel" in k)
    assert tuple(fc.spec) == ("data", "model"), fc.spec
    proj = next(s for k, s in flat.items() if "mlp/c_proj/kernel" in k)
    assert tuple(proj.spec) == ("model", "data"), proj.spec
    # token embedding: no TP rule, large -> plain FSDP on one axis
    emb = next(s for k, s in flat.items() if "token_embedding" in k)
    assert "data" in tuple(emb.spec) and "model" not in tuple(emb.spec)
    # LayerNorm scale: small -> replicated
    ln = next(s for k, s in flat.items() if "scale" in k and "ln" in k.lower())
    assert tuple(ln.spec) == ()
    # optimizer mirrors inherit the same 2-D specs
    opt_specs = [tuple(s.spec) for _, s in jax.tree_util.tree_flatten_with_path(
        sh.opt_state)[0] if hasattr(s, "spec")]
    assert any(sp == ("data", "model") for sp in opt_specs)


def test_fsdp_tp_step_parity():
    """One composed-sharded train step == the replicated dense step (loss, params)."""
    model, params, tx, mesh = _setup(2)
    state = TrainState.create(params, tx)
    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    c = model.cfg
    b = 16
    batch = {
        "image": np.asarray(jax.random.normal(
            k1, (b, c.vision.image_size, c.vision.image_size, 3))),
        "text": np.asarray(jax.random.randint(
            k2, (b, c.text.context_length), 1, c.text.vocab_size - 1)),
    }
    dense_state = jax.device_put(
        state, jax.sharding.NamedSharding(mesh, P()))
    dense_step = make_train_step(model, tx, loss_type="clip", mesh=mesh, donate=False)
    dbatch = jax.device_put(batch, jax.sharding.NamedSharding(mesh, P("data")))
    d_state, d_metrics = dense_step(dense_state, dbatch, rng)

    sh = fsdp_tp_state_shardings(state, mesh, min_size=1024)
    c_state = shard_state_fsdp_tp(state, mesh, min_size=1024)
    c_step = make_train_step(model, tx, loss_type="clip", mesh=mesh,
                             state_shardings=sh, donate=False)
    c_state, c_metrics = c_step(c_state, dbatch, rng)
    np.testing.assert_allclose(float(c_metrics["loss"]), float(d_metrics["loss"]),
                               rtol=1e-5)
    # post-step params agree leaf-for-leaf (gather the sharded ones)
    for (pa, a), (_, bb) in zip(
        jax.tree_util.tree_flatten_with_path(jax.device_get(c_state.params))[0],
        jax.tree_util.tree_flatten_with_path(jax.device_get(d_state.params))[0],
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=2e-5,
                                   err_msg=str(pa))
