"""FSDP/ZeRO sharding (parallel/fsdp.py): params + optimizer state really shard over the
data axis, the GSPMD train step runs, and results match pure-DP replication numerically.

Torch-FSDP counterpart of the reference's DDP-only scaling (AlignCLIP/main/distributed.py).
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from multimodal_tpu.models import create_model, init_params
from multimodal_tpu.parallel import (
    create_hybrid_mesh,
    create_mesh,
    replicated_sharding,
    shard_batch,
)
from multimodal_tpu.parallel.fsdp import (
    fsdp_spec_for_leaf,
    fsdp_state_shardings,
    shard_state_fsdp,
)
from multimodal_tpu.train import TrainState, make_optimizer, make_schedule, make_train_step


def _setup():
    model = create_model("tiny-test")
    params = init_params(model)
    tx = make_optimizer(make_schedule("cosine", 1e-3, 2, 100), weight_decay=0.1,
                        grad_clip_norm=1.0)
    return model, TrainState.create(params, tx), tx


def _batch(model, b=16):
    rng = np.random.default_rng(0)
    c = model.cfg
    return {
        "image": rng.integers(0, 256, (b, c.vision.image_size, c.vision.image_size, 3),
                              dtype=np.uint8),
        "text": rng.integers(1, c.text.vocab_size - 1, (b, c.text.context_length)).astype(
            np.int32),
    }


class Leaf:
    def __init__(self, shape):
        self.shape = shape
        self.ndim = len(shape)
        self.size = int(np.prod(shape)) if shape else 1


def test_fsdp_specs():
    # largest divisible axis shards; last axis wins ties (output features of kernels)
    assert fsdp_spec_for_leaf(Leaf((64, 256)), 8, min_size=1) == P(None, "data")
    assert fsdp_spec_for_leaf(Leaf((256, 64)), 8, min_size=1) == P("data", None)
    assert fsdp_spec_for_leaf(Leaf((128, 128)), 8, min_size=1) == P(None, "data")
    # nothing divisible -> replicated
    assert fsdp_spec_for_leaf(Leaf((77, 63)), 8, min_size=1) == P()
    # small leaves stay replicated by the size floor
    assert fsdp_spec_for_leaf(Leaf((64,)), 8) == P()
    assert fsdp_spec_for_leaf(Leaf(()), 8) == P()


def test_fsdp_step_matches_dp():
    mesh = create_mesh()
    model, state_dp, tx = _setup()
    batch = _batch(model)
    rng = jax.random.PRNGKey(0)

    step_dp = make_train_step(model, tx, loss_type="clip", mesh=mesh, donate=False)
    state_dp = jax.device_put(state_dp, replicated_sharding(mesh))
    state_dp, m_dp = step_dp(state_dp, shard_batch(batch, mesh), rng)

    model, state_fs, tx = _setup()
    shardings = fsdp_state_shardings(state_fs, mesh, min_size=1024)
    state_fs = jax.device_put(state_fs, shardings)
    step_fs = make_train_step(model, tx, loss_type="clip", mesh=mesh,
                              state_shardings=shardings, donate=False)
    state_fs, m_fs = step_fs(state_fs, shard_batch(batch, mesh), rng)

    # params are REALLY sharded over the data axis — and so are the AdamW mirrors
    kernel = state_fs.params["params"]["visual_transformer"]["resblock_0"]["mlp"]["c_fc"][
        "kernel"]
    assert any(s == "data" for s in kernel.sharding.spec)
    mu_leaves = [
        leaf for leaf in jax.tree_util.tree_leaves(state_fs.opt_state)
        if hasattr(leaf, "sharding") and any(s is not None for s in leaf.sharding.spec)
    ]
    assert mu_leaves, "no sharded optimizer-state leaves"

    np.testing.assert_allclose(float(m_fs["loss"]), float(m_dp["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_fs["grad_norm"]), float(m_dp["grad_norm"]), rtol=1e-4)
    a = np.asarray(jax.device_get(state_dp.params["params"]["logit_scale"]))
    b = np.asarray(jax.device_get(state_fs.params["params"]["logit_scale"]))
    np.testing.assert_allclose(a, b, rtol=1e-5)
    # a sharded kernel's update agrees too (gathers the shards)
    ka = np.asarray(jax.device_get(
        state_dp.params["params"]["visual_transformer"]["resblock_0"]["mlp"]["c_fc"]["kernel"]))
    kb = np.asarray(jax.device_get(kernel))
    np.testing.assert_allclose(ka, kb, rtol=1e-4, atol=1e-6)


def test_fsdp_memory_actually_shrinks():
    mesh = create_mesh()
    model, state, _ = _setup()
    shardings = fsdp_state_shardings(state, mesh, min_size=1024)
    state = jax.device_put(state, shardings)
    kernel = state.params["params"]["visual_transformer"]["resblock_0"]["mlp"]["c_fc"]["kernel"]
    n = mesh.shape["data"]
    # per-device shard is 1/n of the logical array
    shard_elems = kernel.addressable_shards[0].data.size
    assert shard_elems == kernel.size // n


def test_fsdp_on_hybrid_mesh_descends():
    # shards ride the ICI 'data' axis; the DCN 'replica' axis keeps full copies
    mesh = create_hybrid_mesh(2)
    model, state, tx = _setup()
    shardings = fsdp_state_shardings(state, mesh, min_size=1024)
    state = shard_state_fsdp(state, mesh, min_size=1024)
    step = make_train_step(model, tx, loss_type="clip", mesh=mesh,
                           state_shardings=shardings, donate=False)
    batch = shard_batch(_batch(model), mesh)
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(3):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_fsdp_checkpoint_roundtrip_and_reshard(tmp_path):
    """Production elasticity: an FSDP-sharded TrainState saves through the CheckpointManager
    and restores (a) back to the same sharded layout and (b) onto a DIFFERENT topology
    (replicated template) — values identical both ways, shardings taken from the template."""
    from multimodal_tpu.train import CheckpointManager

    mesh = create_mesh()
    model, state, tx = _setup()
    shardings = fsdp_state_shardings(state, mesh, min_size=1024)
    state = jax.device_put(state, shardings)

    # move off the init point so the optimizer state is non-trivial
    step = make_train_step(model, tx, loss_type="clip", mesh=mesh,
                           state_shardings=shardings, donate=False)
    state, _ = step(state, shard_batch(_batch(model), mesh), jax.random.PRNGKey(0))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state, metadata={"epoch": 1})
    mgr.wait()

    kernel_path = lambda s: s.params["params"]["visual_transformer"]["resblock_0"]["mlp"][  # noqa: E731
        "c_fc"]["kernel"]

    # (a) restore to the sharded layout: template = abstract arrays with FSDP shardings
    template = jax.tree_util.tree_map(
        lambda x, sh: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh),
        state, shardings)
    restored, meta = mgr.restore(template)
    assert meta == {"epoch": 1}
    assert any(s == "data" for s in kernel_path(restored).sharding.spec)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(kernel_path(restored))),
        np.asarray(jax.device_get(kernel_path(state))))
    assert int(jax.device_get(restored.step)) == int(jax.device_get(state.step))

    # (b) restore the SAME checkpoint replicated (topology change on resume)
    repl_template = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(
            x.shape, x.dtype,
            sharding=jax.sharding.NamedSharding(mesh, P())),
        state)
    restored_r, _ = mgr.restore(repl_template)
    assert all(s is None for s in (kernel_path(restored_r).sharding.spec or [None]))
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(kernel_path(restored_r))),
        np.asarray(jax.device_get(kernel_path(state))))
    # and the restored replicated state can continue training
    step_r = make_train_step(model, tx, loss_type="clip", mesh=mesh, donate=False)
    restored_r, m = step_r(restored_r, shard_batch(_batch(model), mesh),
                           jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    mgr.close()
