"""Optimizer-state host offload (parallel/offload.py): sharding-tree structure on any
backend; execution parity runs on the real chip only (the CPU backend has no
device-placement custom call — see offload.py docstring)."""

import jax
import numpy as np
import pytest

from multimodal_tpu.models import create_model, init_params
from multimodal_tpu.parallel import create_mesh
from multimodal_tpu.parallel.offload import offload_state_shardings
from multimodal_tpu.train import TrainState, make_optimizer


def test_offload_sharding_tree_structure():
    model = create_model("tiny-test")
    tx = make_optimizer(1e-3, grad_clip_norm=1.0)
    state = TrainState.create(init_params(model), tx)
    mesh = create_mesh()
    sh = offload_state_shardings(state, mesh)
    # same pytree structure as the state itself
    assert (jax.tree_util.tree_structure(jax.tree_util.tree_map(lambda _: 0, state))
            == jax.tree_util.tree_structure(jax.tree_util.tree_map(lambda _: 0, sh)))
    # moments pinned to host, everything else default device memory
    mus = jax.tree_util.tree_leaves(sh.opt_state.mu)
    nus = jax.tree_util.tree_leaves(sh.opt_state.nu)
    assert mus and all(s.memory_kind == "pinned_host" for s in mus + nus)
    others = jax.tree_util.tree_leaves(sh.params) + [sh.step]
    assert all(s.memory_kind in (None, "device") for s in others)


@pytest.mark.skipif(jax.devices()[0].platform != "tpu",
                    reason="memory-kind placement needs the TPU backend")
def test_offload_step_parity_on_tpu():
    from multimodal_tpu.parallel import shard_batch
    from multimodal_tpu.parallel.offload import shard_state_offload
    from multimodal_tpu.train import make_train_step

    model = create_model("tiny-test", dtype=np.float32)
    tx = make_optimizer(1e-3, grad_clip_norm=1.0)
    mesh = create_mesh()
    state_off = shard_state_offload(TrainState.create(init_params(model), tx), mesh)
    sh = offload_state_shardings(state_off, mesh)
    step_off = make_train_step(model, tx, loss_type="clip", mesh=mesh,
                               state_shardings=sh, donate=False,
                               offload_opt_state=True)
    state_ref = jax.device_put(
        TrainState.create(init_params(model), tx),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    step_ref = make_train_step(model, tx, loss_type="clip", mesh=mesh, donate=False)
    c = model.cfg
    rng = jax.random.PRNGKey(0)
    batch = shard_batch({
        "image": np.random.default_rng(0).standard_normal(
            (8, c.vision.image_size, c.vision.image_size, 3)).astype(np.float32),
        "text": np.random.default_rng(1).integers(
            1, c.text.vocab_size - 1, (8, c.text.context_length)).astype(np.int32),
    }, mesh)
    for _ in range(3):
        state_off, mo = step_off(state_off, batch, rng)
        state_ref, mr = step_ref(state_ref, batch, rng)
        assert abs(float(mo["loss"]) - float(mr["loss"])) < 1e-5
    pa = jax.tree_util.tree_leaves(jax.device_get(state_off.params))
    pb = jax.tree_util.tree_leaves(jax.device_get(state_ref.params))
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(a, b, atol=1e-6)
