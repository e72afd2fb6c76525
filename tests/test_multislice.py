"""Multi-slice ('replica','data') hybrid-mesh training (SURVEY §7: DCN-aware extension).

On the 8-virtual-device CPU mesh a 2x4 hybrid mesh must reproduce the flat 8-way
data-parallel step exactly — same loss, same updated params — for both the GSPMD and the
shard_map (local_loss) paths, proving the replica axis composes with every collective.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.models import create_model, init_params
from multimodal_tpu.parallel import (
    batch_axes, create_hybrid_mesh, create_mesh, shard_batch,
)
from multimodal_tpu.train import TrainState, make_optimizer, make_train_step

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _run_steps(mesh, use_shard_map, n_steps=2):
    model = create_model("tiny-test")
    params = init_params(model, jax.random.PRNGKey(0))
    tx = make_optimizer(1e-3, weight_decay=0.1, grad_clip_norm=1.0)
    state = TrainState.create(params, tx)
    state = jax.device_put(state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    step = make_train_step(model, tx, loss_type="clip", mesh=mesh,
                           use_shard_map=use_shard_map, donate=False)
    rng = np.random.default_rng(0)
    c = model.cfg
    batch = {
        "image": rng.integers(0, 256, (16, c.vision.image_size, c.vision.image_size, 3),
                              dtype=np.uint8),
        "text": rng.integers(1, c.text.vocab_size - 1, (16, c.text.context_length)).astype(
            np.int32),
    }
    dev = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(n_steps):
        state, m = step(state, dev, key)
        losses.append(float(m["loss"]))
    return losses, jax.device_get(state.params)


@pytest.mark.parametrize("use_shard_map", [False, True])
def test_hybrid_mesh_matches_flat_data_parallel(use_shard_map):
    flat = create_mesh()                      # (8,) 'data'
    hybrid = create_hybrid_mesh(num_slices=2)  # (2,4) 'replica','data'
    assert batch_axes(hybrid) == ("replica", "data")

    losses_a, params_a = _run_steps(flat, use_shard_map)
    losses_b, params_b = _run_steps(hybrid, use_shard_map)
    np.testing.assert_allclose(losses_a, losses_b, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params_a), jax.tree_util.tree_leaves(params_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_ring_contrastive_over_hybrid_mesh():
    """lax.ppermute composes with the ('replica','data') axis tuple: the ring-streamed
    contrastive loss runs on a hybrid mesh and stays finite."""
    mesh = create_hybrid_mesh(num_slices=2)
    model = create_model("tiny-test")
    params = init_params(model, jax.random.PRNGKey(0))
    tx = make_optimizer(1e-3)
    state = TrainState.create(params, tx)
    state = jax.device_put(state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    step = make_train_step(model, tx, loss_type="clip",
                           loss_kwargs={"contrastive_impl": "ring"},
                           mesh=mesh, use_shard_map=True, donate=False)
    rng = np.random.default_rng(0)
    c = model.cfg
    batch = shard_batch({
        "image": rng.integers(0, 256, (16, c.vision.image_size, c.vision.image_size, 3),
                              dtype=np.uint8),
        "text": rng.integers(1, c.text.vocab_size - 1, (16, c.text.context_length)).astype(
            np.int32),
    }, mesh)
    state, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
