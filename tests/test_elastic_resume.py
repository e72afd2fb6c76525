"""Elastic resume: a checkpoint written under one mesh topology restores under another.

Production TPU jobs get rescheduled onto different slice shapes; because restore goes
through a host-side template and the state is re-placed with the NEW run's shardings
(train/run.py resume path), a checkpoint is topology-free. The reference has no analog
(single-node DDP resume only, run.py:300-317). These tests pin that guarantee: save under
FSDP on 8 devices, resume replicated on 4 and tensor-parallel on 4, bit-identical state,
and the step function runs finite on the new mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tpu.models import create_model, init_params
from multimodal_tpu.parallel import create_mesh, replicated_sharding, shard_batch
from multimodal_tpu.parallel.fsdp import fsdp_state_shardings, shard_state_fsdp
from multimodal_tpu.train import (
    CheckpointManager,
    TrainState,
    make_optimizer,
    make_schedule,
    make_train_step,
)


def _batch(model, b):
    rng = np.random.default_rng(0)
    c = model.cfg
    return {
        "image": rng.integers(0, 256, (b, c.vision.image_size, c.vision.image_size, 3),
                              dtype=np.uint8),
        "text": rng.integers(1, c.text.vocab_size - 1,
                             (b, c.text.context_length)).astype(np.int32),
    }


def test_fsdp8_checkpoint_resumes_on_smaller_meshes(tmp_path):
    model = create_model("tiny-test")
    tx = make_optimizer(make_schedule("cosine", 1e-3, 2, 100), weight_decay=0.1,
                        grad_clip_norm=1.0)

    # --- job 1: FSDP over all 8 devices, one step, checkpoint
    mesh8 = create_mesh()
    state = TrainState.create(init_params(model), tx)
    fs_shardings = fsdp_state_shardings(state, mesh8, min_size=128)
    state = shard_state_fsdp(state, mesh8, min_size=128)
    step8 = make_train_step(model, tx, loss_type="clip", mesh=mesh8,
                            state_shardings=fs_shardings, donate=False)
    state, m8 = step8(state, shard_batch(_batch(model, 16), mesh8), jax.random.PRNGKey(0))
    assert np.isfinite(float(m8["loss"]))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, jax.device_get(state), metadata={"epoch": 0})
    saved = jax.device_get(state)

    # --- job 2: resume REPLICATED on a 4-device mesh (different device count)
    mesh4 = create_mesh(devices=jax.devices()[:4])
    template = jax.device_get(TrainState.create(init_params(model), tx))
    restored, meta = mgr.restore(template)
    assert meta == {"epoch": 0}
    r4 = jax.device_put(restored, replicated_sharding(mesh4))
    for a, b in zip(jax.tree_util.tree_leaves(saved.params),
                    jax.tree_util.tree_leaves(jax.device_get(r4).params)):
        np.testing.assert_array_equal(a, b)
    assert int(jax.device_get(r4.step)) == 1

    step4 = make_train_step(model, tx, loss_type="clip", mesh=mesh4, donate=False)
    r4, m4 = step4(r4, shard_batch(_batch(model, 8), mesh4), jax.random.PRNGKey(1))
    assert np.isfinite(float(m4["loss"]))
    assert int(jax.device_get(r4.step)) == 2

    # --- job 3: resume TENSOR-PARALLEL on a (2 data, 2 model) mesh
    from multimodal_tpu.parallel.tp import create_tp_mesh, tp_state_shardings

    tp_mesh = create_tp_mesh(2, 2, devices=jax.devices()[:4])
    shardings = tp_state_shardings(restored, tp_mesh)
    rtp = jax.device_put(restored, shardings)
    for a, b in zip(jax.tree_util.tree_leaves(saved.params),
                    jax.tree_util.tree_leaves(jax.device_get(rtp).params)):
        np.testing.assert_array_equal(a, b)

    tp_step = make_train_step(model, tx, loss_type="clip", mesh=tp_mesh,
                              state_shardings=shardings, donate=False)
    tp_batch = jax.device_put(
        _batch(model, 8),
        jax.sharding.NamedSharding(tp_mesh, jax.sharding.PartitionSpec("data")))
    rtp, mtp = tp_step(rtp, tp_batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(mtp["loss"]))

    # identical inputs through the two resumed topologies agree
    np.testing.assert_allclose(float(m4["loss"]), float(mtp["loss"]), atol=1e-5)
