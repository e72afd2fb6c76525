"""Pipeline parallelism (parallel/pp.py): the GPipe schedule reproduces sequential block
application exactly, and the pipelined CLIP train step matches the DP step numerically."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from multimodal_tpu.models import add_model_config, create_model, init_params
from multimodal_tpu.parallel import create_mesh, replicated_sharding, shard_batch
from multimodal_tpu.parallel.pp import (
    create_pp_mesh,
    from_pipeline_params,
    make_pp_train_step,
    pipeline_blocks,
    pp_state_shardings,
    stack_block_params,
    to_pipeline_params,
    unstack_block_params,
)
from multimodal_tpu.train import TrainState, make_optimizer, make_schedule, make_train_step


def test_stack_unstack_roundtrip():
    rng = np.random.default_rng(0)
    tower = {
        f"resblock_{i}": {"w": jnp.asarray(rng.normal(size=(4, 4))),
                          "b": jnp.asarray(rng.normal(size=(4,)))}
        for i in range(4)
    }
    tower["ln"] = {"scale": jnp.ones((4,))}
    stacked, rest = stack_block_params(tower)
    assert stacked["w"].shape == (4, 4, 4)
    assert list(rest) == ["ln"]
    back = unstack_block_params(stacked)
    for i in range(4):
        np.testing.assert_array_equal(back[f"resblock_{i}"]["w"], tower[f"resblock_{i}"]["w"])


@pytest.mark.parametrize("stages,micro", [(2, 2), (4, 4), (8, 2), (1, 3)])
def test_pipeline_matches_sequential(stages, micro):
    """y = blocks applied in order == pipelined result, for several stage/microbatch splits."""
    n_layers, b, s, w = 8, 12, 4, 16
    rng = np.random.default_rng(1)
    blocks = {
        "w": jnp.asarray(rng.normal(size=(n_layers, w, w)) * 0.3, jnp.float32),
        "b": jnp.asarray(rng.normal(size=(n_layers, w)) * 0.1, jnp.float32),
    }
    x = jnp.asarray(rng.normal(size=(b, s, w)), jnp.float32)

    def block_apply(bp, x):
        return jnp.tanh(x @ bp["w"] + bp["b"])

    # sequential reference
    y_ref = x
    for i in range(n_layers):
        y_ref = block_apply(jax.tree_util.tree_map(lambda v, i=i: v[i], blocks), y_ref)

    devs = np.asarray(jax.devices()[:stages])
    mesh = Mesh(devs.reshape(stages), ("stage",))
    mb = b // micro

    def run(blocks, x):
        x_mb = x.reshape(micro, mb, s, w)
        out = pipeline_blocks(block_apply, blocks, x_mb)
        return out.reshape(b, s, w)

    y_pp = jax.jit(
        jax.shard_map(run, mesh=mesh, in_specs=(P("stage"), P()), out_specs=P())
    )(blocks, x)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref), rtol=1e-5, atol=1e-6)


def test_pipeline_grads_match_sequential():
    n_layers, b, s, w, micro = 4, 8, 4, 16, 2
    rng = np.random.default_rng(2)
    blocks = {"w": jnp.asarray(rng.normal(size=(n_layers, w, w)) * 0.3, jnp.float32)}
    x = jnp.asarray(rng.normal(size=(b, s, w)), jnp.float32)

    def block_apply(bp, x):
        return jnp.tanh(x @ bp["w"])

    def seq_loss(blocks, x):
        y = x
        for i in range(n_layers):
            y = block_apply(jax.tree_util.tree_map(lambda v, i=i: v[i], blocks), y)
        return jnp.mean(jnp.square(y))

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("stage",))

    def pp_loss(blocks, x):
        out = jax.shard_map(
            lambda bl, xx: pipeline_blocks(block_apply, bl, xx.reshape(micro, b // micro, s, w)),
            mesh=mesh, in_specs=(P("stage"), P()), out_specs=P(),
        )(blocks, x)
        return jnp.mean(jnp.square(out.reshape(b, s, w)))

    g_seq = jax.grad(seq_loss)(blocks, x)
    g_pp = jax.jit(jax.grad(pp_loss))(blocks, x)
    np.testing.assert_allclose(np.asarray(g_pp["w"]), np.asarray(g_seq["w"]),
                               rtol=1e-5, atol=1e-6)


add_model_config(
    "tiny-test-gap",  # mean-pool variant: the pp step must reproduce _pool_image exactly
    {
        "embed_dim": 64,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 64, "patch_size": 16,
                       "heads": 2, "global_average_pool": True},
        "text_cfg": {"context_length": 16, "vocab_size": 1000, "width": 64, "heads": 2,
                     "layers": 2},
    },
)


@pytest.mark.parametrize("model_name", ["tiny-test", "tiny-test-gap"])
def test_pp_train_step_matches_dp(model_name):
    """Full pipelined CLIP train step == DP train step: loss and updated params
    (CLS pooling and global-average pooling)."""
    model = create_model(model_name)
    params = init_params(model)
    mk_tx = lambda: make_optimizer(  # noqa: E731
        make_schedule("cosine", 1e-3, 2, 100), weight_decay=0.1, grad_clip_norm=1.0)

    rng_np = np.random.default_rng(0)
    c = model.cfg
    b = 16
    batch = {
        "image": rng_np.integers(0, 256, (b, c.vision.image_size, c.vision.image_size, 3),
                                 dtype=np.uint8),
        "text": rng_np.integers(1, c.text.vocab_size - 1,
                                (b, c.text.context_length)).astype(np.int32),
    }
    rng = jax.random.PRNGKey(0)

    # DP baseline (local_loss shard_map form — the same loss semantics pp uses)
    mesh_dp = create_mesh()
    tx = mk_tx()
    state_dp = jax.device_put(TrainState.create(params, tx), replicated_sharding(mesh_dp))
    step_dp = make_train_step(model, tx, loss_type="clip", mesh=mesh_dp,
                              use_shard_map=True, donate=False)
    state_dp, m_dp = step_dp(state_dp, shard_batch(batch, mesh_dp), rng)

    # pipelined: ('data'=4, 'stage'=2) mesh, tiny-test has 2 blocks per tower
    mesh_pp = create_pp_mesh(4, 2)
    tx = mk_tx()
    pp_params = to_pipeline_params(params)
    state_pp = TrainState.create(pp_params, tx)
    state_pp = jax.device_put(state_pp, pp_state_shardings(state_pp, mesh_pp))
    step_pp = make_pp_train_step(model, tx, mesh=mesh_pp, num_microbatches=2)
    batch_pp = jax.device_put(batch, jax.sharding.NamedSharding(mesh_pp, P("data")))
    state_pp, m_pp = step_pp(state_pp, batch_pp, rng)

    # stacked block leaves are REALLY stage-sharded
    wv = state_pp.params["params"]["visual_blocks"]["mlp"]["c_fc"]["kernel"]
    assert wv.sharding.spec[0] == "stage"

    np.testing.assert_allclose(float(m_pp["loss"]), float(m_dp["loss"]), rtol=1e-5)

    # updated params agree after unstacking
    up_pp = from_pipeline_params(jax.device_get(state_pp.params))
    up_dp = jax.device_get(state_dp.params)
    for leaf_path in [
        ("visual_transformer", "resblock_1", "mlp", "c_fc", "kernel"),
        ("text_transformer", "resblock_0", "attn", "query", "kernel"),
        ("visual_projection",),
        ("logit_scale",),
    ]:
        a, bb = up_dp["params"], up_pp["params"]
        for k in leaf_path:
            a, bb = a[k], bb[k]
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=2e-5, atol=1e-7,
                                   err_msg=str(leaf_path))


def test_pp_descends_on_fixed_batch():
    model = create_model("tiny-test")
    tx = make_optimizer(make_schedule("cosine", 1e-2, 2, 100), weight_decay=0.1)
    mesh = create_pp_mesh(2, 2)
    pp_params = to_pipeline_params(init_params(model))
    state = TrainState.create(pp_params, tx)
    state = jax.device_put(state, pp_state_shardings(state, mesh))
    step = make_pp_train_step(model, tx, mesh=mesh, num_microbatches=2)
    rng_np = np.random.default_rng(3)
    c = model.cfg
    batch = jax.device_put(
        {
            "image": rng_np.integers(0, 256, (8, c.vision.image_size, c.vision.image_size, 3),
                                     dtype=np.uint8),
            "text": rng_np.integers(1, c.text.vocab_size - 1,
                                    (8, c.text.context_length)).astype(np.int32),
        },
        jax.sharding.NamedSharding(mesh, P("data")),
    )
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(3):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_pp_step_preserves_and_updates_ema():
    """A state created with ema=True keeps (and decays) ema_params through the pp step."""
    model = create_model("tiny-test")
    tx = make_optimizer(make_schedule("cosine", 1e-2, 2, 100), weight_decay=0.1)
    mesh = create_pp_mesh(2, 2)
    state = TrainState.create(to_pipeline_params(init_params(model)), tx, ema=True)
    state = jax.device_put(state, pp_state_shardings(state, mesh))
    step = make_pp_train_step(model, tx, mesh=mesh, num_microbatches=2, ema_decay=0.9)
    rng_np = np.random.default_rng(5)
    c = model.cfg
    batch = jax.device_put(
        {
            "image": rng_np.integers(
                0, 256, (8, c.vision.image_size, c.vision.image_size, 3), dtype=np.uint8),
            "text": rng_np.integers(
                1, c.text.vocab_size - 1, (8, c.text.context_length)).astype(np.int32),
        },
        jax.sharding.NamedSharding(mesh, P("data")),
    )
    before = jax.device_get(state.ema_params)
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    assert state.ema_params is not None
    after = jax.device_get(state.ema_params)
    new_p = jax.device_get(state.params)
    # EMA moved off its init and tracks the debiased schedule d = min(0.9, 1/10)
    leaf = lambda t: np.asarray(  # noqa: E731
        t["params"]["visual_blocks"]["mlp"]["c_fc"]["kernel"])
    d = min(0.9, 1.0 / 10.0)
    np.testing.assert_allclose(
        leaf(after), d * leaf(before) + (1 - d) * leaf(new_p), rtol=1e-5, atol=1e-7)


def test_pp_step_rejects_moe_trunks():
    model = create_model("tiny-test-moe")
    tx = make_optimizer(make_schedule("cosine", 1e-2, 2, 100))
    mesh = create_pp_mesh(2, 2)
    with pytest.raises(AssertionError, match="MoE"):
        make_pp_train_step(model, tx, mesh=mesh)
