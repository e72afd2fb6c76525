"""Training engine tests: sharded steps, both accumulation forms, schedules, checkpoints,
NaN-skip. Mirrors the reference's training mechanics (main/train.py:65-239, run.py:279-317)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_tpu.models import create_model, init_params
from multimodal_tpu.parallel import create_mesh, shard_batch
from multimodal_tpu.train import (
    CheckpointManager,
    TrainState,
    make_optimizer,
    make_schedule,
    make_train_step,
)
from multimodal_tpu.train.engine import _clamp_logit_scale
from multimodal_tpu.train.optimizer import wd_mask


def make_batch(model, batch=16, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    c = model.cfg
    return {
        "image": jax.random.normal(k1, (batch, c.vision.image_size, c.vision.image_size, 3)),
        "text": jax.random.randint(k2, (batch, c.text.context_length), 1, c.text.vocab_size - 1),
    }


@pytest.fixture(scope="module")
def setup():
    model = create_model("tiny-test")
    params = init_params(model)
    sched = make_schedule("cosine", 1e-3, warmup_steps=2, total_steps=50)
    tx = make_optimizer(sched, weight_decay=0.1, grad_clip_norm=1.0)
    return model, params, sched, tx


def test_schedules():
    cos = make_schedule("cosine", 1.0, 10, 100)
    assert float(cos(0)) == pytest.approx(0.1)
    assert float(cos(9)) == pytest.approx(1.0)
    assert float(cos(100)) == pytest.approx(0.0, abs=1e-6)
    const = make_schedule("const", 1.0, 10, 100)
    assert float(const(50)) == 1.0
    cd = make_schedule("const-cooldown", 1.0, 10, 100, cooldown_steps=20)
    assert float(cd(50)) == 1.0
    assert float(cd(90)) == pytest.approx(0.5)
    assert float(cd(100)) == pytest.approx(0.0, abs=1e-6)


def test_wd_mask(setup):
    model, params, _, _ = setup
    mask = wd_mask(params)
    flat = jax.tree_util.tree_leaves_with_path(mask)
    for path, decayed in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if "logit_scale" in name or "bias" in name or "ln_" in name.lower():
            assert not decayed, name


def test_train_step_decreases_loss(setup):
    model, params, _, tx = setup
    state = TrainState.create(params, tx)
    mesh = create_mesh()
    step = make_train_step(model, tx, loss_type="clip", mesh=mesh, donate=False)
    batch = shard_batch(make_batch(model), mesh)
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(12):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 12
    assert np.isfinite(losses).all()


def test_shard_map_step_matches_jit_step(setup):
    """The explicit local_loss shard_map path must produce the same trajectory as XLA-SPMD."""
    model, params, _, tx = setup
    mesh = create_mesh()
    batch = shard_batch(make_batch(model), mesh)
    rng = jax.random.PRNGKey(0)
    step_a = make_train_step(model, tx, loss_type="clip", mesh=mesh, donate=False)
    step_b = make_train_step(
        model, tx, loss_type="clip", mesh=mesh, use_shard_map=True, donate=False
    )
    sa = TrainState.create(params, tx)
    sb = TrainState.create(params, tx)
    for _ in range(3):
        sa, ma = step_a(sa, batch, rng)
        sb, mb = step_b(sb, batch, rng)
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-4)
    la = jax.tree_util.tree_leaves(sa.params)
    lb = jax.tree_util.tree_leaves(sb.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_plain_accumulation_close_to_full_batch(setup):
    model, params, _, _ = setup
    import optax

    tx = optax.sgd(0.1)  # deterministic comparison
    batch = make_batch(model, batch=16)
    rng = jax.random.PRNGKey(0)
    full = make_train_step(model, tx, loss_type="clip", donate=False)
    accum = make_train_step(model, tx, loss_type="clip", accum_steps=4, donate=False)
    s_full, m_full = full(TrainState.create(params, tx), batch, rng)
    s_acc, m_acc = accum(TrainState.create(params, tx), batch, rng)
    # different contrastive batch size (16 vs 4x4) -> losses differ, but both step finitely
    assert np.isfinite(float(m_full["loss"])) and np.isfinite(float(m_acc["loss"]))


def test_feature_cached_accum_matches_full_batch_gradient(setup):
    """Feature-cached accumulation computes the EXACT full-batch loss and gradient
    (train.py:119-163: every micro-batch sees all others as negatives)."""
    model, params, _, _ = setup
    import optax

    tx = optax.sgd(0.1)
    batch = make_batch(model, batch=16)
    rng = jax.random.PRNGKey(0)
    full = make_train_step(model, tx, loss_type="clip", donate=False)
    fca = make_train_step(
        model, tx, loss_type="clip", accum_steps=4, feature_cached_accum=True, donate=False
    )
    s_full, m_full = full(TrainState.create(params, tx), batch, rng)
    s_fca, m_fca = fca(TrainState.create(params, tx), batch, rng)
    np.testing.assert_allclose(float(m_full["loss"]), float(m_fca["loss"]), rtol=1e-5)
    # Encoder grads are exact full-batch grads. logit_scale intentionally differs: the
    # reference backward()s each micro-batch with logit_scale live, so its gradient is
    # counted accum_freq times (train.py:144-163) — we match that semantics.
    flat_full = jax.tree_util.tree_leaves_with_path(s_full.params)
    flat_fca = jax.tree_util.tree_leaves_with_path(s_fca.params)
    for (path, a), (_, b) in zip(flat_full, flat_fca):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if "logit_scale" in name:
            continue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-5, err_msg=name
        )


def test_feature_cached_accum_rejects_sharded_contrastive(setup):
    """The cached-bank loss is dense-only; a chunked/ring/local-loss request must error,
    not silently fall back to the dense form (the memory blow-up the user opted out of)."""
    model, _, _, tx = setup
    for bad in ({"contrastive_impl": "ring"}, {"contrastive_impl": "chunked"},
                {"local_loss": True}):
        with pytest.raises(ValueError, match="feature-cached"):
            make_train_step(model, tx, loss_type="clip", loss_kwargs=bad,
                            accum_steps=4, feature_cached_accum=True, donate=False)
    # dense defaults (incl. the always-present chunk_size) stay accepted
    make_train_step(
        model, tx, loss_type="clip",
        loss_kwargs={"contrastive_impl": "dense", "local_loss": False, "chunk_size": 1024},
        accum_steps=4, feature_cached_accum=True, donate=False,
    )


def test_feature_cached_accum_collects_moe_aux_loss():
    """MoE load-balance terms must survive feature-cached accumulation (sow needs the
    mutable collection) and the router must receive a balance gradient."""
    import optax

    model = create_model("tiny-test-moe")
    params = init_params(model)
    tx = optax.sgd(0.1)
    step = make_train_step(model, tx, loss_type="clip", accum_steps=2,
                           feature_cached_accum=True, donate=False)
    batch = make_batch(model, batch=8)
    state, metrics = step(TrainState.create(params, tx), batch, jax.random.PRNGKey(0))
    assert "moe_aux_loss" in metrics and float(metrics["moe_aux_loss"]) > 0.0
    # router weights moved (aux-loss gradient flows: the contrastive loss alone gives the
    # router only the combine-weight gradient, the balance term is what spreads experts)
    r0 = params["params"]["visual_transformer"]["resblock_1"]["moe_mlp"]["router"]["kernel"]
    r1 = state.params["params"]["visual_transformer"]["resblock_1"]["moe_mlp"]["router"][
        "kernel"]
    assert not np.allclose(np.asarray(r0), np.asarray(r1))


def test_logit_scale_clamp():
    params = {"params": {"logit_scale": jnp.float32(9.0), "w": jnp.ones((2, 2))}}
    clamped = _clamp_logit_scale(params)
    assert float(clamped["params"]["logit_scale"]) == pytest.approx(4.6052)
    np.testing.assert_array_equal(np.asarray(clamped["params"]["w"]), np.ones((2, 2)))


def test_nonfinite_grads_skipped(setup):
    model, params, _, tx = setup
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, loss_type="clip", donate=False)
    batch = make_batch(model)
    bad = dict(batch)
    bad["image"] = batch["image"].at[0, 0, 0, 0].set(jnp.nan)
    state2, metrics = step(state, bad, jax.random.PRNGKey(0))
    # params unchanged under non-finite gradients (optax.apply_if_finite)
    for a, b in zip(jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vclip_train_step():
    model = create_model("tiny-test", variational=True)
    params = init_params(model)
    sched = make_schedule("cosine", 1e-3, 2, 50)
    tx = make_optimizer(sched)
    step = make_train_step(
        model,
        tx,
        loss_type="vclip",
        loss_kwargs={"num_samples": 4, "kl_weight": 10.0},
        donate=False,
    )
    state = TrainState.create(params, tx)
    batch = make_batch(model, batch=8)
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["mean_image_concentration"]) >= 10.0


def test_cloob_and_align_train_steps(setup):
    model, params, _, tx = setup
    batch = make_batch(model, batch=8)
    for loss_type, kwargs in [
        ("cloob", {"inv_tau": 30.0, "scale_hopfield": 8.0}),
        ("align", {"alpha": 1.0, "beta": 0.5}),
    ]:
        step = make_train_step(model, tx, loss_type=loss_type, loss_kwargs=kwargs, donate=False)
        state, metrics = step(TrainState.create(params, tx), batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss" if loss_type == "cloob" else "total_loss"]))


def test_checkpoint_roundtrip(setup, tmp_path):
    model, params, _, tx = setup
    state = TrainState.create(params, tx)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(1, state, metadata={"epoch": 1, "name": "test"})
    mgr.save(2, state, metadata={"epoch": 2, "name": "test"})
    mgr.save(3, state, metadata={"epoch": 3, "name": "test"})
    assert mgr.latest_step() == 3
    assert mgr.all_steps() == [2, 3]  # rotation kept last 2 (run.py:438-441 semantics)
    restored, meta = mgr.restore(state)
    assert meta["epoch"] == 3
    for a, b in zip(jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_vclip_mc_riemannian_concentration_stays_off_floor():
    """The reference's vCLIP phase ordering (trainer.ipynb kl_schedule +
    riemannian_gradient_hook): epochs below NUM_EPOCHS_TO_FULL_KL run mean-only (kl weight
    0 -> vclip_loss falls back to point InfoNCE), then MC sampling + KL + the tangent
    projection switch on. After the switch, concentrations must stay OFF the clamp floor
    instead of collapsing — the round-1 failure mode was sampling from step 0."""
    model = create_model("tiny-test", variational=True)
    params = init_params(model)
    tx = make_optimizer(make_schedule("const", 3e-3, 0, 100))
    state = TrainState.create(params, tx)
    batch = make_batch(model, batch=8)

    # phase A — mean-only warmup (kl_schedule returns 0 below the warmup threshold)
    warm = make_train_step(
        model, tx, loss_type="vclip",
        loss_kwargs={"num_samples": 4, "kl_weight": 0.0}, donate=False,
    )
    for i in range(20):
        state, metrics = warm(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["total_loss"]))

    # phase B — MC sampling + KL + riemannian projection (post-warmup regime)
    step = make_train_step(
        model, tx, loss_type="vclip",
        loss_kwargs={"num_samples": 4, "kl_weight": 0.01, "riemannian": True,
                     "var_reg_weight": 0.1},
        donate=False,
    )
    trace = []
    for i in range(45):
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
        assert np.isfinite(float(metrics["total_loss"]))
        trace.append(float(metrics["mean_image_concentration"]))
    final = trace[-1]
    floor = model.vcfg.min_concentration
    # equilibrates well off the clamp floor (measured ~200 vs floor 10) ...
    assert final > floor * 3.0, trace[::5]
    # ... and has stabilized: the last 15 steps move < 30%, i.e. no ongoing collapse
    assert final > 0.7 * trace[-15], trace[::5]


def test_riemannian_grad_is_tangent():
    """riemannian_grad's backward must return tangent cotangents: g_out . mu == 0."""
    from multimodal_tpu.ops.sphere import l2_normalize, riemannian_grad

    mu = l2_normalize(jax.random.normal(jax.random.PRNGKey(0), (4, 8)))
    v = jax.random.normal(jax.random.PRNGKey(1), (8,))

    def loss(mu):
        m = riemannian_grad(mu)
        return jnp.sum(m @ v)  # upstream grad = v broadcast, generally NOT tangent

    g = jax.grad(loss)(mu)
    radial = np.asarray(jnp.sum(g * mu, axis=-1))
    np.testing.assert_allclose(radial, 0.0, atol=1e-6)
    # forward is the identity
    np.testing.assert_allclose(np.asarray(riemannian_grad(mu)), np.asarray(mu))


def test_ema_params_track_with_warmup():
    """--model-ema: TrainState carries an EMA tree updated with TF-style decay warmup
    min(decay, (1+step)/(10+step)); a None field keeps non-EMA states unchanged."""
    import numpy as np

    from multimodal_tpu.models import create_model, init_params
    from multimodal_tpu.parallel import shard_batch

    from jax.sharding import PartitionSpec as P

    mesh = create_mesh()
    model = create_model("tiny-test")
    params = init_params(model)
    tx = make_optimizer(make_schedule("cosine", 1e-2, 2, 100))
    state = jax.device_put(TrainState.create(params, tx, ema=True),
                           jax.sharding.NamedSharding(mesh, P()))
    assert state.ema_params is not None
    step = make_train_step(model, tx, loss_type="clip", mesh=mesh, donate=False,
                           ema_decay=0.5)
    rng = np.random.default_rng(0)
    c = model.cfg
    batch = shard_batch({
        "image": rng.integers(0, 256, (16, c.vision.image_size, c.vision.image_size, 3),
                              dtype=np.uint8),
        "text": rng.integers(1, c.text.vocab_size - 1, (16, c.text.context_length)
                             ).astype(np.int32),
    }, mesh)
    key = jax.random.PRNGKey(0)

    s1, _ = step(state, batch, key)
    # step 0: effective decay = min(0.5, 1/10) = 0.1 -> ema = 0.1*old + 0.9*new
    leaf = lambda t: jax.tree_util.tree_leaves(t)[0]
    want = 0.1 * np.asarray(leaf(state.ema_params)) + 0.9 * np.asarray(leaf(s1.params))
    np.testing.assert_allclose(np.asarray(leaf(s1.ema_params)), want, rtol=1e-5)

    # EMA differs from raw params but stays close; keeps tracking on later steps
    s2, _ = step(s1, batch, key)
    assert not np.allclose(np.asarray(leaf(s2.ema_params)), np.asarray(leaf(s2.params)))
    assert np.all(np.isfinite(np.asarray(leaf(s2.ema_params))))

    # without ema the field stays None through steps
    s0 = jax.device_put(TrainState.create(params, tx),
                        jax.sharding.NamedSharding(mesh, P()))
    plain = make_train_step(model, tx, loss_type="clip", mesh=mesh, donate=False)
    s0b, _ = plain(s0, batch, key)
    assert s0b.ema_params is None


def test_wire_size_device_resize():
    """--wire-size: a batch at a smaller host resolution is bicubic-upsampled to model
    resolution inside the jitted step prolog (engine.batch_images) — the low-bandwidth
    wire format. Train step runs and matches the full-res step's SHAPES/finiteness."""
    import jax
    import numpy as np

    from multimodal_tpu.models import create_model, init_params
    from multimodal_tpu.train import TrainState, make_optimizer, make_train_step
    from multimodal_tpu.train.engine import batch_images

    model = create_model("tiny-test")
    size = model.cfg.vision.image_size
    wire = size // 2
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.integers(0, 256, (8, wire, wire, 3), dtype=np.uint8),
        "text": rng.integers(1, model.cfg.text.vocab_size - 1,
                             (8, model.cfg.text.context_length)).astype(np.int32),
    }
    # prolog resizes to model resolution — only with the EXPLICIT wire_size opt-in
    img = batch_images({"image": jax.numpy.asarray(batch["image"])}, model, wire)
    assert img.shape == (8, size, size, 3)
    # without wire_size a mismatched batch is a configuration error, not a silent
    # upsample (advisor round-4: --force-image-size must not be silently repurposed)
    import pytest

    with pytest.raises(ValueError, match="wire-size"):
        batch_images({"image": jax.numpy.asarray(batch["image"])}, model)
    # a wrong wire_size is rejected too
    with pytest.raises(ValueError, match="wire-size"):
        batch_images({"image": jax.numpy.asarray(batch["image"])}, model, wire + 4)
    # the full train step runs on the wire-format batch
    tx = make_optimizer(1e-3, grad_clip_norm=1.0)
    state = TrainState.create(init_params(model), tx)
    step = make_train_step(model, tx, loss_type="clip", donate=False, wire_size=wire)
    key = jax.random.PRNGKey(0)
    state, m = step(state, batch, key)
    assert np.isfinite(float(m["loss"]))
    # and a full-res batch still passes through untouched (with or without wire_size)
    full = batch_images(
        {"image": jax.numpy.asarray(rng.integers(0, 256, (4, size, size, 3),
                                                 dtype=np.uint8))}, model, wire)
    assert full.shape == (4, size, size, 3)


def test_force_image_size_rebuilds_model(tmp_path):
    """--force-image-size rebuilds the model AT the forced resolution (reference
    factory semantics): the pos-embed grid matches, and load_pretrained from an orbax
    checkpoint trained at the registry size bicubic-resizes the visual positional
    table (align_clip/model.py:311-343) instead of failing on shape mismatch."""
    import jax
    import numpy as np
    import pytest

    from multimodal_tpu.models import create_model, init_params
    from multimodal_tpu.models.checkpoint_interop import load_pretrained

    base = create_model("tiny-test")
    size = base.cfg.vision.image_size
    patch = base.cfg.vision.patch_size
    forced = size + 2 * patch
    model = create_model("tiny-test", force_image_size=forced)
    assert model.cfg.vision.image_size == forced
    grid = (forced // patch) ** 2 + 1
    params = init_params(model)
    assert params["params"]["visual_stem"]["positional_embedding"].shape[0] == grid
    with pytest.raises(ValueError, match="multiple"):
        create_model("tiny-test", force_image_size=size + 1)

    # orbax checkpoint at registry size loads into the forced-size model
    import orbax.checkpoint as ocp

    bparams = init_params(base, jax.random.PRNGKey(3))
    ckpt_dir = tmp_path / "base_ckpt"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(ckpt_dir.resolve()), jax.tree_util.tree_map(np.asarray, bparams))
    ckptr.wait_until_finished()
    loaded = load_pretrained(str(ckpt_dir),
                             jax.tree_util.tree_map(np.asarray, params), model.cfg)
    pe = loaded["params"]["visual_stem"]["positional_embedding"]
    assert np.shape(pe)[0] == grid
    # non-positional weights come through bit-exact
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["text_projection"]),
        np.asarray(bparams["params"]["text_projection"]))
