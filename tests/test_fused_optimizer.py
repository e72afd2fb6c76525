"""Fused AdamW must be numerically identical to the modular optax chain it replaces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.train.optimizer import extract_grad_norm, make_optimizer
from multimodal_tpu.train.schedules import make_schedule


def _params(key):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "dense": {"kernel": jax.random.normal(k1, (16, 32)), "bias": jnp.zeros(32)},
        "logit_scale": jnp.asarray(2.6),
        "emb": jax.random.normal(k3, (64, 16)) * 0.1,
    }


def _grads(key, params):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef, [jax.random.normal(k, l.shape) for k, l in zip(keys, leaves)]
    )


@pytest.mark.parametrize("clip", [None, 0.5])
def test_fused_matches_optax_chain(clip):
    sched = make_schedule("cosine", 1e-3, warmup_steps=3, total_steps=50)
    kw = dict(weight_decay=0.1, beta1=0.9, beta2=0.98, eps=1e-6,
              grad_clip_norm=clip, skip_nonfinite=True)
    tx_f = make_optimizer(sched, fused=True, **kw)
    tx_m = make_optimizer(sched, fused=False, **kw)

    params_f = _params(jax.random.PRNGKey(0))
    params_m = jax.tree_util.tree_map(jnp.copy, params_f)
    s_f, s_m = tx_f.init(params_f), tx_m.init(params_m)

    import optax

    key = jax.random.PRNGKey(1)
    for step in range(6):
        key, sub = jax.random.split(key)
        g = _grads(sub, params_f)
        if step == 3:  # a poisoned step must be skipped identically
            g = jax.tree_util.tree_map(lambda x: x * jnp.nan, g)
        u_f, s_f = tx_f.update(g, s_f, params_f)
        u_m, s_m = tx_m.update(g, s_m, params_m)
        params_f = optax.apply_updates(params_f, u_f)
        params_m = optax.apply_updates(params_m, u_m)
        for a, b in zip(jax.tree_util.tree_leaves(params_f),
                        jax.tree_util.tree_leaves(params_m)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5)

    # both report the same (non-finite on the poisoned step was visible; final is finite)
    nf = float(extract_grad_norm(s_f))
    nm = float(extract_grad_norm(s_m))
    np.testing.assert_allclose(nf, nm, rtol=1e-6)


def test_fused_skip_freezes_state():
    tx = make_optimizer(make_schedule("const", 1e-3, 0, 10), fused=True,
                        weight_decay=0.0, grad_clip_norm=1.0)
    params = _params(jax.random.PRNGKey(2))
    state = tx.init(params)
    g = _grads(jax.random.PRNGKey(3), params)
    u, state = tx.update(g, state, params)
    mu_before = jax.tree_util.tree_leaves(state.mu)[0].copy()
    count_before = int(state.count)

    bad = jax.tree_util.tree_map(lambda x: x * jnp.inf, g)
    u2, state2 = tx.update(bad, state, params)
    assert all(float(jnp.abs(x).sum()) == 0 for x in jax.tree_util.tree_leaves(u2))
    np.testing.assert_array_equal(np.asarray(jax.tree_util.tree_leaves(state2.mu)[0]),
                                  np.asarray(mu_before))
    assert int(state2.count) == count_before
    assert int(state2.notfinite_count) == 1
    assert not np.isfinite(float(state2.grad_norm))


def test_lamb_and_lars_train():
    """--opt lamb/lars (beyond reference): trust-ratio optimizers build with the same
    wd-exclusion mask and clip/skip wrappers, and drive the loss down on a toy model."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from multimodal_tpu.train import make_optimizer, make_schedule

    def loss_fn(p, x, y):
        pred = x @ p["w"] + p["b"]
        return jnp.mean((pred - y) ** 2)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 8)), jnp.float32)
    w_true = jnp.asarray(rng.normal(size=(8, 1)), jnp.float32)
    y = x @ w_true
    # step size is ~lr*||param|| for LAMB and ~lr*0.001*||param|| (trust coefficient)
    # for LARS, so each gets an in-regime LR rather than AdamW's
    for kind, lr in (("lamb", 0.3), ("lars", 3.0)):
        tx = make_optimizer(make_schedule("cosine", lr, 2, 600), weight_decay=0.01,
                            grad_clip_norm=1.0, opt=kind)
        # nonzero init: the trust ratio scales updates by ||param||, so an all-zero
        # start is the known LAMB/LARS pathology, not a representative case
        params = {"w": jnp.asarray(rng.normal(size=(8, 1)) * 0.3, jnp.float32),
                  "b": jnp.zeros((1,))}
        state = tx.init(params)
        losses = []
        for _ in range(300):
            loss, g = jax.value_and_grad(loss_fn)(params, x, y)
            updates, state = tx.update(g, state, params)
            params = optax.apply_updates(params, updates)
            losses.append(float(loss))
        assert np.all(np.isfinite(losses)), kind
        assert losses[-1] < 0.5 * losses[0], (kind, losses[0], losses[-1])

    try:
        make_optimizer(make_schedule("cosine", 1e-2, 2, 200), opt="sgd")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_bf16_state_dtype_tracks_f32():
    """--opt-state-dtype bfloat16: moments stored bf16, trajectory tracks the f32 one
    within bf16 rounding over many steps (the ViT-g/14 single-chip memory mode)."""
    sched = make_schedule("cosine", 1e-3, warmup_steps=3, total_steps=50)
    kw = dict(weight_decay=0.1, grad_clip_norm=1.0, skip_nonfinite=True)
    tx32 = make_optimizer(sched, fused=True, **kw)
    tx16 = make_optimizer(sched, fused=True, state_dtype=jnp.bfloat16, **kw)
    p32 = _params(jax.random.PRNGKey(0))
    p16 = jax.tree_util.tree_map(jnp.copy, p32)
    s32, s16 = tx32.init(p32), tx16.init(p16)
    assert s16.mu["dense"]["kernel"].dtype == jnp.bfloat16
    assert s16.nu["emb"].dtype == jnp.bfloat16
    assert s32.mu["dense"]["kernel"].dtype == jnp.float32
    import optax

    for i in range(20):
        g = _grads(jax.random.PRNGKey(100 + i), p32)
        u32, s32 = tx32.update(g, s32, p32)
        u16, s16 = tx16.update(g, s16, p16)
        p32 = optax.apply_updates(p32, u32)
        p16 = optax.apply_updates(p16, u16)
    for a, b in zip(jax.tree_util.tree_leaves(p32), jax.tree_util.tree_leaves(p16)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0.05, atol=2e-4)
    # grad norm reporting unaffected
    assert np.isfinite(float(extract_grad_norm(s16)))
