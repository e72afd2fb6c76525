"""Fused MLP-branch kernel (ops/block_mlp.py) vs the plain-XLA composition.

Reference semantics: the residual block's MLP half (align_clip/transformer.py:214-223),
y = x + c_proj(act(c_fc(LN(x)))). Values and ALL seven gradients must match."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.ops.block_mlp import block_mlp
from multimodal_tpu.ops.block_attention import _ln_rows


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _gelu(x):
    return jax.nn.gelu(x, approximate=True)


def _make_inputs(key, b, s, w, h, dtype):
    ks = jax.random.split(key, 7)
    x = jax.random.normal(ks[0], (b, s, w), dtype)
    w1 = jax.random.normal(ks[1], (w, h), dtype) * (w ** -0.5)
    b1 = jax.random.normal(ks[2], (h,), dtype) * 0.02
    w2 = jax.random.normal(ks[3], (h, w), dtype) * (h ** -0.5)
    b2 = jax.random.normal(ks[4], (w,), dtype) * 0.02
    gamma = (1.0 + 0.1 * jax.random.normal(ks[5], (w,), jnp.float32))
    beta = 0.1 * jax.random.normal(ks[6], (w,), jnp.float32)
    return x, w1, b1, w2, b2, gamma, beta


def _ref(x, w1, b1, w2, b2, gamma, beta, act, residual):
    ln = _ln_rows(x, gamma, beta, 1e-5)
    y = act(ln @ w1 + b1) @ w2 + b2
    return x + y if residual else y


@pytest.mark.parametrize("act_name,act,b,s,w,h,residual", [
    ("quick_gelu", _quick_gelu, 4, 50, 256, 1024, True),
    ("gelu", _gelu, 2, 197, 768, 3072, True),      # B/16 dims, row count 394 pads to tile
    ("quick_gelu", _quick_gelu, 2, 77, 512, 2048, False),
])
def test_block_mlp_matches_reference(act_name, act, b, s, w, h, residual):
    x, w1, b1, w2, b2, gamma, beta = _make_inputs(
        jax.random.PRNGKey(3), b, s, w, h, jnp.float32)

    def loss_kernel(x, gamma, beta, w1, b1, w2, b2):
        y = block_mlp(x, w1, b1, w2, b2, ln_scale=gamma, ln_bias=beta,
                      act=act_name, residual=residual)
        return jnp.sum(jnp.sin(y)), y

    def loss_ref(x, gamma, beta, w1, b1, w2, b2):
        y = _ref(x, w1, b1, w2, b2, gamma, beta, act, residual)
        return jnp.sum(jnp.sin(y)), y

    args = (x, gamma, beta, w1, b1, w2, b2)
    nd = len(args)
    (lk, yk), gk = jax.value_and_grad(loss_kernel, argnums=tuple(range(nd)),
                                      has_aux=True)(*args)
    (lr, yr), gr = jax.value_and_grad(loss_ref, argnums=tuple(range(nd)),
                                      has_aux=True)(*args)
    np.testing.assert_allclose(np.asarray(yk), np.asarray(yr), atol=1e-4, rtol=1e-4)
    names = ["dx", "dgamma", "dbeta", "dw1", "db1", "dw2", "db2"]
    for name, a, r in zip(names, gk, gr):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-4 * scale, rtol=2e-3, err_msg=name)


def test_block_mlp_padding_tail(monkeypatch):
    """Row count that is NOT a multiple of the tile: padded rows must not leak into
    values or any gradient (checked against an un-padded same-math reference)."""
    x, w1, b1, w2, b2, gamma, beta = _make_inputs(
        jax.random.PRNGKey(5), 3, 13, 128, 512, jnp.float32)
    args = (x, gamma, beta, w1, b1, w2, b2)

    def loss_kernel(x, gamma, beta, w1, b1, w2, b2):
        return jnp.sum(jnp.cos(block_mlp(
            x, w1, b1, w2, b2, ln_scale=gamma, ln_bias=beta, residual=True)))

    def loss_ref(x, gamma, beta, w1, b1, w2, b2):
        return jnp.sum(jnp.cos(_ref(x, w1, b1, w2, b2, gamma, beta, _quick_gelu, True)))

    # 3*13=39 rows with a forced tile of 16 -> 48 padded rows, 3 grid programs
    monkeypatch.setenv("MMTPU_BLOCK_MLP_M_FWD", "16")
    monkeypatch.setenv("MMTPU_BLOCK_MLP_M_BWD", "16")
    gk = jax.grad(loss_kernel, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for a, r in zip(gk, gr):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-4 * scale, rtol=2e-3)


def test_block_mlp_rejects_unknown_act():
    x, w1, b1, w2, b2, gamma, beta = _make_inputs(
        jax.random.PRNGKey(7), 2, 8, 128, 512, jnp.float32)
    with pytest.raises(ValueError):
        block_mlp(x, w1, b1, w2, b2, ln_scale=gamma, ln_bias=beta, act="relu")


def test_mlp_module_ln_handoff_matches_composition():
    """Module level: MLP with the pre-LN handoff + residual fold must equal the explicit
    LayerNorm -> MLP -> add composition (the wiring ResidualBlock relies on)."""
    from multimodal_tpu.models.layers import MLP, LayerNorm

    class _Handoff(__import__("flax").linen.Module):
        @__import__("flax").linen.compact
        def __call__(self, x, fold: bool):
            lnp = LayerNorm(name="ln_2")(x, params_only=True)
            mlp = MLP(width=128, dtype=jnp.float32, name="mlp")
            if fold:
                return mlp(x, ln_params=lnp, residual=True)
            return x + mlp(_ln_rows(x, lnp[0], lnp[1], 1e-5))

    mod = _Handoff()
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 10, 128), jnp.float32)
    params = mod.init(jax.random.PRNGKey(12), x, True)
    out_fold = mod.apply(params, x, True)
    out_ref = mod.apply(params, x, False)
    np.testing.assert_allclose(np.asarray(out_fold), np.asarray(out_ref),
                               atol=1e-6, rtol=1e-6)
