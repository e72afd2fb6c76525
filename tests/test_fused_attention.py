"""Fused whole-sequence attention vs the XLA path: values and gradients, both head widths,
odd sequence lengths, plus the dispatch reshape round-trip through ops.attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.ops.attention import _xla_attention, attention
from multimodal_tpu.ops.fused_attention import fused_attention, fused_supported


def _qkv(key, b, s, h, d, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (b, s, h, d), dtype) for k in ks)


@pytest.mark.parametrize("s,h,d,causal", [
    (77, 8, 64, True),
    (50, 12, 64, False),
    (197, 12, 64, False),
    (33, 4, 128, True),   # G=1: one head per program
    (16, 2, 32, False),   # G=4
])
def test_fused_matches_xla(s, h, d, causal):
    q, k, v = _qkv(jax.random.PRNGKey(0), 2, s, h, d)
    ref = _xla_attention(q, k, v, causal, None)
    w = h * d
    out = fused_attention(
        q.reshape(2, s, w), k.reshape(2, s, w), v.reshape(2, s, w), heads=h, causal=causal
    ).reshape(2, s, h, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_fused_grads_match_xla(causal):
    q, k, v = _qkv(jax.random.PRNGKey(1), 2, 50, 4, 64)
    w = 4 * 64

    def loss_fused(q, k, v):
        out = fused_attention(q.reshape(2, 50, w), k.reshape(2, 50, w), v.reshape(2, 50, w),
                              heads=4, causal=causal)
        return jnp.sum(out ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, causal, None) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4,
                                   err_msg=f"d{name}")


def test_dispatch_roundtrip_explicit_impl():
    q, k, v = _qkv(jax.random.PRNGKey(2), 2, 77, 8, 64)
    ref = attention(q, k, v, causal=True, impl="xla")
    out = attention(q, k, v, causal=True, impl="fused")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_fused_supported_gate():
    assert not fused_supported(77, 64)  # below the measured crossover -> XLA
    assert fused_supported(197, 64)
    assert fused_supported(512, 128)
    assert not fused_supported(513, 64)
    assert not fused_supported(77, 96)  # head_dim must divide the lane width cleanly
