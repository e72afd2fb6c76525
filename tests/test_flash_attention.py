"""Pallas flash attention vs the XLA reference path (interpret mode on the CPU mesh).

Covers the encoder shapes the framework actually runs: text 77 tokens (causal), ViT-B/32
50 tokens and ViT-B/16 197 tokens (full), plus a multi-block 300-token case that exercises
the online-softmax accumulation across k tiles, and gradient parity through custom_vjp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.ops.attention import _xla_attention
from multimodal_tpu.ops.flash_attention import flash_attention


def _rand_qkv(key, b, s, h, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, s, h, d), dtype)
    k = jax.random.normal(kk, (b, s, h, d), dtype)
    v = jax.random.normal(kv, (b, s, h, d), dtype)
    return q, k, v


@pytest.mark.parametrize(
    "s,causal",
    [(50, False), (77, True), (197, False), (300, True), (300, False)],
)
def test_flash_matches_xla(s, causal):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), 2, s, 4, 64)
    ref = _xla_attention(q, k, v, causal, None)
    out = flash_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_grads_match_xla(causal):
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), 1, 77, 2, 64)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, causal, None) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=5e-5, rtol=5e-5,
            err_msg=f"grad d{name} mismatch",
        )


def test_flash_multiblock_grads():
    # 300 > 2 tiles: accumulation across k/q blocks in both bwd kernels
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), 1, 300, 2, 64)

    def loss_flash(q):
        return jnp.sum(flash_attention(q, k, v, causal=True))

    def loss_ref(q):
        return jnp.sum(_xla_attention(q, k, v, True, None))

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_flash)(q)),
        np.asarray(jax.grad(loss_ref)(q)),
        atol=5e-5,
        rtol=5e-5,
    )


def test_flash_bf16_runs():
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), 2, 77, 4, 64, jnp.bfloat16)
    out = flash_attention(q, k, v, causal=True)
    assert out.dtype == jnp.bfloat16
    ref = _xla_attention(q, k, v, True, None)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2, rtol=3e-2
    )


def test_attention_dispatch_guards():
    """Explicit impl choices must not silently change semantics: masks are rejected by
    the kernel paths, fused requires self-attention shapes, fully-masked rows stay
    finite on the XLA path, and causal auto-dispatch never switches mask alignment
    (flash is top-left; XLA cross-length is bottom-right), so flash_supported requires
    sq == sk."""
    import jax
    import pytest as _pytest

    from multimodal_tpu.ops.attention import attention
    from multimodal_tpu.ops.flash_attention import flash_supported

    q = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 2, 8))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 2, 8))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 2, 8))
    mask = jnp.zeros((1, 1, 4, 6))
    with _pytest.raises(ValueError, match="mask"):
        attention(q, k, v, mask=mask, impl="flash")
    with _pytest.raises(ValueError, match="mask"):
        attention(q[:, :4], k[:, :4], v[:, :4], mask=mask[..., :4], impl="fused")
    with _pytest.raises(ValueError, match="sq == sk"):
        attention(q, k, v, impl="fused")

    # fully-masked rows: finite output (uniform), not NaN
    full = jnp.full((1, 1, 4, 6), -jnp.inf)
    out = attention(q, k, v, mask=full, impl="xla")
    assert bool(jnp.isfinite(out).all())

    # causal cross-length never auto-routes to the (top-left-aligned) flash kernel
    assert not flash_supported((1, 512, 2, 64), (1, 4096, 2, 64), causal=True)
    assert flash_supported((1, 4096, 2, 64), (1, 4096, 2, 64), causal=True)
