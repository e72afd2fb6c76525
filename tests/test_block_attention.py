"""Parity tests for the fused whole-block attention kernel (ops/block_attention.py).

The kernel fuses QKV projections + softmax attention + output projection for short
sequences; these tests check it against a plain-JAX reference implementation (fwd and
full VJP, causal and bidirectional), in Pallas interpret mode on CPU and compiled on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.ops.block_attention import block_attention, block_attn_supported


def _ref_block_attention(x, wq, bq, wk, bk, wv, bv, wo, bo, *, heads, causal):
    b, s, w = x.shape
    hd = w // heads
    f32 = jnp.float32
    q = (x @ wq + bq).astype(f32).reshape(b, s, heads, hd)
    k = (x @ wk + bk).astype(f32).reshape(b, s, heads, hd)
    v = (x @ wv + bv).astype(f32).reshape(b, s, heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * hd ** -0.5
    if causal:
        mask = jnp.tril(jnp.ones((s, s), bool))
        logits = jnp.where(mask[None, None], logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, s, w).astype(x.dtype)
    return out @ wo + bo


def _make_inputs(key, b, s, w, dtype):
    ks = jax.random.split(key, 9)
    std = w ** -0.5
    x = jax.random.normal(ks[0], (b, s, w), dtype)
    weights = [jax.random.normal(ks[i], (w, w), dtype) * std for i in (1, 2, 3, 4)]
    biases = [jax.random.normal(ks[i], (w,), dtype) * 0.02 for i in (5, 6, 7, 8)]
    wq, wk, wv, wo = weights
    bq, bk, bv, bo = biases
    return x, (wq, bq, wk, bk, wv, bv, wo, bo)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("b,s,w,heads", [(4, 50, 256, 4), (3, 77, 512, 8)])
def test_forward_matches_reference(b, s, w, heads, causal):
    assert block_attn_supported(b, s, w, heads)
    x, ws = _make_inputs(jax.random.PRNGKey(0), b, s, w, jnp.float32)
    got = block_attention(x, *ws, heads=heads, causal=causal)
    want = _ref_block_attention(x, *ws, heads=heads, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_vjp_matches_reference(causal):
    b, s, w, heads = 4, 50, 256, 4
    x, ws = _make_inputs(jax.random.PRNGKey(1), b, s, w, jnp.float32)

    def loss_kernel(x, *ws):
        y = block_attention(x, *ws, heads=heads, causal=causal)
        return jnp.sum(jnp.sin(y))

    def loss_ref(x, *ws):
        y = _ref_block_attention(x, *ws, heads=heads, causal=causal)
        return jnp.sum(jnp.sin(y))

    grads_k = jax.grad(loss_kernel, argnums=tuple(range(9)))(x, *ws)
    grads_r = jax.grad(loss_ref, argnums=tuple(range(9)))(x, *ws)
    names = ["dx", "dwq", "dbq", "dwk", "dbk", "dwv", "dbv", "dwo", "dbo"]
    for name, gk, gr in zip(names, grads_k, grads_r):
        scale = max(1.0, float(jnp.max(jnp.abs(gr))))
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gr), atol=3e-4 * scale, rtol=1e-3,
            err_msg=name,
        )


def test_bf16_forward_close():
    b, s, w, heads = 8, 64, 256, 4
    x, ws = _make_inputs(jax.random.PRNGKey(2), b, s, w, jnp.bfloat16)
    got = block_attention(x, *ws, heads=heads, causal=False).astype(jnp.float32)
    want = _ref_block_attention(x, *ws, heads=heads, causal=False).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-2, rtol=5e-2)


def test_supported_predicate():
    assert block_attn_supported(256, 50, 768, 12)   # ViT-B/32 vision tower
    assert block_attn_supported(256, 77, 512, 8)    # text tower
    assert not block_attn_supported(256, 196 + 1, 768, 12) is None  # always bool
    assert not block_attn_supported(256, 400, 768, 12)  # too long
    assert block_attn_supported(256, 50, 768, 16)       # head_dim 48 (8-mult: on)
    assert not block_attn_supported(256, 50, 768, 64)   # head_dim 12: not 8-multiple


def test_any_head_dim_gate(monkeypatch):
    # head_dim 8-multiples (ViT-H/14's 80, ViT-g/14's 88) are DEFAULT-ON since the
    # +27% H/14 A/B; MMTPU_BLOCK_ATTN_ALIGNED_ONLY=1 reverts to the aligned set
    assert block_attn_supported(8, 50, 640, 8)           # head_dim 80
    assert block_attn_supported(8, 257, 1280, 16)        # ViT-H/14 vision tower
    assert block_attn_supported(8, 257, 1408, 16)        # ViT-g/14 vision tower
    assert block_attn_supported(8, 50, 512, 4)           # head_dim 128: always on
    monkeypatch.setenv("MMTPU_BLOCK_ATTN_ALIGNED_ONLY", "1")
    assert not block_attn_supported(8, 257, 1280, 16)    # opt-out works
    assert block_attn_supported(8, 50, 512, 4)           # aligned dims unaffected
    monkeypatch.delenv("MMTPU_BLOCK_ATTN_ALIGNED_ONLY")
    assert block_attn_supported(8, 257, 1280, 16)


@pytest.mark.parametrize("heads", [8, 16])  # head_dim 80 and 40
def test_any_head_dim_parity(monkeypatch, heads):
    b, s, w = 2, 24, 640
    x, ws = _make_inputs(jax.random.PRNGKey(7), b, s, w, jnp.float32)
    got = block_attention(x, *ws, heads=heads, causal=False)
    want = _ref_block_attention(x, *ws, heads=heads, causal=False)
    # W=640 accumulations put independent f32 evaluation orders ~1e-3 apart (both are
    # ~1e-2 from the f64 truth at W=1280 — measured); the bound is rounding, not logic
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3, rtol=1e-3)

    def loss_k(x):
        return jnp.sum(jnp.sin(block_attention(x, *ws, heads=heads, causal=False)))

    def loss_r(x):
        return jnp.sum(jnp.sin(_ref_block_attention(x, *ws, heads=heads, causal=False)))

    gk, gr = jax.grad(loss_k)(x), jax.grad(loss_r)(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=2e-3, rtol=2e-3)


def test_odd_batch_falls_back_to_group_of_one():
    b, s, w, heads = 5, 50, 256, 4
    x, ws = _make_inputs(jax.random.PRNGKey(3), b, s, w, jnp.float32)
    got = block_attention(x, *ws, heads=heads, causal=False)
    want = _ref_block_attention(x, *ws, heads=heads, causal=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_vit_b16_sequence_length():
    # ViT-B/16 vision tower: S=197 (196 patches + cls), non-128-aligned
    b, s, w, heads = 4, 197, 768, 12
    assert block_attn_supported(b, s, w, heads)
    x, ws = _make_inputs(jax.random.PRNGKey(4), b, s, w, jnp.float32)
    got = block_attention(x, *ws, heads=heads, causal=False)
    want = _ref_block_attention(x, *ws, heads=heads, causal=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5, rtol=5e-5)

    def loss_k(x):
        return jnp.sum(jnp.sin(block_attention(x, *ws, heads=heads, causal=False)))

    def loss_r(x):
        return jnp.sum(jnp.sin(_ref_block_attention(x, *ws, heads=heads, causal=False)))

    gk, gr = jax.grad(loss_k)(x), jax.grad(loss_r)(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=3e-4, rtol=1e-3)


def test_vit_l14_sequence_length():
    # ViT-L/14 vision tower: S=257, W=1024, 16 heads
    b, s, w, heads = 2, 257, 1024, 16
    assert block_attn_supported(b, s, w, heads)
    x, ws = _make_inputs(jax.random.PRNGKey(5), b, s, w, jnp.float32)
    got = block_attention(x, *ws, heads=heads, causal=False)
    want = _ref_block_attention(x, *ws, heads=heads, causal=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5, rtol=5e-5)

    def loss_k(x):
        return jnp.sum(jnp.sin(block_attention(x, *ws, heads=heads, causal=False)))

    def loss_r(x):
        return jnp.sum(jnp.sin(_ref_block_attention(x, *ws, heads=heads, causal=False)))

    gk, gr = jax.grad(loss_k)(x), jax.grad(loss_r)(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=3e-4, rtol=1e-3)


def test_vit_b16_weight_grads_match_reference():
    """S=197 runs the 16-aligned padded whole-group path; the XLA-side weight-grad
    reductions consume padded dq/dk/dv/attnpre rows and must still be exact."""
    b, s, w, heads = 4, 197, 768, 12
    x, ws = _make_inputs(jax.random.PRNGKey(6), b, s, w, jnp.float32)

    def loss_k(ws):
        return jnp.sum(jnp.sin(block_attention(x, *ws, heads=heads, causal=False)))

    def loss_r(ws):
        return jnp.sum(jnp.sin(_ref_block_attention(x, *ws, heads=heads, causal=False)))

    gk, gr = jax.grad(loss_k)(ws), jax.grad(loss_r)(ws)
    for a, b_, name in zip(gk, gr, ["wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4, rtol=1e-3,
                                   err_msg=name)


def _ref_ln(x, gamma, beta, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(jnp.square(x32), axis=-1, keepdims=True) - mean**2, 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * gamma + beta).astype(x.dtype)


@pytest.mark.parametrize("causal,b,s,w,heads", [
    (False, 4, 50, 256, 4),     # short-S whole-group path
    (True, 3, 77, 512, 8),      # causal text-tower dims
    (False, 2, 197, 768, 12),   # padded 16-aligned large-S path
])
def test_ln_fold_matches_unfused(causal, b, s, w, heads, monkeypatch):
    """The kernel-folded pre-LN (values AND the full vjp incl. dgamma/dbeta) must match
    LN-then-attention computed by the plain reference."""
    monkeypatch.setenv("MMTPU_BLOCK_ATTN_LN", "1")  # force the fold at every S
    x, ws = _make_inputs(jax.random.PRNGKey(7), b, s, w, jnp.float32)
    gamma = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(8), (w,), jnp.float32)
    beta = 0.1 * jax.random.normal(jax.random.PRNGKey(9), (w,), jnp.float32)

    def loss_fused(x, gamma, beta, *ws):
        y = block_attention(x, *ws, heads=heads, causal=causal,
                            ln_scale=gamma, ln_bias=beta)
        return jnp.sum(jnp.sin(y)), y

    def loss_ref(x, gamma, beta, *ws):
        y = _ref_block_attention(_ref_ln(x, gamma, beta), *ws, heads=heads, causal=causal)
        return jnp.sum(jnp.sin(y)), y

    (lk, yk), gk = jax.value_and_grad(loss_fused, argnums=(0, 1, 2), has_aux=True)(
        x, gamma, beta, *ws)
    (lr, yr), gr = jax.value_and_grad(loss_ref, argnums=(0, 1, 2), has_aux=True)(
        x, gamma, beta, *ws)
    np.testing.assert_allclose(np.asarray(yk), np.asarray(yr), atol=5e-5, rtol=5e-5)
    for name, a, r in zip(["dx", "dgamma", "dbeta"], gk, gr):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=5e-4 * scale, rtol=2e-3, err_msg=name)


def test_ln_fold_weight_grads_match(monkeypatch):
    monkeypatch.setenv("MMTPU_BLOCK_ATTN_LN", "1")
    b, s, w, heads = 4, 50, 256, 4
    x, ws = _make_inputs(jax.random.PRNGKey(10), b, s, w, jnp.float32)
    gamma = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(11), (w,), jnp.float32)
    beta = 0.1 * jax.random.normal(jax.random.PRNGKey(12), (w,), jnp.float32)

    def loss_fused(ws):
        y = block_attention(x, *ws, heads=heads, causal=False,
                            ln_scale=gamma, ln_bias=beta)
        return jnp.sum(jnp.sin(y))

    def loss_ref(ws):
        y = _ref_block_attention(_ref_ln(x, gamma, beta), *ws, heads=heads, causal=False)
        return jnp.sum(jnp.sin(y))

    gk, gr = jax.grad(loss_fused)(ws), jax.grad(loss_ref)(ws)
    for a, r, name in zip(gk, gr, ["wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=5e-4, rtol=1e-3,
                                   err_msg=name)


def test_ln_fold_env_fallback_identical(monkeypatch):
    """MMTPU_BLOCK_ATTN_LN=0 must route through the XLA _ln_rows pre-pass and agree with
    the fused path to float tolerance."""
    b, s, w, heads = 4, 50, 256, 4
    x, ws = _make_inputs(jax.random.PRNGKey(13), b, s, w, jnp.float32)
    gamma = jnp.ones((w,), jnp.float32)
    beta = jnp.zeros((w,), jnp.float32)
    monkeypatch.setenv("MMTPU_BLOCK_ATTN_LN", "1")
    fused = block_attention(x, *ws, heads=heads, causal=False,
                            ln_scale=gamma, ln_bias=beta)
    monkeypatch.setenv("MMTPU_BLOCK_ATTN_LN", "0")
    unfused = block_attention(x, *ws, heads=heads, causal=False,
                              ln_scale=gamma, ln_bias=beta)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal,b,s,w,heads", [
    (False, 4, 50, 256, 4),     # short-S whole-group path (fold forced by env)
    (True, 3, 77, 512, 8),      # causal text-tower dims
    (False, 2, 197, 768, 12),   # padded 16-aligned large-S path
])
def test_fused_residual_matches_unfused(causal, b, s, w, heads, monkeypatch):
    """residual=True must return x + attn(LN(x)) with the full vjp (incl. the
    passthrough dx term) matching the reference composition."""
    monkeypatch.setenv("MMTPU_BLOCK_ATTN_LN", "1")
    x, ws = _make_inputs(jax.random.PRNGKey(21), b, s, w, jnp.float32)
    gamma = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(22), (w,), jnp.float32)
    beta = 0.1 * jax.random.normal(jax.random.PRNGKey(23), (w,), jnp.float32)

    def loss_fused(x, gamma, beta, *ws):
        y = block_attention(x, *ws, heads=heads, causal=causal,
                            ln_scale=gamma, ln_bias=beta, residual=True)
        return jnp.sum(jnp.sin(y)), y

    def loss_ref(x, gamma, beta, *ws):
        y = x + _ref_block_attention(
            _ref_ln(x, gamma, beta), *ws, heads=heads, causal=causal)
        return jnp.sum(jnp.sin(y)), y

    (lk, yk), gk = jax.value_and_grad(loss_fused, argnums=(0, 1, 2), has_aux=True)(
        x, gamma, beta, *ws)
    (lr, yr), gr = jax.value_and_grad(loss_ref, argnums=(0, 1, 2), has_aux=True)(
        x, gamma, beta, *ws)
    np.testing.assert_allclose(np.asarray(yk), np.asarray(yr), atol=5e-5, rtol=5e-5)
    for name, a, r in zip(["dx", "dgamma", "dbeta"], gk, gr):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=5e-4 * scale, rtol=2e-3, err_msg=name)


def test_fused_residual_env_fallback_identical(monkeypatch):
    """MMTPU_BLOCK_ATTN_RESIDUAL=0 routes the add through XLA; values must agree with
    the in-kernel add to float tolerance."""
    b, s, w, heads = 4, 50, 256, 4
    x, ws = _make_inputs(jax.random.PRNGKey(24), b, s, w, jnp.float32)
    gamma = jnp.ones((w,), jnp.float32)
    beta = jnp.zeros((w,), jnp.float32)
    monkeypatch.setenv("MMTPU_BLOCK_ATTN_LN", "1")
    fused = block_attention(x, *ws, heads=heads, causal=False,
                            ln_scale=gamma, ln_bias=beta, residual=True)
    monkeypatch.setenv("MMTPU_BLOCK_ATTN_RESIDUAL", "0")
    unfused = block_attention(x, *ws, heads=heads, causal=False,
                              ln_scale=gamma, ln_bias=beta, residual=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                               atol=2e-5, rtol=2e-5)


def test_residual_requires_ln():
    b, s, w, heads = 4, 50, 256, 4
    x, ws = _make_inputs(jax.random.PRNGKey(25), b, s, w, jnp.float32)
    with pytest.raises(ValueError):
        block_attention(x, *ws, heads=heads, residual=True)


def test_stream_padded_kv_len_matches_unpadded():
    """Stream-padded call (x pre-padded to the 16-aligned S, kv_len=real S): real rows
    and every gradient must match the unpadded reference; pad rows of dx must be exactly
    zero (the caller's post-trunk slice gives them zero cotangent)."""
    b, s, w, heads = 2, 197, 768, 12
    s_pad = 208
    x, ws = _make_inputs(jax.random.PRNGKey(30), b, s, w, jnp.float32)
    xp = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))

    def loss_pad(x, *ws):
        y = block_attention(x, *ws, heads=heads, causal=False, kv_len=s)[:, :s]
        return jnp.sum(jnp.sin(y)), y

    def loss_ref(x, *ws):
        y = _ref_block_attention(x, *ws, heads=heads, causal=False)
        return jnp.sum(jnp.sin(y)), y

    (_, yk), gk = jax.value_and_grad(loss_pad, argnums=tuple(range(9)), has_aux=True)(
        xp, *ws)
    (_, yr), gr = jax.value_and_grad(loss_ref, argnums=tuple(range(9)), has_aux=True)(
        x, *ws)
    np.testing.assert_allclose(np.asarray(yk), np.asarray(yr), atol=5e-5, rtol=5e-5)
    names = ["dx", "dwq", "dbq", "dwk", "dbk", "dwv", "dbv", "dwo", "dbo"]
    for name, a, r in zip(names, gk, gr):
        a = np.asarray(a)
        if name == "dx":
            np.testing.assert_array_equal(a[:, s:], 0.0, err_msg="pad rows of dx")
            a = a[:, :s]
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        np.testing.assert_allclose(a, np.asarray(r), atol=5e-4 * scale, rtol=1e-3,
                                   err_msg=name)


def test_stream_padded_ln_residual_matches(monkeypatch):
    """The production B/16 form: stream-padded + fused pre-LN + in-kernel residual."""
    monkeypatch.setenv("MMTPU_BLOCK_ATTN_LN", "1")
    b, s, w, heads = 2, 197, 768, 12
    s_pad = 208
    x, ws = _make_inputs(jax.random.PRNGKey(31), b, s, w, jnp.float32)
    gamma = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(32), (w,), jnp.float32)
    beta = 0.1 * jax.random.normal(jax.random.PRNGKey(33), (w,), jnp.float32)
    xp = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))

    def loss_pad(x, gamma, beta, *ws):
        y = block_attention(x, *ws, heads=heads, causal=False, ln_scale=gamma,
                            ln_bias=beta, residual=True, kv_len=s)[:, :s]
        return jnp.sum(jnp.sin(y)), y

    def loss_ref(x, gamma, beta, *ws):
        y = x + _ref_block_attention(
            _ref_ln(x, gamma, beta), *ws, heads=heads, causal=False)
        return jnp.sum(jnp.sin(y)), y

    (_, yk), gk = jax.value_and_grad(loss_pad, argnums=(0, 1, 2), has_aux=True)(
        xp, gamma, beta, *ws)
    (_, yr), gr = jax.value_and_grad(loss_ref, argnums=(0, 1, 2), has_aux=True)(
        x, gamma, beta, *ws)
    np.testing.assert_allclose(np.asarray(yk), np.asarray(yr), atol=5e-5, rtol=5e-5)
    for name, a, r in zip(["dx", "dgamma", "dbeta"], gk, gr):
        a = np.asarray(a)
        if name == "dx":
            np.testing.assert_array_equal(a[:, s:], 0.0, err_msg="pad rows of dx")
            a = a[:, :s]
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        np.testing.assert_allclose(a, np.asarray(r), atol=5e-4 * scale, rtol=2e-3,
                                   err_msg=name)


def test_stream_padded_rejects_unaligned():
    b, s, w, heads = 2, 197, 768, 12
    x, ws = _make_inputs(jax.random.PRNGKey(34), b, s, w, jnp.float32)
    with pytest.raises(ValueError):
        block_attention(x, *ws, heads=heads, kv_len=190)


def test_stream_pad_len_predicate(monkeypatch):
    from multimodal_tpu.ops.block_attention import stream_pad_len

    monkeypatch.setenv("MMTPU_STREAM_PAD", "force")  # skip the TPU-backend check
    assert stream_pad_len(256, 197, 768, 12) == 208   # ViT-B/16
    assert stream_pad_len(256, 257, 1024, 16) == 272  # ViT-L/14
    assert stream_pad_len(256, 50, 768, 12) is None   # short S: no per-call pad either
    assert stream_pad_len(256, 208, 768, 12) is None  # already aligned
    assert stream_pad_len(256, 197, 768, 16) == 208  # head_dim 48: now kernel-supported
    assert stream_pad_len(256, 197, 768, 64) is None  # head_dim 12: kernel-unsupported
    monkeypatch.setenv("MMTPU_STREAM_PAD", "0")
    assert stream_pad_len(256, 197, 768, 12) is None


def test_block_attention_inside_shard_map():
    """Regression: under jax.shard_map's check_vma the pallas_call out_shape must carry
    the input's varying-mesh-axes (ops/pallas_util.sds) — surfaced by the ring+shard_map
    CLI train step on hardware (plain ShapeDtypeStruct is rejected at trace time)."""
    import functools

    from jax.sharding import Mesh, PartitionSpec as P

    b, s, w, heads = 8, 50, 256, 4
    x, ws = _make_inputs(jax.random.PRNGKey(9), b, s, w, jnp.float32)
    devices = np.asarray(jax.devices()[:4])
    mesh = Mesh(devices, ("data",))

    def fn(x, *ws):
        return block_attention(x, *ws, heads=heads, causal=False)

    y = jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P("data"),) + (P(),) * 8,
        out_specs=P("data"),
    ))(x, *ws)
    want = _ref_block_attention(x, *ws, heads=heads, causal=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=2e-5, rtol=2e-5)

    # gradients through the shard_mapped kernel (the train-step path)
    def loss(x, *ws):
        return jnp.sum(jnp.sin(jax.shard_map(
            fn, mesh=mesh, in_specs=(P("data"),) + (P(),) * 8, out_specs=P("data"),
        )(x, *ws))) / b

    g = jax.jit(jax.grad(loss))(x, *ws)
    assert bool(jnp.all(jnp.isfinite(g)))
