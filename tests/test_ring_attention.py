"""Sequence-parallel ring attention (ops/ring_attention.py): exact match to dense attention
(values AND gradients) with the sequence axis sharded over an 8-device ring."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from multimodal_tpu.ops.attention import _xla_attention
from multimodal_tpu.ops.ring_attention import ring_attention


def _mesh():
    return Mesh(np.asarray(jax.devices()).reshape(-1), ("seq",))


def _qkv(b=2, s=64, h=4, d=16, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)  # noqa: E731
    return mk(), mk(), mk()


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_dense(causal):
    mesh = _mesh()
    q, k, v = _qkv()

    ring = jax.jit(
        jax.shard_map(
            functools.partial(ring_attention, axis_name="seq", causal=causal),
            mesh=mesh,
            in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
            out_specs=P(None, "seq"),
        )
    )
    out_ring = ring(q, k, v)
    out_dense = _xla_attention(q, k, v, causal, None)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_dense),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_grads_match_dense(causal):
    mesh = _mesh()
    q, k, v = _qkv(s=32)

    def ring_loss(q, k, v):
        out = jax.shard_map(
            functools.partial(ring_attention, axis_name="seq", causal=causal),
            mesh=mesh,
            in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
            out_specs=P(None, "seq"),
        )(q, k, v)
        return jnp.sum(jnp.sin(out))

    def dense_loss(q, k, v):
        return jnp.sum(jnp.sin(_xla_attention(q, k, v, causal, None)))

    g_ring = jax.jit(jax.grad(ring_loss, argnums=(0, 1, 2)))(q, k, v)
    g_dense = jax.grad(dense_loss, argnums=(0, 1, 2))(q, k, v)
    for gr, gd, name in zip(g_ring, g_dense, "qkv"):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gd), rtol=5e-5, atol=5e-5,
                                   err_msg=f"grad w.r.t. {name}")


def test_ring_uneven_ragged_rejected():
    # sequence must divide the ring; shard_map itself enforces even sharding
    mesh = _mesh()
    q, k, v = _qkv(s=60)
    with pytest.raises(Exception):
        jax.shard_map(
            functools.partial(ring_attention, axis_name="seq"),
            mesh=mesh,
            in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
            out_specs=P(None, "seq"),
        )(q, k, v)


def test_ring_trains_a_toy_decoder_step():
    """A causal sequence-sharded 'decoder' train step: embed -> ring attention -> proj,
    loss + grads all finite with BOTH a data axis and a seq axis in the mesh."""
    devs = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devs, ("data", "seq"))
    b, s, h, d, vocab = 4, 64, 2, 8, 97
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, vocab, (b, s)), jnp.int32)
    params = {
        "emb": jnp.asarray(rng.normal(size=(vocab, h * d)) * 0.02, jnp.float32),
        "out": jnp.asarray(rng.normal(size=(h * d, vocab)) * 0.02, jnp.float32),
    }

    def local_step(params, tokens):
        x = params["emb"][tokens]  # [b_local, s_local, h*d]
        bl, sl = x.shape[:2]
        qkv = x.reshape(bl, sl, h, d)
        out = ring_attention(qkv, qkv, qkv, "seq", causal=True).reshape(bl, sl, h * d)
        logits = out @ params["out"]
        # next-token loss needs the shifted target: roll the LOCAL tokens through the ring
        tgt = jnp.roll(tokens, -1, axis=1)  # local approximation is fine for a smoke test
        loss = -jnp.mean(
            jnp.take_along_axis(jax.nn.log_softmax(logits), tgt[..., None], -1))
        loss = jax.lax.pmean(jax.lax.pmean(loss, "seq"), "data")
        return loss

    def step(params, tokens):
        loss, grads = jax.value_and_grad(
            lambda p: jax.shard_map(
                local_step, mesh=mesh,
                in_specs=(P(), P("data", "seq")), out_specs=P(),
            )(p, tokens)
        )(params)
        return loss, grads

    loss, grads = jax.jit(step)(params, tokens)
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
