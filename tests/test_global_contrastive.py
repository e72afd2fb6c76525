"""Chunked and ring global contrastive losses: exact value AND gradient parity with the
dense clip_loss, single-device and on the 8-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from multimodal_tpu.losses.clip_loss import clip_loss
from multimodal_tpu.losses.global_contrastive import chunked_clip_loss, ring_clip_loss
from multimodal_tpu.parallel import create_mesh

B_GLOBAL, E = 32, 16


def _features(seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    img = jax.random.normal(k1, (B_GLOBAL, E))
    txt = jax.random.normal(k2, (B_GLOBAL, E))
    return img, txt


def test_chunked_matches_dense_single_device():
    img, txt = _features()
    scale = jnp.asarray(2.0)
    dense = clip_loss(img, txt, scale)
    for chunk in (4, 8, 32, 100):
        got = chunked_clip_loss(img, txt, scale, chunk_size=chunk)
        np.testing.assert_allclose(float(got), float(dense), rtol=1e-6)


def test_chunked_label_smoothing_matches_dense():
    img, txt = _features(1)
    dense = clip_loss(img, txt, jnp.asarray(1.5), label_smoothing=0.1)
    got = chunked_clip_loss(img, txt, jnp.asarray(1.5), chunk_size=8, label_smoothing=0.1)
    np.testing.assert_allclose(float(got), float(dense), rtol=1e-6)


def test_chunked_gradients_match_dense():
    img, txt = _features(2)

    g_dense = jax.grad(lambda i, t, s: clip_loss(i, t, s), argnums=(0, 1, 2))(
        img, txt, jnp.asarray(2.0)
    )
    g_chunk = jax.grad(
        lambda i, t, s: chunked_clip_loss(i, t, s, chunk_size=8), argnums=(0, 1, 2)
    )(img, txt, jnp.asarray(2.0))
    for gd, gc in zip(g_dense, g_chunk):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gd), atol=1e-6, rtol=1e-5)


@pytest.fixture(scope="module")
def mesh():
    return create_mesh()


def _sharded(fn, mesh, img, txt, scale):
    out = jax.jit(
        jax.shard_map(
            fn, mesh=mesh, in_specs=(P("data"), P("data"), P()), out_specs=P()
        )
    )(img, txt, scale)
    return float(out)


def test_ring_matches_dense_on_mesh(mesh):
    img, txt = _features(3)
    scale = jnp.asarray(2.0)
    dense = float(clip_loss(img, txt, scale))
    ring = _sharded(
        lambda i, t, s: ring_clip_loss(i, t, s, "data"), mesh, img, txt, scale
    )
    np.testing.assert_allclose(ring, dense, rtol=1e-5)


def test_chunked_matches_dense_on_mesh(mesh):
    img, txt = _features(4)
    scale = jnp.asarray(1.0)
    dense = float(clip_loss(img, txt, scale))
    chunked = _sharded(
        lambda i, t, s: chunked_clip_loss(i, t, s, chunk_size=8, axis_name="data"),
        mesh, img, txt, scale,
    )
    np.testing.assert_allclose(chunked, dense, rtol=1e-5)


def test_ring_gradients_match_dense_on_mesh(mesh):
    img, txt = _features(5)
    scale = jnp.asarray(2.0)

    def dense_loss(i, t, s):
        return clip_loss(i, t, s)

    def ring_loss(i, t, s):
        return jax.shard_map(
            lambda a, b, c: ring_clip_loss(a, b, c, "data"),
            mesh=mesh, in_specs=(P("data"), P("data"), P()), out_specs=P(),
        )(i, t, s)

    g_dense = jax.grad(dense_loss, argnums=(0, 1, 2))(img, txt, scale)
    g_ring = jax.jit(jax.grad(ring_loss, argnums=(0, 1, 2)))(img, txt, scale)
    for gd, gr, name in zip(g_dense, g_ring, ["img", "txt", "scale"]):
        np.testing.assert_allclose(
            np.asarray(gr), np.asarray(gd), atol=2e-6, rtol=1e-4,
            err_msg=f"grad {name}",
        )


def test_ring_label_smoothing_matches_dense_on_mesh(mesh):
    img, txt = _features(6)
    scale = jnp.asarray(1.5)
    dense = float(clip_loss(img, txt, scale, label_smoothing=0.1))
    ring = _sharded(
        lambda i, t, s: ring_clip_loss(i, t, s, "data", label_smoothing=0.1),
        mesh, img, txt, scale,
    )
    np.testing.assert_allclose(ring, dense, rtol=1e-5)
