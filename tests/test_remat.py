"""Gradient checkpointing (remat) must not change the math — only the memory profile."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tpu.models import create_model, init_params


def test_remat_grads_identical():
    base = create_model("tiny-test")
    remat = create_model("tiny-test", remat=True)
    params = init_params(base, jax.random.PRNGKey(0))
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    tokens = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 1, 999)

    def loss(model, p):
        out = model.apply(p, images, tokens)
        return jnp.sum(out["image_features"] ** 2) + jnp.sum(out["text_features"] ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(base, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(remat, p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5)
