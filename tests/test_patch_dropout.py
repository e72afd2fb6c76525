"""PatchDropout (FLIP-style token drop, align_clip/transformer.py:51-88)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tpu.models import add_model_config, create_model, init_params
from multimodal_tpu.models.layers import PatchDropout

add_model_config(
    "tiny-pd",
    {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 32, "patch_size": 8, "width": 64, "layers": 2,
                       "heads": 2, "patch_dropout": 0.5},
        "text_cfg": {"context_length": 16, "vocab_size": 512, "width": 64, "layers": 2,
                     "heads": 2},
    },
)


def test_patch_dropout_shapes_and_prefix():
    x = jnp.arange(2 * 9 * 4, dtype=jnp.float32).reshape(2, 9, 4)
    pd = PatchDropout(0.5)
    out = pd.apply({}, x, deterministic=False, rngs={"patch_dropout": jax.random.PRNGKey(0)})
    assert out.shape == (2, 1 + 4, 4)  # 8 patches -> keep 4, CLS survives
    np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(x[:, 0]))
    # eval mode: identity
    same = pd.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(x))


def test_model_trains_with_patch_dropout_and_evals_full():
    model = create_model("tiny-pd")
    params = init_params(model)
    images = jnp.ones((2, 32, 32, 3))
    tokens = jnp.zeros((2, 16), jnp.int32).at[:, 0].set(511)

    # eval: deterministic, no rng needed
    out_eval = model.apply(params, images, tokens)
    assert out_eval["image_features"].shape == (2, 32)

    # train: tokens dropped, still produces grads
    def loss(p, rng):
        out = model.apply(p, images, tokens, train=True, rngs={"patch_dropout": rng})
        return jnp.sum(out["image_features"] ** 2)

    g = jax.grad(loss)(params, jax.random.PRNGKey(1))
    gn = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0

    # different rngs -> different features (dropout is live)
    a = model.apply(params, images, tokens, train=True,
                    rngs={"patch_dropout": jax.random.PRNGKey(2)})["image_features"]
    b = model.apply(params, images, tokens, train=True,
                    rngs={"patch_dropout": jax.random.PRNGKey(3)})["image_features"]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_factory_force_patch_dropout():
    m = create_model("tiny-test", patch_dropout=0.25)
    assert m.cfg.vision.patch_dropout == 0.25
