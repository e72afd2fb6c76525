"""Optional encoder blocks from the reference surface: LayerScale, scaled-cosine attention,
head scaling, attentional/global-average pooling, ResizeMaxSize, HFTokenizer.

Reference: align_clip/transformer.py:41-48 (LayerScale), :91-164 (custom Attention),
:167-190 (AttentionalPooler); model.py:30-36,76-80 (cfg + pooling);
transform.py:29-53 (ResizeMaxSize); tokenizer.py:191-214 (HFTokenizer).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_tpu.models import create_model, init_params
from multimodal_tpu.models.config import add_model_config
from multimodal_tpu.models.layers import (
    AttentionalPooler,
    LayerScale,
    MultiHeadAttention,
    ResidualBlock,
)


def test_layer_scale_init_and_scale():
    ls = LayerScale(init_values=1e-2)
    x = jnp.ones((2, 3, 8))
    params = ls.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(params["params"]["gamma"], 1e-2)
    out = ls.apply(params, x)
    np.testing.assert_allclose(out, 1e-2 * np.ones((2, 3, 8)), rtol=1e-6)


def test_residual_block_layer_scale_shrinks_update():
    """With tiny gamma the block output stays near the input (the point of LayerScale)."""
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 64))
    blk = ResidualBlock(width=64, heads=4, ls_init_value=1e-6)
    params = blk.init(jax.random.PRNGKey(2), x)
    assert "ls_1" in params["params"] and "ls_2" in params["params"]
    out = blk.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-3)


def _torch_cosine_attention(x, params, heads):
    """Reference semantics of transformer.py:119-131 in numpy: cosine-sim logits scaled by
    exp(clamped per-head logit_scale)."""
    b, s, w = x.shape
    d = w // heads
    p = params["params"]

    def dense(name):
        return x @ np.asarray(p[name]["kernel"]) + np.asarray(p[name]["bias"])

    q = dense("query").reshape(b, s, heads, d)
    k = dense("key").reshape(b, s, heads, d)
    v = dense("value").reshape(b, s, heads, d)
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    kn = k / np.linalg.norm(k, axis=-1, keepdims=True)
    temp = np.exp(np.minimum(np.asarray(p["logit_scale"]), 4.6052))
    logits = np.einsum("bqhd,bkhd->bhqk", qn, kn) * temp[None, :, None, None]
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    out = np.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, w)
    return out @ np.asarray(p["out"]["kernel"]) + np.asarray(p["out"]["bias"])


def test_scaled_cosine_attention_matches_reference_math():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 9, 32))
    mha = MultiHeadAttention(width=32, heads=4, scaled_cosine=True)
    params = mha.init(jax.random.PRNGKey(4), x)
    got = np.asarray(mha.apply(params, x))
    want = _torch_cosine_attention(np.asarray(x), jax.device_get(params), 4)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_scale_heads_param_and_effect():
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 6, 32))
    mha = MultiHeadAttention(width=32, heads=4, scale_heads=True)
    params = mha.init(jax.random.PRNGKey(6), x)
    base = mha.apply(params, x)
    # zeroing head_scale kills everything but the output bias
    p2 = jax.tree_util.tree_map(lambda a: a, params)
    p2 = {"params": dict(p2["params"])}
    p2["params"]["head_scale"] = jnp.zeros(4)
    out = mha.apply(p2, x)
    bias = params["params"]["out"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.broadcast_to(bias, out.shape), atol=1e-6)
    assert not np.allclose(np.asarray(base), np.asarray(out))


def test_attentional_pooler_shape_and_grad():
    x = jax.random.normal(jax.random.PRNGKey(7), (3, 17, 64))
    pooler = AttentionalPooler(d_model=64, n_head=4, n_queries=8)
    params = pooler.init(jax.random.PRNGKey(8), x)
    out = pooler.apply(params, x)
    assert out.shape == (3, 8, 64)
    g = jax.grad(lambda p: jnp.sum(pooler.apply(p, x) ** 2))(params)
    gn = jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)
    assert float(gn) > 0


@pytest.mark.parametrize("pool", ["global_average_pool", "attentional_pool"])
def test_clip_pooling_modes(pool):
    add_model_config(
        f"tiny-{pool}",
        {
            "embed_dim": 16,
            "vision_cfg": {
                "image_size": 32, "patch_size": 8, "width": 32, "layers": 2, "heads": 2,
                pool: True, "n_queries": 4, "attn_pooler_heads": 2,
            },
            "text_cfg": {
                "context_length": 12, "vocab_size": 64, "width": 32, "layers": 2, "heads": 2,
            },
        },
    )
    model = create_model(f"tiny-{pool}")
    params = init_params(model)
    images = jnp.zeros((2, 32, 32, 3))
    tokens = jnp.zeros((2, 12), jnp.int32).at[:, 0].set(1).at[:, 3].set(63)
    out = model.apply(params, images, tokens)
    assert out["image_features"].shape == (2, 16)
    assert np.all(np.isfinite(np.asarray(out["image_features"])))
    if pool == "attentional_pool":
        assert "attn_pool" in params["params"]


def test_layer_scale_in_model_config():
    add_model_config(
        "tiny-ls",
        {
            "embed_dim": 16,
            "vision_cfg": {
                "image_size": 32, "patch_size": 8, "width": 32, "layers": 2, "heads": 2,
                "ls_init_value": 1e-4,
            },
            "text_cfg": {
                "context_length": 12, "vocab_size": 64, "width": 32, "layers": 2, "heads": 2,
                "ls_init_value": 1e-4,
            },
        },
    )
    model = create_model("tiny-ls")
    params = init_params(model)
    vt = params["params"]["visual_transformer"]["resblock_0"]
    assert "ls_1" in vt and "ls_2" in vt


def test_resize_max_size_letterbox():
    from PIL import Image

    from multimodal_tpu.data.preprocess import resize_max_size

    img = Image.new("RGB", (100, 50), (255, 0, 0))
    out = resize_max_size(img, 64)
    assert out.size == (64, 64)
    arr = np.asarray(out)
    # the 100x50 image scales to 64x32, centered: rows 16..47 are red, the rest fill
    assert (arr[:16] == 0).all() and (arr[48:] == 0).all()
    assert (arr[20:44, :, 0] == 255).all()
    # no-op when already at max size
    same = resize_max_size(Image.new("RGB", (64, 64)), 64)
    assert same.size == (64, 64)


def test_hf_tokenizer_wrapper():
    transformers = pytest.importorskip("transformers")
    import os

    from multimodal_tpu.data import HFTokenizer

    # offline-friendly: build a tiny fast tokenizer locally instead of hub download
    try:
        from transformers import GPT2TokenizerFast

        tok = None
        for path in (os.path.expanduser("~/.cache/huggingface"),):
            pass
        hf = HFTokenizer.__new__(HFTokenizer)
        from tokenizers import Tokenizer
        from tokenizers.models import WordLevel
        from tokenizers.pre_tokenizers import Whitespace
        from transformers import PreTrainedTokenizerFast

        vocab = {"[PAD]": 0, "[UNK]": 1, "hello": 2, "world": 3}
        t = Tokenizer(WordLevel(vocab, unk_token="[UNK]"))
        t.pre_tokenizer = Whitespace()
        hf.tokenizer = PreTrainedTokenizerFast(
            tokenizer_object=t, pad_token="[PAD]", unk_token="[UNK]"
        )
    except Exception:
        pytest.skip("tokenizers backend unavailable")
    ids = hf(["hello world", "world"], context_length=6)
    assert ids.shape == (2, 6) and ids.dtype == np.int32
    assert ids[0, 0] == 2 and ids[0, 1] == 3 and ids[0, 2] == 0
    assert ids[1, 0] == 3
