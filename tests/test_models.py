"""Encoder family tests: shapes, pooling semantics, shared-trunk wiring, variational heads.

Mirrors the intent of the reference's ClipInterface contract (Models/clipInterface.py:9-57)
and the SharedCLIP/VariationalCLIP structural requirements (align_clip/model.py:144-259,
Models/variationalClip.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_tpu.models import (
    VariationalConfig,
    create_model,
    example_inputs,
    get_model_config,
    init_params,
    list_models,
    param_count,
)


def test_registry_lists_models():
    models = list_models()
    for name in ["ViT-B-32", "ViT-B-16", "ViT-B-16-512", "ViT-L-16", "tiny-test"]:
        assert name in models


def test_scaleup_configs_parse():
    """ViT-H-14 / ViT-g-14 (beyond reference: OpenCLIP's published scale-up
    hyperparameters). Their head_dims (80/88) fall outside the block-kernel support
    set, so they must dispatch to the fallback attention paths; g-14's fractional
    mlp_ratio must floor to exactly the published 6144 hidden width."""
    h = get_model_config("ViT-H-14")
    assert (h.vision.width, h.vision.layers, h.vision.patch_size) == (1280, 32, 14)
    assert h.vision.width // h.vision.heads == 80
    assert h.text.width == 1024 and h.text.layers == 24
    assert h.act == "gelu"
    g = get_model_config("ViT-g-14")
    assert (g.vision.width, g.vision.layers) == (1408, 40)
    assert int(g.vision.width * g.vision.mlp_ratio) == 6144
    from multimodal_tpu.ops.block_attention import block_attn_supported

    # head dims 80/88 dispatch to the block kernel by default since the +27% H/14 A/B
    for cfg in (h, g):
        seq = (cfg.vision.image_size // cfg.vision.patch_size) ** 2 + 1
        assert block_attn_supported(8, seq, cfg.vision.width, cfg.vision.heads)


@pytest.mark.parametrize("name", ["tiny-test", "tiny-test-shared"])
def test_forward_shapes(name):
    model = create_model(name)
    params = init_params(model)
    images, tokens = example_inputs(model.cfg, batch=3)
    out = model.apply(params, images, tokens)
    assert out["image_features"].shape == (3, model.cfg.embed_dim)
    assert out["text_features"].shape == (3, model.cfg.embed_dim)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["image_features"]), axis=-1), 1.0, rtol=1e-5
    )
    assert out["logit_scale"].shape == ()
    assert float(out["logit_scale"]) == pytest.approx(2.6592, abs=1e-4)


def test_shared_trunk_actually_shared():
    model = create_model("tiny-test-shared")
    params = init_params(model)
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = ["/".join(str(k.key) for k in path if hasattr(k, "key")) for path, _ in flat]
    trunk_names = [n for n in names if "transformer" in n]
    assert trunk_names, names
    assert all("visual_transformer" not in n and "text_transformer" not in n for n in names)
    assert any(n.endswith("projection") for n in names)
    # two-tower model has separate trunks
    model2 = create_model("tiny-test")
    params2 = init_params(model2)
    names2 = [
        "/".join(str(k.key) for k in path if hasattr(k, "key"))
        for path, _ in jax.tree_util.tree_leaves_with_path(params2)
    ]
    assert any("visual_transformer" in n for n in names2)
    assert any("text_transformer" in n for n in names2)


def test_eot_pooling_position_matters():
    """Moving the EOT token must change text features (argmax pooling, model.py:242)."""
    model = create_model("tiny-test")
    params = init_params(model)
    _, tokens = example_inputs(model.cfg, batch=1)
    feats_a = model.apply(params, method=model.encode_text, tokens=tokens)
    tokens_b = tokens.at[:, 3].set(5).at[:, 7].set(model.cfg.text.vocab_size - 1)
    feats_b = model.apply(params, method=model.encode_text, tokens=tokens_b)
    assert not np.allclose(np.asarray(feats_a), np.asarray(feats_b))


def test_causal_text_future_tokens_do_not_leak():
    """With causal masking, tokens after EOT must not affect the pooled feature."""
    for name in ["tiny-test", "tiny-test-shared"]:
        model = create_model(name)
        params = init_params(model)
        _, tokens = example_inputs(model.cfg, batch=1)
        # EOT at position 3; change a token *after* it
        tokens_b = tokens.at[:, 10].set(7)
        fa = model.apply(params, method=model.encode_text, tokens=tokens)
        fb = model.apply(params, method=model.encode_text, tokens=tokens_b)
        np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), atol=1e-5)


def test_variational_heads():
    vcfg = VariationalConfig(min_concentration=10.0, initial_concentration=200.0)
    model = create_model("tiny-test", variational=True, vcfg=vcfg)
    params = init_params(model)
    images, tokens = example_inputs(model.cfg, batch=4)
    out = model.apply(params, images, tokens)
    assert out["image_mean"].shape == (4, model.cfg.embed_dim)
    assert out["image_concentration"].shape == (4,)
    assert out["text_concentration"].shape == (4,)
    conc = np.asarray(out["image_concentration"])
    # clamped to [min_concentration, 1e12]; init targets ~initial_concentration
    assert (conc >= 10.0).all() and (conc <= 1e12).all()
    assert 20.0 < conc.mean() < 2000.0


def test_variational_gaussian_mode():
    vcfg = VariationalConfig(model_type="Gaussian")
    model = create_model("tiny-test", variational=True, vcfg=vcfg)
    params = init_params(model)
    images, tokens = example_inputs(model.cfg, batch=2)
    out = model.apply(params, images, tokens)
    assert out["image_concentration"].shape == (2, model.cfg.embed_dim)
    assert (np.asarray(out["image_concentration"]) > 0).all()


def test_bf16_compute_f32_params():
    model = create_model("tiny-test", dtype=jnp.bfloat16)
    params = init_params(model)
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float32
    images, tokens = example_inputs(model.cfg)
    out = model.apply(params, images, tokens)
    assert out["image_features"].dtype == jnp.float32  # projections lift to f32
    assert np.isfinite(np.asarray(out["image_features"])).all()


def test_remat_matches_no_remat():
    a = create_model("tiny-test")
    b = create_model("tiny-test", remat=True)
    params = init_params(a)
    images, tokens = example_inputs(a.cfg)
    fa = a.apply(params, images, tokens)
    fb = b.apply(params, images, tokens)
    np.testing.assert_allclose(
        np.asarray(fa["image_features"]), np.asarray(fb["image_features"]), atol=1e-6
    )


def test_param_count_vit_b32():
    model = create_model("ViT-B-32")
    params = jax.eval_shape(lambda: init_params(model))
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    # OpenAI CLIP ViT-B/32: ~151.3M params
    assert 140e6 < n < 160e6, n


def test_static_causal_matches_additive_mask():
    """trunk(x, causal=True) must equal trunk(x, causal_additive_mask(S)): the shared
    trunk's text pass uses the static flag (so it can dispatch to the fused kernel)
    while the additive mask remains the general-mask reference semantics
    (align_clip/model.py:230-243 causal text pass through the shared transformer)."""
    from multimodal_tpu.models.clip import causal_additive_mask
    from multimodal_tpu.models.layers import Transformer

    for remat in (False, True):
        trunk = Transformer(width=32, layers=2, heads=2, remat=remat)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 9, 32)), jnp.float32)
        params = trunk.init(jax.random.PRNGKey(0), x)
        via_flag = trunk.apply(params, x, causal=True)
        via_mask = trunk.apply(params, x, causal_additive_mask(9))
        np.testing.assert_allclose(
            np.asarray(via_flag), np.asarray(via_mask), atol=1e-6, err_msg=f"remat={remat}"
        )
        # and the flag must actually mask: bidirectional differs
        bidi = trunk.apply(params, x)
        assert not np.allclose(np.asarray(via_flag), np.asarray(bidi))
