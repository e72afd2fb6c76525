"""Checkpoint interop: torch state_dict -> flax tree, verified by NUMERIC parity.

The strongest gate in the suite: a freshly-built torch CLIP (OpenAI architecture — pre-LN
residual blocks, nn.MultiheadAttention, QuickGELU, EOT-argmax pooling, causal text mask;
the architecture of Models/clipModel.py's clip.load target and align_clip/transformer.py)
runs the same inputs as our JAX encoders loaded through convert_torch_state_dict. Embeddings
must match to float tolerance — this pins down the name mapping (incl. in_proj qkv split
order), transposes, LN semantics, pooling and masking all at once."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_tpu.models import create_model, init_params  # noqa: E402
from multimodal_tpu.models.checkpoint_interop import (  # noqa: E402
    convert_torch_state_dict,
    resize_pos_embed,
)
from multimodal_tpu.models.config import add_model_config, get_model_config  # noqa: E402

WIDTH, LAYERS, HEADS, EMBED = 64, 2, 2, 32
IMG, PATCH, CTX, VOCAB = 32, 16, 16, 1000

add_model_config(
    "interop-test",
    {
        "embed_dim": EMBED,
        "vision_cfg": {"image_size": IMG, "patch_size": PATCH, "width": WIDTH,
                       "layers": LAYERS, "heads": HEADS},
        "text_cfg": {"context_length": CTX, "vocab_size": VOCAB, "width": WIDTH,
                     "layers": LAYERS, "heads": HEADS},
    },
)


class QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class Block(nn.Module):
    """OpenAI CLIP ResidualAttentionBlock (sequence-first LND layout)."""

    def __init__(self, width, heads):
        super().__init__()
        self.attn = nn.MultiheadAttention(width, heads)
        self.ln_1 = nn.LayerNorm(width)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(width, width * 4))
        self.mlp.add_module("gelu", QuickGELU())
        self.mlp.add_module("c_proj", nn.Linear(width * 4, width))
        self.ln_2 = nn.LayerNorm(width)

    def forward(self, x, attn_mask=None):
        y = self.ln_1(x)
        x = x + self.attn(y, y, y, need_weights=False, attn_mask=attn_mask)[0]
        return x + self.mlp(self.ln_2(x))


class TorchCLIP(nn.Module):
    """OpenAI-CLIP-architecture twin, dimension-parameterized: the tiny defaults drive the
    fast parity tests; real ViT-B/32 dimensions (vision 768×12, text 512×12, vocab 49408)
    drive the full-size production-shape gate below."""

    def __init__(self, vision_width=WIDTH, vision_layers=LAYERS, vision_heads=HEADS,
                 image_size=IMG, patch=PATCH, text_width=WIDTH, text_layers=LAYERS,
                 text_heads=HEADS, ctx=CTX, vocab=VOCAB, embed=EMBED):
        super().__init__()
        vscale = vision_width ** -0.5
        tscale = text_width ** -0.5
        grid = image_size // patch
        self.ctx = ctx

        class Visual(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Conv2d(3, vision_width, patch, patch, bias=False)
                self.class_embedding = nn.Parameter(vscale * torch.randn(vision_width))
                self.positional_embedding = nn.Parameter(
                    vscale * torch.randn(grid * grid + 1, vision_width)
                )
                self.ln_pre = nn.LayerNorm(vision_width)
                self.transformer = nn.Module()
                self.transformer.resblocks = nn.ModuleList(
                    Block(vision_width, vision_heads) for _ in range(vision_layers)
                )
                self.ln_post = nn.LayerNorm(vision_width)
                self.proj = nn.Parameter(vscale * torch.randn(vision_width, embed))

        self.visual = Visual()
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            Block(text_width, text_heads) for _ in range(text_layers)
        )
        self.token_embedding = nn.Embedding(vocab, text_width)
        self.positional_embedding = nn.Parameter(0.01 * torch.randn(ctx, text_width))
        self.ln_final = nn.LayerNorm(text_width)
        self.text_projection = nn.Parameter(tscale * torch.randn(text_width, embed))
        self.logit_scale = nn.Parameter(torch.tensor(2.6592))

    def encode_image(self, images):  # images NCHW
        v = self.visual
        x = v.conv1(images).flatten(2).transpose(1, 2)  # [B, G*G, W]
        cls = v.class_embedding.expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + v.positional_embedding
        x = v.ln_pre(x).permute(1, 0, 2)  # LND
        for blk in v.transformer.resblocks:
            x = blk(x)
        x = x.permute(1, 0, 2)
        return v.ln_post(x[:, 0]) @ v.proj

    def encode_text(self, tokens):
        x = self.token_embedding(tokens) + self.positional_embedding
        mask = torch.full((self.ctx, self.ctx), float("-inf")).triu(1)
        x = x.permute(1, 0, 2)
        for blk in self.transformer.resblocks:
            x = blk(x, attn_mask=mask)
        x = x.permute(1, 0, 2)
        pooled = x[torch.arange(x.shape[0]), tokens.argmax(dim=-1)]
        return self.ln_final(pooled) @ self.text_projection


@pytest.fixture(scope="module")
def torch_and_jax():
    torch.manual_seed(0)
    tm = TorchCLIP().eval()
    cfg = get_model_config("interop-test")
    jm = create_model("interop-test")
    params = convert_torch_state_dict(tm.state_dict(), cfg)
    template = init_params(jm)
    # converted tree must be drop-in for the template
    flat_a = jax.tree_util.tree_structure(params)
    flat_b = jax.tree_util.tree_structure(jax.tree_util.tree_map(np.asarray, template))
    assert flat_a == flat_b
    return tm, jm, params


def test_image_embedding_parity(torch_and_jax):
    tm, jm, params = torch_and_jax
    rng = np.random.default_rng(0)
    images = rng.standard_normal((3, IMG, IMG, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tm.encode_image(torch.from_numpy(images).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(jm.apply(params, jnp.asarray(images), method=jm.encode_image))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_text_embedding_parity(torch_and_jax):
    tm, jm, params = torch_and_jax
    rng = np.random.default_rng(1)
    tokens = rng.integers(1, VOCAB - 2, (3, CTX)).astype(np.int32)
    tokens[:, 0] = VOCAB - 1  # make argmax pooling well-defined at a fixed position
    with torch.no_grad():
        ref = tm.encode_text(torch.from_numpy(tokens).long()).numpy()
    got = np.asarray(jm.apply(params, jnp.asarray(tokens), method=jm.encode_text))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_ddp_prefix_stripping(torch_and_jax):
    tm, jm, _ = torch_and_jax
    cfg = get_model_config("interop-test")
    wrapped = {"state_dict": {f"module.{k}": v for k, v in tm.state_dict().items()}}
    params = convert_torch_state_dict(wrapped, cfg)
    assert "visual_stem" in params["params"]


def test_pos_embed_resize_roundtrip():
    pos = np.random.default_rng(2).standard_normal((5, 8)).astype(np.float32)  # 2x2 grid + cls
    bigger = resize_pos_embed(pos, 17)  # 4x4 grid + cls
    assert bigger.shape == (17, 8)
    np.testing.assert_array_equal(bigger[0], pos[0])  # CLS untouched
    same = resize_pos_embed(pos, 5)
    np.testing.assert_array_equal(same, pos)


def test_shape_mismatch_raises(torch_and_jax):
    tm, _, _ = torch_and_jax
    sd = dict(tm.state_dict())
    sd["text_projection"] = torch.zeros(WIDTH, EMBED + 1)
    from multimodal_tpu.models.checkpoint_interop import _check_tree_match

    cfg = get_model_config("interop-test")
    bad = convert_torch_state_dict(sd, cfg)
    jm = create_model("interop-test")
    with pytest.raises(ValueError, match="shape mismatch"):
        _check_tree_match(bad, jax.tree_util.tree_map(np.asarray, init_params(jm)))


def test_export_round_trip_two_tower():
    """export_torch_state_dict is the exact inverse of convert_torch_state_dict."""
    import numpy as np
    from multimodal_tpu.models import (
        convert_torch_state_dict, create_model, export_torch_state_dict, init_params,
    )

    model = create_model("tiny-test")
    params = init_params(model)
    sd = export_torch_state_dict(params, model.cfg)
    back = convert_torch_state_dict(sd, model.cfg)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = {tuple(str(getattr(k, "key", k)) for k in p): v
              for p, v in jax.tree_util.tree_flatten_with_path(back)[0]}
    for path, a in flat_a:
        key = tuple(str(getattr(k, "key", k)) for k in path)
        np.testing.assert_allclose(np.asarray(a, np.float32), flat_b[key], atol=1e-6,
                                   err_msg="/".join(key))
    # and a reference-format consumer sees the canonical names
    assert "visual.conv1.weight" in sd and "text_projection" in sd
    assert sd["visual.conv1.weight"].shape[2:] == (16, 16)


def test_export_round_trip_shared_trunk():
    import numpy as np
    from multimodal_tpu.models import (
        convert_torch_state_dict, create_model, export_torch_state_dict, init_params,
    )

    model = create_model("tiny-test-shared")
    params = init_params(model)
    sd = export_torch_state_dict(params, model.cfg)
    assert "projection" in sd and "transformer.resblocks.0.attn.in_proj_weight" in sd
    back = convert_torch_state_dict(sd, model.cfg)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(back)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x, np.float32), y, atol=1e-6)


@pytest.mark.slow
def test_full_size_vitb32_interop(tmp_path):
    """Production-shape golden gate: a REAL-dimension ViT-B/32 torch twin (49,408-row
    token embedding, 768-wide fused in_proj split, 50-token vision pos grid, separate
    512-wide text tower) saved as a .pt and loaded through load_pretrained must
    reproduce both towers' embeddings; the same checkpoint then loads into a 256-px
    template, exercising resize_pos_embed on the real 7x7 -> 8x8 grid
    (align_clip/model.py:311-343, Models/clipModel.py:17)."""
    from multimodal_tpu.models.checkpoint_interop import load_pretrained

    torch.manual_seed(7)
    tm = TorchCLIP(
        vision_width=768, vision_layers=12, vision_heads=12, image_size=224, patch=32,
        text_width=512, text_layers=12, text_heads=8, ctx=77, vocab=49408, embed=512,
    ).eval()
    pt = tmp_path / "vitb32_random.pt"
    torch.save(tm.state_dict(), pt)

    jm = create_model("ViT-B-32")
    params = load_pretrained(str(pt), jax.tree_util.tree_map(np.asarray, init_params(jm)),
                             jm.cfg)

    rng = np.random.default_rng(0)
    images = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    tokens = np.zeros((2, 77), np.int64)
    tokens[:, 0] = 49406
    tokens[0, 1:6] = rng.integers(1, 49000, 5)
    tokens[0, 6] = 49407
    tokens[1, 1:11] = rng.integers(1, 49000, 10)
    tokens[1, 11] = 49407

    with torch.no_grad():
        t_img = tm.encode_image(torch.from_numpy(images).permute(0, 3, 1, 2)).numpy()
        t_txt = tm.encode_text(torch.from_numpy(tokens)).numpy()

    j_img = np.asarray(jm.apply(params, jnp.asarray(images), method=jm.encode_image))
    j_txt = np.asarray(jm.apply(params, jnp.asarray(tokens), method=jm.encode_text))
    # 12 layers of f32 accumulation on different backends: compare to ~1e-3 absolute
    # on O(1)-magnitude embeddings (the tiny twin pins the exact mapping at 1e-5)
    np.testing.assert_allclose(j_img, t_img, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(j_txt, t_txt, rtol=2e-3, atol=2e-3)

    # same checkpoint into a 256-px model: pos grid 50 -> 65 via bicubic resize on load
    add_model_config(
        "vitb32-i256-test",
        {
            "embed_dim": 512,
            "vision_cfg": {"image_size": 256, "patch_size": 32, "width": 768,
                           "layers": 12, "heads": 12},
            "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 512,
                         "layers": 12, "heads": 8},
        },
    )
    jm256 = create_model("vitb32-i256-test")
    params256 = load_pretrained(
        str(pt), jax.tree_util.tree_map(np.asarray, init_params(jm256)), jm256.cfg)
    pos = params256["params"]["visual_stem"]["positional_embedding"]
    assert pos.shape == (65, 768)
    # CLS row passes through the resize untouched
    np.testing.assert_allclose(
        np.asarray(pos[0]), tm.visual.positional_embedding.detach().numpy()[0], atol=1e-6)
    out256 = jm256.apply(
        params256, jnp.asarray(rng.standard_normal((1, 256, 256, 3)).astype(np.float32)),
        method=jm256.encode_image)
    assert np.isfinite(np.asarray(out256)).all()
