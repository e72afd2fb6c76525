"""Int8-quantized CLIP encoders — the high-throughput serving path.

W8A8 dynamic quantization of every large matmul in the two-tower CLIP forward (attn
q/k/v/out, MLP c_fc/c_proj, final projections) on the MXU's 2x-rate int8 path
(ops/quant.py); everything precision-sensitive stays in high precision: LayerNorm (f32
statistics, as in models/layers.py), softmax attention (bf16 via ops/attention.py), the
patch conv / token embeddings, biases, and the L2 normalize.

The forward mirrors models/clip.py:284-320 (two-tower, CLS/EOT pooling) over the SAME
params tree — ``quantize_clip_params`` converts a trained/loaded tree once at serving-load
time (int8 kernels + per-column scales; 4x smaller weight stream), and the functional
encoders below consume it. Accuracy is gated by tests: quantized embeddings stay within
cosine > 0.99 of the f32 encoder on both towers.

Counterpart of the reference's serving-side extractor (papers-1-and-2/clip_embeddings.py)
— which has no quantized mode; this is a beyond-reference capability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multimodal_tpu.ops.attention import attention
from multimodal_tpu.ops.quant import int8_matmul, quantize_weight

_QUANT_DENSE = ("query", "key", "value", "out", "c_fc", "c_proj")


def quantize_clip_params(params, cfg):
    """Convert a CLIP params tree: tower Dense kernels -> (int8 kernel, f32 col scales).

    Leaves named <dense>/kernel under the tower blocks and the final projections are
    replaced by {'kernel_q': int8, 'scale': f32}; everything else passes through.
    """
    assert not cfg.share_trunk and not cfg.vision.attentional_pool, (
        "quantized serving covers the two-tower CLIP family"
    )
    # the quantized forward below implements the PLAIN pre-LN block only; reject any
    # config whose blocks carry extra structure it would silently drop (accuracy gate
    # in tests only covers configs that pass these)
    unsupported = {
        "ls_init_value": cfg.vision.ls_init_value or cfg.text.ls_init_value,
        "scaled_cosine": cfg.vision.scaled_cosine,
        "scale_heads": cfg.vision.scale_heads,
        "moe_experts": cfg.vision.moe_experts,
    }
    bad = [k for k, v in unsupported.items() if v]
    assert not bad, f"quantized serving does not support {bad} (plain pre-LN blocks only)"
    assert cfg.act in ("quick_gelu", "gelu"), f"unsupported activation {cfg.act!r}"

    def convert(tree):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                if (
                    isinstance(v, dict)
                    and k in _QUANT_DENSE
                    and "kernel" in v
                    and getattr(v["kernel"], "ndim", 0) == 2
                ):
                    wq, scale = quantize_weight(v["kernel"])
                    out[k] = {"kernel_q": wq, "scale": scale,
                              **({"bias": v["bias"]} if "bias" in v else {})}
                else:
                    out[k] = convert(v)
            return out
        return tree

    p = convert(params["params"])
    for proj in ("visual_projection", "text_projection"):
        wq, scale = quantize_weight(p[proj])
        p[proj] = {"kernel_q": wq, "scale": scale}
    return {"params": p}


def _qdense(p, x, out_dtype=jnp.bfloat16):
    return int8_matmul(x, p["kernel_q"], p["scale"], bias=p.get("bias"),
                       out_dtype=out_dtype)


def _ln(p, x):
    from multimodal_tpu.ops.block_attention import _ln_rows

    inner = p["LayerNorm_0"]
    return _ln_rows(x, inner["scale"], inner["bias"], 1e-5)


def _block(p, x, heads: int, causal: bool, act: str = "quick_gelu"):
    """Pre-LN residual block (models/layers.py:289-334) with int8 projections."""
    b, s, w = x.shape
    d = w // heads
    h_in = _ln(p["ln_1"], x)
    q = _qdense(p["attn"]["query"], h_in).reshape(b, s, heads, d)
    k = _qdense(p["attn"]["key"], h_in).reshape(b, s, heads, d)
    v = _qdense(p["attn"]["value"], h_in).reshape(b, s, heads, d)
    o = attention(q, k, v, causal=causal, impl="xla").reshape(b, s, w)
    x = x + _qdense(p["attn"]["out"], o)
    h = _ln(p["ln_2"], x)
    h = _qdense(p["mlp"]["c_fc"], h)
    if act == "quick_gelu":
        h = h * jax.nn.sigmoid(1.702 * h)  # layers.quick_gelu
    else:
        h = jax.nn.gelu(h, approximate=True)  # matches clip._resolve_act's nn.gelu
    x = x + _qdense(p["mlp"]["c_proj"], h)
    return x


def encode_image_q(qparams, cfg, images, normalize: bool = True):
    """Quantized twin of CLIP.encode_image (models/clip.py:293-305), uint8/float input."""
    p = qparams["params"]
    v = cfg.vision
    if images.dtype == jnp.uint8:
        from multimodal_tpu.data.preprocess import normalize_images

        images = normalize_images(images)
    stem = p["visual_stem"]
    b = images.shape[0]
    grid = v.image_size // v.patch_size
    x = jax.lax.conv_general_dilated(
        images.astype(jnp.bfloat16),
        stem["patch_conv"]["kernel"].astype(jnp.bfloat16),
        window_strides=(v.patch_size, v.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(b, grid * grid, v.width)
    cls = jnp.broadcast_to(
        stem["class_embedding"].astype(x.dtype), (b, 1, v.width)
    )
    x = jnp.concatenate([cls, x], axis=1) + stem["positional_embedding"].astype(x.dtype)
    x = _ln(stem["ln_pre"], x)
    for i in range(v.layers):
        x = _block(p["visual_transformer"][f"resblock_{i}"], x, v.heads, causal=False,
                   act=cfg.act)
    pooled = jnp.mean(x, axis=1) if v.global_average_pool else x[:, 0]
    pooled = _ln(p["ln_post"], pooled)
    feats = _qdense(p["visual_projection"], pooled, out_dtype=jnp.float32)
    if normalize:
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats


def encode_text_q(qparams, cfg, tokens, normalize: bool = True):
    """Quantized twin of CLIP.encode_text (models/clip.py:307-320)."""
    p = qparams["params"]
    t = cfg.text
    stem = p["text_stem"]
    x = stem["token_embedding"]["embedding"].astype(jnp.bfloat16)[tokens]
    x = x + stem["positional_embedding"].astype(x.dtype)
    for i in range(t.layers):
        x = _block(p["text_transformer"][f"resblock_{i}"], x, t.heads, causal=True,
                   act=cfg.act)
    eot = jnp.take_along_axis(x, jnp.argmax(tokens, axis=-1)[:, None, None], axis=1)[:, 0]
    pooled = _ln(p["ln_final"], eot)
    feats = _qdense(p["text_projection"], pooled, out_dtype=jnp.float32)
    if normalize:
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats
