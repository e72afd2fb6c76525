"""CLIP encoder family: two-tower CLIP and single-trunk SharedCLIP in one module.

Counterparts:
  * two-tower CLIP ViT (reference Models/clipModel.py wrapping OpenAI clip.load, and the
    standard OpenCLIP wiring);
  * SharedCLIP — ONE transformer trunk shared by both modalities with modality stems and a
    shared projection (align_clip/model.py:144-259; the paper's architectural twist, asserted
    widths at model.py:165-169, EOT pooling at :242).

TPU-first decisions:
  * images are NHWC; patchify is a stride=patch conv (maps straight onto the MXU);
  * activations run in ``dtype`` (bf16 on TPU), params in f32; LayerNorm in f32;
  * ``causal`` masking for the shared trunk is an additive mask argument (one trunk, two
    compiled call sites) instead of mutating module state like the reference;
  * logit_scale is stored as a raw log-temperature scalar, clamped at use (clipLoss.py:105).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_tpu.models.config import CLIPConfig, VariationalConfig
from multimodal_tpu.models.layers import (  # noqa: I001
    quick_gelu,
    AttentionalPooler,
    LayerNorm,
    PatchDropout,
    Transformer,
)

Dtype = Any

LOGIT_SCALE_INIT = 2.6592  # ln(1/0.07), standard CLIP temperature init
LOGIT_SCALE_MAX = 4.6052  # ln(100) clamp (reference clipLoss.py:105, train.py:181-182)


def causal_additive_mask(seq_len: int, dtype=jnp.float32):
    """Additive [-inf upper triangle] mask for running a shared trunk causally."""
    mask = jnp.triu(jnp.full((seq_len, seq_len), -jnp.inf, dtype=dtype), k=1)
    return mask[None, None]  # [1, 1, S, S]



def _stream_pad(x, vcfg):
    """Pad a vision residual stream ONCE to the block kernel's 16-aligned length.

    Returns (padded_x, real_seq) — or (x, None) when stream padding does not apply.
    The trunk then runs every block at the padded length with ``kv_len=real_seq``
    (pad keys masked in-kernel) and the caller slices back to ``real_seq`` before any
    pooling. Deletes the ~10 ms/step of per-layer pad/slice HBM traffic the per-call
    padding in ops.block_attention costs at ViT-B/16 shapes (docs/DESIGN.md).

    Config gates: scaled_cosine / scale_heads route attention off the kernel path, and
    MoE MLPs route tokens through finite expert capacity (pad rows would contend with
    real rows), so those keep the unpadded per-call behavior."""
    if vcfg.scaled_cosine or vcfg.scale_heads or vcfg.moe_experts > 0:
        return x, None
    from multimodal_tpu.ops.block_attention import stream_pad_len

    b, s = x.shape[:2]
    s_pad = stream_pad_len(b, s, vcfg.width, vcfg.heads)
    if s_pad is None:
        return x, None
    return jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0))), s


def _resolve_act(name: str):
    """Config string -> activation ("quick_gelu" = OpenAI CLIP, "gelu" = OpenCLIP-style;
    reference factory.py:137-140 forces the former via --force-quick-gelu)."""
    if name == "quick_gelu":
        return quick_gelu
    if name == "gelu":
        return nn.gelu
    raise ValueError(f"unknown activation {name!r}")


class _PatchConvParams(nn.Module):
    """The patch-embed kernel with nn.Conv's parameter contract ([P, P, 3, W] f32,
    lecun_normal, path <name>/kernel) — consumed as a matmul by VisionStem."""

    patch_size: int
    width: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.patch_size, self.patch_size, 3, self.width),
            jnp.float32,
        )


class VisionStem(nn.Module):
    """Conv patchify + CLS + positional embedding + ln_pre -> token sequence
    (align_clip/transformer.py:329-459: the 'stem only' VisionEncoder).

    ``extra_tokens`` appends learnable tokens (e.g. the variational concentration token,
    variationalClip.py:253-270) after the patch tokens; the positional table is extended to
    match."""

    width: int
    patch_size: int
    image_size: int
    extra_tokens: int = 0
    patch_dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        b = images.shape[0]
        grid = self.image_size // self.patch_size
        seq_len = grid * grid + 1 + self.extra_tokens
        scale = self.width ** -0.5

        # Patchify as reshape + ONE [B*G^2, P^2*3] @ [P^2*3, W] matmul instead of nn.Conv:
        # mathematically identical for a non-overlapping stride-P conv, but XLA lowers the
        # strided conv (and its gradients) off the MXU fast path on v5e — profiled at
        # ~33 ms/step (3% MXU efficiency) for ViT-B/16 vs ~2 ms as a plain matmul. The
        # parameter keeps nn.Conv's exact name/shape/init ('patch_conv/kernel',
        # [P, P, 3, W], lecun_normal) so checkpoints and the torch interop are unchanged.
        import os

        p = self.patch_size
        kernel = _PatchConvParams(p, self.width, name="patch_conv")()
        # Default is the XLA strided conv: the profile shows it as a low-MXU-efficiency
        # fusion, but it OVERLAPS other work — the 30-step A/B measured it FASTER end to
        # end (B/32 2459 vs 2310, B/16 812.6 vs 806.9 samples/s/chip); the equivalent
        # patchify reshape+matmul (MMTPU_PATCHIFY_MATMUL=1) serializes a relayout of the
        # [B,H,W,3] activations ahead of the matmul and loses the overlap.
        if os.environ.get("MMTPU_PATCHIFY_MATMUL"):
            patches = images.astype(self.dtype).reshape(b, grid, p, grid, p, 3)
            patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(
                b * grid * grid, p * p * 3)
            x = (patches @ kernel.reshape(p * p * 3, self.width).astype(
                self.dtype)).reshape(b, grid * grid, self.width)
        else:
            x = jax.lax.conv_general_dilated(
                images.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(p, p), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).reshape(b, grid * grid, self.width)

        cls = self.param("class_embedding", nn.initializers.normal(scale), (self.width,))
        tokens = [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.width)), x]
        if self.extra_tokens:
            extra = self.param(
                "extra_embedding",
                nn.initializers.normal(1.0),  # variationalClip.py:198-200 uses std=1
                (self.extra_tokens, self.width),
            )
            tokens.append(jnp.broadcast_to(extra.astype(self.dtype), (b, self.extra_tokens, self.width)))
        x = jnp.concatenate(tokens, axis=1)

        pos = self.param(
            "positional_embedding", nn.initializers.normal(scale), (seq_len, self.width)
        )
        x = x + pos.astype(self.dtype)
        if self.patch_dropout > 0.0:
            x = PatchDropout(self.patch_dropout, num_prefix=1, name="patch_dropout")(
                x, deterministic=not train
            )
        return LayerNorm(name="ln_pre")(x)


class TextStem(nn.Module):
    """Token embedding + positional embedding -> token sequence
    (align_clip/transformer.py:462-541). ``extra_tokens`` appends learnable tokens after the
    context (variationalClip.py:322-331)."""

    width: int
    vocab_size: int
    context_length: int
    extra_tokens: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        b = tokens.shape[0]
        emb = nn.Embed(
            self.vocab_size,
            self.width,
            embedding_init=nn.initializers.normal(0.02),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="token_embedding",
        )(tokens)
        parts = [emb]
        if self.extra_tokens:
            extra = self.param(
                "extra_embedding",
                nn.initializers.normal(self.width ** -0.5),
                (self.extra_tokens, self.width),
            )
            parts.append(jnp.broadcast_to(extra.astype(self.dtype), (b, self.extra_tokens, self.width)))
        x = jnp.concatenate(parts, axis=1) if len(parts) > 1 else emb
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length + self.extra_tokens, self.width),
        )
        return x + pos.astype(self.dtype)


def eot_pool(x, tokens):
    """Pool the EOT position: argmax works because EOT (49407) is the largest token id
    (align_clip/model.py:242)."""
    idx = jnp.argmax(tokens, axis=-1)
    return jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]


class CLIP(nn.Module):
    """Two-tower CLIP, or SharedCLIP when cfg.share_trunk (one trunk + shared projection)."""

    cfg: CLIPConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.visual_stem = VisionStem(
            c.vision.width,
            c.vision.patch_size,
            c.vision.image_size,
            patch_dropout=c.vision.patch_dropout,
            dtype=self.dtype,
        )
        self.text_stem = TextStem(
            c.text.width, c.text.vocab_size, c.text.context_length, dtype=self.dtype
        )
        if c.vision.attentional_pool:
            self.attn_pool = AttentionalPooler(
                c.vision.width,
                n_head=c.vision.attn_pooler_heads,
                n_queries=c.vision.n_queries,
                dtype=self.dtype,
                name="attn_pool",
            )
        if c.share_trunk:
            # ls_init_value must agree across modalities for a shared trunk (model.py:169)
            assert c.vision.ls_init_value == c.text.ls_init_value
            self.trunk = Transformer(
                c.vision.width,
                c.vision.layers,
                c.vision.heads,
                c.vision.mlp_ratio,
                dtype=self.dtype,
                remat=c.remat,
            act=_resolve_act(c.act),
                ls_init_value=c.vision.ls_init_value,
                scaled_cosine=c.vision.scaled_cosine,
                scale_heads=c.vision.scale_heads,
                lora_rank=c.lora_rank,
                lora_alpha=c.lora_alpha,
                int8_fwd=c.int8_forward,
                name="transformer",
            )
            self.ln_post = LayerNorm(name="ln_post")
            # one shared projection for both modalities (model.py:192)
            self.projection = self.param(
                "projection",
                nn.initializers.normal(c.vision.width ** -0.5),
                (c.vision.width, c.embed_dim),
            )
        else:
            self.visual_trunk = Transformer(
                c.vision.width,
                c.vision.layers,
                c.vision.heads,
                c.vision.mlp_ratio,
                dtype=self.dtype,
                remat=c.remat,
            act=_resolve_act(c.act),
                ls_init_value=c.vision.ls_init_value,
                scaled_cosine=c.vision.scaled_cosine,
                scale_heads=c.vision.scale_heads,
                moe_experts=c.vision.moe_experts,
                moe_every=c.vision.moe_every,
                moe_top_k=c.vision.moe_top_k,
                moe_capacity_factor=c.vision.moe_capacity_factor,
                lora_rank=c.lora_rank,
                lora_alpha=c.lora_alpha,
                int8_fwd=c.int8_forward,
                name="visual_transformer",
            )
            self.text_trunk = Transformer(
                c.text.width,
                c.text.layers,
                c.text.heads,
                c.text.mlp_ratio,
                causal=True,
                dtype=self.dtype,
                remat=c.remat,
            act=_resolve_act(c.act),
                ls_init_value=c.text.ls_init_value,
                lora_rank=c.lora_rank,
                lora_alpha=c.lora_alpha,
                int8_fwd=c.int8_forward,
                name="text_transformer",
            )
            self.ln_post = LayerNorm(name="ln_post")
            self.ln_final = LayerNorm(name="ln_final")
            self.visual_projection = self.param(
                "visual_projection",
                nn.initializers.normal(c.vision.width ** -0.5),
                (c.vision.width, c.embed_dim),
            )
            self.text_projection = self.param(
                "text_projection",
                nn.initializers.normal(c.text.width ** -0.5),
                (c.text.width, c.embed_dim),
            )
        self.logit_scale = self.param(
            "logit_scale",
            nn.initializers.constant(
                LOGIT_SCALE_INIT if c.logit_scale_init is None else c.logit_scale_init
            ),
            (),
        )
        if c.logit_bias_init is not None:  # SigLIP pairwise-sigmoid head
            self.logit_bias = self.param(
                "logit_bias", nn.initializers.constant(c.logit_bias_init), ()
            )

    def _pool_image(self, x):
        """CLS (default), mean-pool, or attentional pooling (model.py:33-36,76-80)."""
        if self.cfg.vision.attentional_pool:
            x = self.attn_pool(x)
            return x[:, 0]
        if self.cfg.vision.global_average_pool:
            return jnp.mean(x, axis=1)
        return x[:, 0]

    def encode_image(self, images, normalize: bool = False, train: bool = False):
        x = self.visual_stem(images, train=train)
        x, real_s = _stream_pad(x, self.cfg.vision)
        trunk = self.trunk if self.cfg.share_trunk else self.visual_trunk
        x = trunk(x, kv_len=real_s)
        if real_s is not None:
            x = x[:, :real_s]
        pooled = self.ln_post(self._pool_image(x))
        proj = self.projection if self.cfg.share_trunk else self.visual_projection
        feats = pooled.astype(jnp.float32) @ proj
        if normalize:
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats

    def encode_text(self, tokens, normalize: bool = False):
        x = self.text_stem(tokens)
        if self.cfg.share_trunk:
            # static causal flag (not an additive runtime mask) so the shared trunk's
            # text pass dispatches to the fused block kernel like the vision pass;
            # numerically identical to causal_additive_mask (same -inf upper triangle)
            x = self.trunk(x, causal=True)
            pooled = self.ln_post(eot_pool(x, tokens))
            feats = pooled.astype(jnp.float32) @ self.projection
        else:
            x = self.text_trunk(x)
            pooled = self.ln_final(eot_pool(x, tokens))
            feats = pooled.astype(jnp.float32) @ self.text_projection
        if normalize:
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats

    def __call__(self, images, tokens, normalize: bool = True, train: bool = False):
        out = {
            "image_features": self.encode_image(images, normalize=normalize, train=train),
            "text_features": self.encode_text(tokens, normalize=normalize),
            "logit_scale": self.logit_scale,
        }
        if self.cfg.logit_bias_init is not None:
            out["logit_bias"] = self.logit_bias
        return out


class VariationalCLIP(nn.Module):
    """CLIP emitting distribution parameters: a learnable concentration token is appended to
    both towers; CLS/EOT -> mean projection, concentration token -> variance head with
    log-space learnable global scale and clamped exp (Models/variationalClip.py:30-380)."""

    cfg: CLIPConfig
    vcfg: VariationalConfig = VariationalConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.visual_stem = VisionStem(
            c.vision.width,
            c.vision.patch_size,
            c.vision.image_size,
            extra_tokens=1,
            dtype=self.dtype,
        )
        self.text_stem = TextStem(
            c.text.width,
            c.text.vocab_size,
            c.text.context_length,
            extra_tokens=1,
            dtype=self.dtype,
        )
        self.visual_trunk = Transformer(
            c.vision.width,
            c.vision.layers,
            c.vision.heads,
            c.vision.mlp_ratio,
            dtype=self.dtype,
            remat=c.remat,
            act=_resolve_act(c.act),
            lora_rank=c.lora_rank,
            lora_alpha=c.lora_alpha,
            int8_fwd=c.int8_forward,
            name="visual_transformer",
        )
        # text trunk is causal over context_length + 1 (mask rebuilt for the extra token,
        # variationalClip.py:172-175)
        self.text_trunk = Transformer(
            c.text.width,
            c.text.layers,
            c.text.heads,
            c.text.mlp_ratio,
            causal=True,
            dtype=self.dtype,
            remat=c.remat,
            act=_resolve_act(c.act),
            lora_rank=c.lora_rank,
            lora_alpha=c.lora_alpha,
            int8_fwd=c.int8_forward,
            name="text_transformer",
        )
        self.ln_post = LayerNorm(name="ln_post")
        self.ln_final = LayerNorm(name="ln_final")
        vscale, tscale = c.vision.width ** -0.5, c.text.width ** -0.5
        self.mean_image_projection = self.param(
            "mean_image_projection", nn.initializers.normal(vscale), (c.vision.width, c.embed_dim)
        )
        self.mean_text_projection = self.param(
            "mean_text_projection", nn.initializers.normal(tscale), (c.text.width, c.embed_dim)
        )
        var_dim = 1 if self.vcfg.model_type == "Spherical" else c.embed_dim
        self.var_image_projection = self.param(
            "var_image_projection", nn.initializers.normal(vscale), (c.vision.width, var_dim)
        )
        self.var_text_projection = self.param(
            "var_text_projection", nn.initializers.normal(tscale), (c.text.width, var_dim)
        )
        if self.vcfg.model_type == "Spherical":
            import numpy as np

            target = float(np.log(self.vcfg.initial_concentration - self.vcfg.min_concentration))
            self.log_concentration_scale_image = self.param(
                "log_concentration_scale_image", nn.initializers.constant(target), ()
            )
            self.log_concentration_scale_text = self.param(
                "log_concentration_scale_text", nn.initializers.constant(target), ()
            )
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(LOGIT_SCALE_INIT), ()
        )

    def _concentration(self, raw, log_scale):
        """log-space head with clamps (variationalClip.py:287-314): clamp(log_scale + raw,
        1e-3, 20) -> exp -> clamp [min_conc, max_conc]."""
        if self.vcfg.model_type == "Spherical":
            log_conc = jnp.clip(log_scale + raw[..., 0], 1e-3, 20.0)
            return jnp.clip(
                jnp.exp(log_conc), self.vcfg.min_concentration, self.vcfg.max_concentration
            )
        return jnp.exp(raw)  # Gaussian mode: per-dim variance

    def encode_image(self, images, train: bool = False):
        x = self.visual_stem(images, train=train)
        x, real_s = _stream_pad(x, self.cfg.vision)
        x = self.visual_trunk(x, kv_len=real_s)
        if real_s is not None:
            x = x[:, :real_s]  # before pooling: the conc token is the LAST real row
        mean = self.ln_post(x[:, 0]).astype(jnp.float32) @ self.mean_image_projection
        conc_tok = self.ln_post(x[:, -1]).astype(jnp.float32) @ self.var_image_projection
        scale = (
            self.log_concentration_scale_image if self.vcfg.model_type == "Spherical" else 0.0
        )
        return mean, self._concentration(conc_tok, scale)

    def encode_text(self, tokens):
        x = self.text_trunk(self.text_stem(tokens))
        mean = self.ln_final(eot_pool(x, tokens)).astype(jnp.float32) @ self.mean_text_projection
        conc_tok = self.ln_final(x[:, -1]).astype(jnp.float32) @ self.var_text_projection
        scale = (
            self.log_concentration_scale_text if self.vcfg.model_type == "Spherical" else 0.0
        )
        return mean, self._concentration(conc_tok, scale)

    def __call__(self, images, tokens, train: bool = False):
        image_mean, image_conc = self.encode_image(images, train=train)
        text_mean, text_conc = self.encode_text(tokens)
        return {
            "image_mean": image_mean,
            "image_concentration": image_conc,
            "text_mean": text_mean,
            "text_concentration": text_conc,
            "logit_scale": self.logit_scale,
        }
