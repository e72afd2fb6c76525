"""Transformer building blocks (Flax) — counterparts of align_clip/transformer.py:17-326.

Design notes (TPU-first):
  * LayerNorm always computes in float32 regardless of the compute dtype (the reference's
    LayerNormFp32, transformer.py:17-24) — bf16 LN is a known quality trap;
  * attention uses multimodal_tpu.ops.attention ([B,S,H,D] layout, Pallas-ready);
  * per-block rematerialization via flax nn.remat replaces torch.utils.checkpoint
    (transformer.py:319-326);
  * parameters live in float32 (param_dtype); activations follow ``dtype`` (bf16 on TPU);
  * ``causal`` is static module config (it selects a different compiled kernel), not a
    runtime argument.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_tpu.ops.attention import attention

Dtype = Any


def quick_gelu(x):
    """x * sigmoid(1.702 x) — CLIP's activation (align_clip/transformer.py:35-38)."""
    return x * jax.nn.sigmoid(1.702 * x)


class _LNCore(nn.Module):
    """f32-statistics / compute-dtype-arithmetic layer norm. Param names (scale, bias)
    match flax nn.LayerNorm so existing checkpoints and the torch interop keep working."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, params_only: bool = False):
        from multimodal_tpu.ops.block_attention import _ln_rows

        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        if params_only:  # caller folds the LN elsewhere (block-attention LN fusion)
            return scale, bias
        return _ln_rows(x, scale, bias, self.epsilon)


class LayerNorm(nn.Module):
    """LayerNorm with float32 statistics and compute-dtype arithmetic.

    Counterpart of the reference's LayerNormFp32 (transformer.py:17-24). The f32 part is
    what matters for quality (mean/var reductions; same fast-variance formula as flax);
    the normalize/scale arithmetic stays in the input dtype — the output was getting
    rounded back to it anyway, and this form guarantees no materialized f32 copies of the
    residual stream regardless of what XLA decides to fuse (bench-neutral on v5e today).
    The numerics live in ops.block_attention._ln_rows, the single source shared with the
    kernel-folded pre-LN path. The inner module is named LayerNorm_0 to keep the
    historical parameter tree."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, params_only: bool = False):
        return _LNCore(epsilon=self.epsilon, name="LayerNorm_0")(x, params_only=params_only)


class PatchDropout(nn.Module):
    """FLIP-style token dropout (align_clip/transformer.py:51-88): during training keep a
    random subset of the patch tokens (the CLS prefix always survives). Shrinks the sequence
    — a throughput lever, not a regularizer-only feature."""

    rate: float
    num_prefix: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate <= 0.0:
            return x
        b, s, w = x.shape
        num_patches = s - self.num_prefix
        keep = max(1, int(num_patches * (1.0 - self.rate)))
        rng = self.make_rng("patch_dropout")
        # per-example independent keep sets (transformer.py:75-80)
        noise = jax.random.uniform(rng, (b, num_patches))
        keep_idx = jnp.argsort(noise, axis=-1)[:, :keep] + self.num_prefix  # [B, keep]
        prefix = x[:, : self.num_prefix]
        kept = jnp.take_along_axis(x, keep_idx[..., None], axis=1)
        return jnp.concatenate([prefix, kept], axis=1)


class LayerScale(nn.Module):
    """Per-channel learnable residual-branch scale (align_clip/transformer.py:41-48),
    init gamma = init_values. Enabled via ls_init_value in the model config."""

    init_values: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_values), (dim,), jnp.float32
        )
        return x * gamma.astype(x.dtype)


class AttentionalPooler(nn.Module):
    """Learned-query cross-attention pooling (align_clip/transformer.py:167-190):
    n_queries learnable queries attend over the (LN'd) token sequence. Used by the vision
    tower when cfg.vision.attentional_pool (model.py:34-36)."""

    d_model: int
    n_head: int = 8
    n_queries: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        head_dim = self.d_model // self.n_head
        query = self.param(
            "query", nn.initializers.normal(1.0), (self.n_queries, self.d_model), jnp.float32
        )
        q_in = LayerNorm(name="ln_q")(
            jnp.broadcast_to(query.astype(x.dtype), (b, self.n_queries, self.d_model))
        )
        kv_in = LayerNorm(name="ln_k")(x)
        dense = lambda name, inp: nn.Dense(  # noqa: E731
            self.d_model,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(stddev=self.d_model ** -0.5),
            name=name,
        )(inp)
        q = dense("query_proj", q_in).reshape(b, self.n_queries, self.n_head, head_dim)
        k = dense("key_proj", kv_in).reshape(b, x.shape[1], self.n_head, head_dim)
        v = dense("value_proj", kv_in).reshape(b, x.shape[1], self.n_head, head_dim)
        out = attention(q, k, v).reshape(b, self.n_queries, self.d_model)
        return dense("out_proj", out)


class MLP(nn.Module):
    width: int
    expansion: float = 4.0
    act: Callable = quick_gelu
    dtype: Dtype = jnp.float32
    depth: int = 12  # total transformer depth, for the residual-branch init scaling
    lora_rank: int = 0
    lora_alpha: float = 16.0
    int8_fwd: bool = False  # SwitchBack int8 GEMMs (fwd + dx) — ops/quant.py

    @nn.compact
    def __call__(self, x, ln_params=None, residual: bool = False):
        import os

        # ln_params: raw (scale, bias) of the block's ln_2, handed in pre-LN so the fused
        # Pallas kernel (ops/block_mlp.py) can fold LN + both matmuls + activation + the
        # residual add into one program; residual=True returns x + mlp(LN(x)) directly
        if residual and ln_params is None:
            raise ValueError("residual=True requires ln_params (the pre-LN handoff)")
        x_in = x
        hidden = int(self.width * self.expansion)
        # CLIP init scheme (align_clip/model.py:199-208)
        lora = {"lora_rank": self.lora_rank, "lora_alpha": self.lora_alpha}
        w1, b1 = _DenseParams(
            hidden, (2 * self.width) ** -0.5, name="c_fc", **lora)(self.width)
        w2, b2 = _DenseParams(
            self.width, (self.width ** -0.5) * ((2 * self.depth) ** -0.5), name="c_proj",
            **lora,
        )(hidden)

        act_name = (
            "quick_gelu" if self.act is quick_gelu
            else "gelu" if self.act is nn.gelu
            else None
        )
        # The fused kernel is OPT-IN (MMTPU_BLOCK_MLP=1): the end-to-end A/B measured it
        # -3.6% on ViT-B/16 (815.5 vs 845.7 samples/s with the attention-residual fusion
        # held on) — XLA's MLP is already at its matmul floor and the kernel's saved
        # [T,4W] pre-activation + sequential weight-grad accumulation cost more than the
        # LN/residual traffic they delete (docs/DESIGN.md "fused MLP branch").
        use_kernel = (
            ln_params is not None
            and act_name is not None
            and not self.int8_fwd  # the fused bf16 kernel would bypass the int8 GEMMs
            and jax.devices()[0].platform == "tpu"
            and os.environ.get("MMTPU_BLOCK_MLP") == "1"
        )
        if use_kernel:
            from multimodal_tpu.ops.block_mlp import block_mlp, block_mlp_supported

            use_kernel = block_mlp_supported(self.width, hidden, act_name)
        if use_kernel:
            cast = lambda a: a.astype(self.dtype)  # noqa: E731
            return block_mlp(
                x, cast(w1), cast(b1), cast(w2), cast(b2),
                ln_scale=ln_params[0], ln_bias=ln_params[1],
                act=act_name, residual=residual,
            )

        if ln_params is not None:  # non-kernel path: apply the pre-LN here
            from multimodal_tpu.ops.block_attention import _ln_rows

            x = _ln_rows(x, ln_params[0], ln_params[1], 1e-5)
        if self.int8_fwd:
            from multimodal_tpu.ops.quant import int8_dense_train

            h = int8_dense_train(x, w1) + b1.astype(self.dtype)
            y = int8_dense_train(self.act(h), w2) + b2.astype(self.dtype)
        else:
            h = x @ w1.astype(self.dtype) + b1.astype(self.dtype)
            y = self.act(h) @ w2.astype(self.dtype) + b2.astype(self.dtype)
        return x_in + y if residual else y


class _DenseParams(nn.Module):
    """Raw kernel/bias parameters with nn.Dense's tree layout (<name>/kernel, <name>/bias) —
    lets one weight set drive either the composite XLA path or a fused Pallas kernel.

    ``lora_rank > 0`` adds a PEFT-style low-rank adapter (finetune.ipynb:cell 12): the
    returned kernel is W + (alpha/r) * A @ B with A ~ N(0, 1/r), B = 0 — the merge costs
    in*r*out MACs once per step (negligible) and keeps every downstream consumer (XLA
    matmuls AND the fused Pallas block kernels) on its unchanged fast path."""

    features: int
    stddev: float
    lora_rank: int = 0
    lora_alpha: float = 16.0

    @nn.compact
    def __call__(self, in_dim: int):
        kernel = self.param(
            "kernel", nn.initializers.normal(stddev=self.stddev), (in_dim, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        if self.lora_rank > 0:
            r = self.lora_rank
            lora_a = self.param(
                "lora_a", nn.initializers.normal(stddev=r ** -0.5), (in_dim, r),
                jnp.float32,
            )
            lora_b = self.param(
                "lora_b", nn.initializers.zeros, (r, self.features), jnp.float32
            )
            kernel = kernel + (self.lora_alpha / r) * (lora_a @ lora_b)
        return kernel, bias


class MultiHeadAttention(nn.Module):
    """Self-attention. ``scaled_cosine`` / ``scale_heads`` reproduce the reference's custom
    Attention options (align_clip/transformer.py:91-164): cosine-similarity logits with a
    per-head learnable temperature clamped at log(1/0.01), and a per-head learnable output
    scale. Those variants route through the XLA path (they change the logits themselves).

    On TPU at short sequence lengths the default path is the whole-block Pallas kernel
    (ops/block_attention.py) fusing QKV projections + attention + output projection."""

    width: int
    heads: int
    causal: bool = False
    dtype: Dtype = jnp.float32
    depth: int = 12
    scaled_cosine: bool = False
    scale_heads: bool = False
    logit_scale_max: float = 4.6052  # log(1/0.01), transformer.py:98
    lora_rank: int = 0
    lora_alpha: float = 16.0

    @nn.compact
    def __call__(self, x, mask=None, ln_params=None, causal: bool = False,
                 fuse_residual: bool = False, kv_len: int | None = None):
        import os

        # fuse_residual: return the complete residual update x + attn(LN(x)) so the
        # block kernel can fold the add in-VMEM (requires the pre-LN handoff)
        # kv_len: the tower holds a stream-padded sequence (ops.block_attention.
        # stream_pad_len); keys >= kv_len are masked on every path
        if fuse_residual and ln_params is None:
            raise ValueError("fuse_residual requires ln_params (the pre-LN handoff)")
        x_in = x
        # call-time causal (static python bool) lets a SHARED trunk run its text pass
        # through the fused block kernel instead of an additive runtime mask, which
        # would force the XLA path (model.py:175-194's one-trunk-two-modalities design)
        causal = causal or self.causal
        head_dim = self.width // self.heads
        b, s = x.shape[:2]
        # separate q/k/v projections: a fused [W, 3W] Dense + split emits XLA layout copies
        # for every block (measured ~22% slower text-tower fwd on v5e)
        attn_std = self.width ** -0.5
        out_std = (self.width ** -0.5) * ((2 * self.depth) ** -0.5)
        lora = {"lora_rank": self.lora_rank, "lora_alpha": self.lora_alpha}
        wq, bq = _DenseParams(self.width, attn_std, name="query", **lora)(self.width)
        wk, bk = _DenseParams(self.width, attn_std, name="key", **lora)(self.width)
        wv, bv = _DenseParams(self.width, attn_std, name="value", **lora)(self.width)
        wo, bo = _DenseParams(self.width, out_std, name="out", **lora)(self.width)

        use_block_kernel = (
            not self.scaled_cosine
            and mask is None
            and jax.devices()[0].platform == "tpu"
            and not os.environ.get("MMTPU_DISABLE_BLOCK_ATTN")
        )
        if use_block_kernel:
            from multimodal_tpu.ops.block_attention import (
                block_attn_supported,
                block_attention,
            )

            use_block_kernel = block_attn_supported(b, s, self.width, self.heads)
        if use_block_kernel and not self.scale_heads:
            cast = lambda a: a.astype(self.dtype)  # noqa: E731
            ln_kw = (
                {"ln_scale": ln_params[0], "ln_bias": ln_params[1]}
                if ln_params is not None
                else {}
            )
            return block_attention(
                x,
                cast(wq), cast(bq), cast(wk), cast(bk), cast(wv), cast(bv),
                cast(wo), cast(bo),
                heads=self.heads,
                causal=causal,
                residual=fuse_residual,
                kv_len=kv_len,
                **ln_kw,
            )

        if kv_len is not None and kv_len < s:
            # stream-padded stream on a non-kernel path: mask the pad keys additively
            # (same -1e30 the kernel uses), identical real-row numerics
            pad_mask = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, s), 3) < kv_len, 0.0, -1e30
            )
            mask = pad_mask if mask is None else mask + pad_mask
        if ln_params is not None:  # non-kernel path: apply the pre-LN here
            from multimodal_tpu.ops.block_attention import _ln_rows

            x = _ln_rows(x, ln_params[0], ln_params[1], 1e-5)
        proj = lambda w_, b_: (  # noqa: E731
            x @ w_.astype(self.dtype) + b_.astype(self.dtype)
        )
        q, k, v = proj(wq, bq), proj(wk, bk), proj(wv, bv)
        q = q.reshape(b, s, self.heads, head_dim)
        k = k.reshape(b, s, self.heads, head_dim)
        v = v.reshape(b, s, self.heads, head_dim)
        if self.scaled_cosine:
            logit_scale = self.param(
                "logit_scale",
                nn.initializers.constant(jnp.log(10.0)),
                (self.heads,),
                jnp.float32,
            )
            qn = q * jax.lax.rsqrt(
                jnp.sum(jnp.square(q.astype(jnp.float32)), -1, keepdims=True) + 1e-12
            ).astype(q.dtype)
            kn = k * jax.lax.rsqrt(
                jnp.sum(jnp.square(k.astype(jnp.float32)), -1, keepdims=True) + 1e-12
            ).astype(k.dtype)
            # fold exp(clamped per-head scale) into q; undo attention()'s 1/sqrt(D)
            temp = jnp.exp(jnp.clip(logit_scale, None, self.logit_scale_max))
            qn = qn * (temp * (head_dim ** 0.5)).astype(q.dtype)[None, None, :, None]
            out = attention(qn, kn, v, causal=causal, mask=mask, impl="xla")
        else:
            out = attention(q, k, v, causal=causal, mask=mask)
        if self.scale_heads:
            head_scale = self.param(
                "head_scale", nn.initializers.ones, (self.heads,), jnp.float32
            )
            out = out * head_scale.astype(out.dtype)[None, None, :, None]
        out = out.reshape(b, s, self.width)
        out = out @ wo.astype(out.dtype) + bo.astype(out.dtype)
        return x_in + out if fuse_residual else out


class ResidualBlock(nn.Module):
    """Pre-LN residual attention block (align_clip/transformer.py:193-248)."""

    width: int
    heads: int
    mlp_ratio: float = 4.0
    causal: bool = False
    act: Callable = quick_gelu
    dtype: Dtype = jnp.float32
    depth: int = 12
    ls_init_value: float | None = None  # LayerScale on both residual branches (:208,219)
    scaled_cosine: bool = False
    scale_heads: bool = False
    moe_experts: int = 0  # >0: MoE MLP with this many experts (models/moe.py)
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    lora_rank: int = 0
    lora_alpha: float = 16.0
    int8_fwd: bool = False

    @nn.compact
    def __call__(self, x, mask=None, causal: bool = False, kv_len: int | None = None):
        ls = (
            (lambda name: LayerScale(self.ls_init_value, name=name))
            if self.ls_init_value is not None
            else (lambda name: (lambda y: y))
        )
        # ln_1 is handed to the attention as raw (scale, bias) so the block kernel can
        # fold it in-VMEM; every consumer path applies the identical _ln_rows numerics.
        # Without LayerScale the residual add itself also moves into the attention
        # (kernel-fused where available): attn returns x + branch directly.
        fuse_res = self.ls_init_value is None
        attn_out = MultiHeadAttention(
            self.width,
            self.heads,
            causal=self.causal,
            dtype=self.dtype,
            depth=self.depth,
            scaled_cosine=self.scaled_cosine,
            scale_heads=self.scale_heads,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            name="attn",
        )(
            x,
            mask=mask,
            ln_params=LayerNorm(name="ln_1")(x, params_only=True),
            causal=causal,
            fuse_residual=fuse_res,
            kv_len=kv_len,
        )
        x = attn_out if fuse_res else x + ls("ls_1")(attn_out)
        if self.moe_experts > 0:
            from multimodal_tpu.models.moe import MoEMLP

            mlp = MoEMLP(
                self.width,
                self.moe_experts,
                self.mlp_ratio,
                act=self.act,
                dtype=self.dtype,
                depth=self.depth,
                top_k=self.moe_top_k,
                capacity_factor=self.moe_capacity_factor,
                name="moe_mlp",
            )
        else:
            mlp = MLP(
                self.width,
                self.mlp_ratio,
                act=self.act,
                dtype=self.dtype,
                depth=self.depth,
                lora_rank=self.lora_rank,
                lora_alpha=self.lora_alpha,
                int8_fwd=self.int8_fwd,
                name="mlp",
            )
            if self.ls_init_value is None:
                # pre-LN handoff + fused residual: on TPU the whole branch runs as one
                # Pallas program (ops/block_mlp.py); elsewhere MLP applies the identical
                # _ln_rows numerics itself, so the two paths quantize the same
                return mlp(
                    x,
                    ln_params=LayerNorm(name="ln_2")(x, params_only=True),
                    residual=True,
                )
        x = x + ls("ls_2")(mlp(LayerNorm(name="ln_2")(x)))
        return x


class Transformer(nn.Module):
    """Stack of residual blocks with optional per-block remat
    (align_clip/transformer.py:292-326)."""

    width: int
    layers: int
    heads: int
    mlp_ratio: float = 4.0
    causal: bool = False
    act: Callable = quick_gelu
    dtype: Dtype = jnp.float32
    remat: bool = False
    ls_init_value: float | None = None
    scaled_cosine: bool = False
    scale_heads: bool = False
    moe_experts: int = 0  # MoE MLPs on every moe_every-th block (GShard convention)
    moe_every: int = 2
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    lora_rank: int = 0
    lora_alpha: float = 16.0
    int8_fwd: bool = False

    @nn.compact
    def __call__(self, x, mask=None, causal: bool = False, kv_len: int | None = None):
        # causal/kv_len are static python values (argnums 3/4 counting self) — they
        # select different compiled kernels, so remat must treat them as static
        block_cls = (
            nn.remat(ResidualBlock, static_argnums=(3, 4)) if self.remat else ResidualBlock
        )
        for i in range(self.layers):
            is_moe = self.moe_experts > 0 and (i % self.moe_every == self.moe_every - 1)
            x = block_cls(
                self.width,
                self.heads,
                self.mlp_ratio,
                causal=self.causal,
                act=self.act,
                dtype=self.dtype,
                depth=self.layers,
                ls_init_value=self.ls_init_value,
                scaled_cosine=self.scaled_cosine,
                scale_heads=self.scale_heads,
                moe_experts=self.moe_experts if is_moe else 0,
                moe_top_k=self.moe_top_k,
                moe_capacity_factor=self.moe_capacity_factor,
                lora_rank=self.lora_rank,
                lora_alpha=self.lora_alpha,
                int8_fwd=self.int8_fwd,
                name=f"resblock_{i}",
            )(x, mask, causal, kv_len)
        return x
