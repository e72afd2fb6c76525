"""CLIP-prefix captioning: GPT-2 LM + TransformerMapper, with KV-cached on-device decode.

Counterpart of reference Models/clipCaptionModel.py (the rmokady/CLIP_prefix_caption port):
  * ``TransformerMapper`` (clipCaptionModel.py:206-232): projects a CLIP embedding to
    ``prefix_length`` soft tokens — linear to prefix_len x width, concatenated with learned
    constant queries, run through a small transformer, constants' outputs are the prefix;
  * ``ClipCaptionModel`` (:234-284): prefix embeddings prepended to GPT-2 token embeddings,
    LM-head cross-entropy on the caption tokens (shifted labels);
  * token-by-token greedy/temperature decoding (metrics/captioning.py:178-231) — redesigned
    as a jitted ``lax.scan`` over a static-shape KV cache instead of a Python loop that
    re-encodes the full sequence every step.

The GPT-2 trunk is a from-scratch Flax implementation (standard GPT-2: learned positions,
pre-LN blocks, exact-tanh GELU, weight-tied LM head). ``load_hf_gpt2`` maps a HuggingFace
GPT2LMHeadModel state_dict onto it for pretrained decoding when weights are available
locally (the reference downloads gpt2 from the hub, clipCaptionModel.py:238).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    max_positions: int = 1024
    width: int = 768
    layers: int = 12
    heads: int = 12


TINY_GPT2 = GPT2Config(vocab_size=512, max_positions=128, width=64, layers=2, heads=2)


class GPT2Block(nn.Module):
    cfg: GPT2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cache=None, position: int = 0):
        """x: [B, T, W]. cache: optional (k, v) [B, max, H, D] for incremental decode —
        when given, x is the new suffix written at ``position`` and attention runs against
        the full cached history (causality is implied by the cache contents)."""
        c = self.cfg
        head_dim = c.width // c.heads
        b, t = x.shape[:2]

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(x.astype(jnp.float32)).astype(self.dtype)
        qkv = nn.Dense(3 * c.width, dtype=self.dtype, name="attn_qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, c.heads, head_dim)
        k = k.reshape(b, t, c.heads, head_dim)
        v = v.reshape(b, t, c.heads, head_dim)

        if cache is not None:
            ck, cv = cache
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, position, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, position, 0, 0))
            new_cache = (ck, cv)
            # attend over [0, position + t); positions beyond are masked below
            kk, vv = ck, cv
            k_len = ck.shape[1]
            k_pos = jnp.arange(k_len)[None, :]  # [1, K]
            q_pos = position + jnp.arange(t)[:, None]  # [T, 1]
            mask = (k_pos <= q_pos)[None, None]  # [1, 1, T, K]
        else:
            new_cache = None
            kk, vv = k, v
            k_len = t
            mask = jnp.tril(jnp.ones((t, t), bool))[None, None]

        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, kk, preferred_element_type=jnp.float32
        ) / np.sqrt(head_dim)
        logits = jnp.where(mask, logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, vv).reshape(b, t, c.width)
        attn = nn.Dense(c.width, dtype=self.dtype, name="attn_out")(attn)
        x = x + attn

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(4 * c.width, dtype=self.dtype, name="mlp_fc")(h)
        h = 0.5 * h * (1.0 + jnp.tanh(0.7978845608028654 * (h + 0.044715 * h**3)))  # gpt2 gelu
        h = nn.Dense(c.width, dtype=self.dtype, name="mlp_proj")(h)
        return x + h, new_cache


class GPT2(nn.Module):
    """GPT-2 over input EMBEDDINGS (the captioner feeds soft prefixes, not token ids)."""

    cfg: GPT2Config
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.wte = nn.Embed(c.vocab_size, c.width, dtype=self.dtype,
                            embedding_init=nn.initializers.normal(0.02), name="wte")
        self.wpe = self.param("wpe", nn.initializers.normal(0.01),
                              (c.max_positions, c.width))
        self.blocks = [GPT2Block(c, dtype=self.dtype, name=f"h_{i}") for i in range(c.layers)]
        self.ln_f = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_f")

    def embed(self, tokens):
        return self.wte(tokens)

    def __call__(self, embeds, caches=None, position: int = 0):
        """embeds [B, T, W] -> (logits [B, T, vocab], new_caches)."""
        t = embeds.shape[1]
        pos = jax.lax.dynamic_slice_in_dim(self.wpe, position, t, axis=0)
        x = embeds + pos.astype(self.dtype)
        new_caches = []
        for i, blk in enumerate(self.blocks):
            x, nc = blk(x, cache=None if caches is None else caches[i], position=position)
            new_caches.append(nc)
        x = self.ln_f(x.astype(jnp.float32))
        logits = x @ self.wte.embedding.astype(jnp.float32).T  # weight-tied head
        return logits, (new_caches if caches is not None else None)

    def init_cache(self, batch: int, max_len: int):
        c = self.cfg
        head_dim = c.width // c.heads
        return [
            (
                jnp.zeros((batch, max_len, c.heads, head_dim), self.dtype),
                jnp.zeros((batch, max_len, c.heads, head_dim), self.dtype),
            )
            for _ in range(c.layers)
        ]


class TransformerMapper(nn.Module):
    """CLIP embedding -> prefix_length GPT-2 soft tokens (clipCaptionModel.py:206-232):
    linear to prefix_len x width, concat learned constants, small transformer, take the
    constants' outputs."""

    clip_dim: int
    width: int
    prefix_length: int
    clip_length: int = 10
    layers: int = 8
    heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, clip_embed):  # [B, clip_dim]
        from multimodal_tpu.models.layers import Transformer

        b = clip_embed.shape[0]
        x = nn.Dense(self.clip_length * self.width, dtype=self.dtype, name="proj")(
            clip_embed.astype(self.dtype)
        ).reshape(b, self.clip_length, self.width)
        const = self.param(
            "prefix_const", nn.initializers.normal(0.02), (self.prefix_length, self.width)
        )
        x = jnp.concatenate(
            [x, jnp.broadcast_to(const.astype(self.dtype), (b, self.prefix_length, self.width))],
            axis=1,
        )
        x = Transformer(
            self.width, self.layers, self.heads, dtype=self.dtype,
            act=jax.nn.relu, name="transformer",
        )(x)
        return x[:, self.clip_length:]  # the transformed constants are the prefix


class ClipCaptionModel(nn.Module):
    """Prefix captioning LM (clipCaptionModel.py:234-284)."""

    gpt2: GPT2Config = dataclasses.field(default_factory=GPT2Config)
    clip_dim: int = 512
    prefix_length: int = 10
    clip_length: int = 10
    mapper_layers: int = 8
    use_transformer_mapper: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.lm = GPT2(self.gpt2, dtype=self.dtype)
        if self.use_transformer_mapper:
            self.mapper = TransformerMapper(
                self.clip_dim, self.gpt2.width, self.prefix_length,
                clip_length=self.clip_length, layers=self.mapper_layers, dtype=self.dtype,
            )
        else:  # MLP mapper variant (clipCaptionModel.py:25-58 used for small prefixes)
            self.mapper = nn.Sequential([
                nn.Dense((self.gpt2.width * self.prefix_length) // 2, dtype=self.dtype),
                jnp.tanh,
                nn.Dense(self.gpt2.width * self.prefix_length, dtype=self.dtype),
            ])

    def prefix(self, clip_embed):
        out = self.mapper(clip_embed)
        return out.reshape(clip_embed.shape[0], self.prefix_length, self.gpt2.width)

    def __call__(self, clip_embed, tokens, mask=None):
        """Training forward: returns per-token CE loss on caption tokens.

        clip_embed [B, clip_dim]; tokens [B, T] with 0 padding; loss on positions whose
        label is non-zero (shifted next-token prediction over the caption region)."""
        prefix = self.prefix(clip_embed)
        tok_emb = self.lm.embed(tokens)
        embeds = jnp.concatenate([prefix, tok_emb], axis=1)
        logits, _ = self.lm(embeds)
        # predict tokens[:, i] from position prefix_length + i - 1
        logits = logits[:, self.prefix_length - 1 : -1]  # [B, T, V]
        labels = tokens
        valid = (labels > 0) if mask is None else mask
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)

    def generate(self, clip_embed, key, max_len: int = 40, temperature: float = 0.0,
                 eos_token: int = 50256):
        """KV-cached decode (jitted lax.scan): greedy when temperature == 0, else sampled
        (metrics/captioning.py:178-231 semantics). Returns [B, max_len] int32, 0-padded
        after EOS."""
        prefix = self.prefix(clip_embed)
        b = prefix.shape[0]
        total = self.prefix_length + max_len
        caches = self.lm.init_cache(b, total)
        logits, caches = self.lm(prefix, caches=caches, position=0)
        last = logits[:, -1]

        def sample(logits, k):
            if temperature == 0.0:
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return jax.random.categorical(k, logits / temperature, axis=-1).astype(jnp.int32)

        def body(carry, i):
            last, caches, done, k = carry
            k, sub = jax.random.split(k)
            tok = sample(last, sub)
            tok = jnp.where(done, 0, tok)
            done = jnp.logical_or(done, tok == eos_token)
            emb = self.lm.embed(tok[:, None])
            logits, caches = self.lm(emb, caches=caches,
                                     position=self.prefix_length + i)
            return (logits[:, -1], caches, done, k), tok

        (_, _, _, _), toks = jax.lax.scan(
            body, (last, caches, jnp.zeros(b, bool), key), jnp.arange(max_len)
        )
        return jnp.transpose(toks, (1, 0))  # [B, max_len]


# ---------------------------------------------------------------------------
# HF GPT-2 weight interop
# ---------------------------------------------------------------------------


def load_hf_gpt2(state_dict, cfg: GPT2Config) -> dict:
    """HuggingFace GPT2LMHeadModel (or GPT2Model) state_dict -> flax GPT2 param subtree.
    HF Conv1D stores [in, out] — no transpose needed for our Dense [in, out] kernels."""
    sd = {k.removeprefix("transformer."): np.asarray(v) for k, v in state_dict.items()}
    p: dict = {
        "wte": {"embedding": sd["wte.weight"].astype(np.float32)},
        "wpe": sd["wpe.weight"].astype(np.float32)[: cfg.max_positions],
        "ln_f": {"scale": sd["ln_f.weight"].astype(np.float32),
                 "bias": sd["ln_f.bias"].astype(np.float32)},
    }
    for i in range(cfg.layers):
        b = f"h.{i}"
        p[f"h_{i}"] = {
            "ln_1": {"scale": sd[f"{b}.ln_1.weight"].astype(np.float32),
                     "bias": sd[f"{b}.ln_1.bias"].astype(np.float32)},
            "ln_2": {"scale": sd[f"{b}.ln_2.weight"].astype(np.float32),
                     "bias": sd[f"{b}.ln_2.bias"].astype(np.float32)},
            "attn_qkv": {"kernel": sd[f"{b}.attn.c_attn.weight"].astype(np.float32),
                         "bias": sd[f"{b}.attn.c_attn.bias"].astype(np.float32)},
            "attn_out": {"kernel": sd[f"{b}.attn.c_proj.weight"].astype(np.float32),
                         "bias": sd[f"{b}.attn.c_proj.bias"].astype(np.float32)},
            "mlp_fc": {"kernel": sd[f"{b}.mlp.c_fc.weight"].astype(np.float32),
                       "bias": sd[f"{b}.mlp.c_fc.bias"].astype(np.float32)},
            "mlp_proj": {"kernel": sd[f"{b}.mlp.c_proj.weight"].astype(np.float32),
                         "bias": sd[f"{b}.mlp.c_proj.bias"].astype(np.float32)},
        }
    return p
