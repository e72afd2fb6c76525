"""Mixture-of-Experts MLP + expert parallelism (the 'ep' scale-out axis).

The reference stack is dense-only; this is the TPU-native sparse-capacity extension for
scaling encoder parameter count without scaling per-token FLOPs (Switch/GShard routing).
Design is einsum-first so the MXU sees big batched matmuls and GSPMD sees a clean sharding
problem:

  * experts live as STACKED parameters [E, ...] — dim 0 shards over an 'expert' mesh axis
    (parallel/ep.py); with tokens sharded over 'data', XLA's GSPMD inserts the
    dispatch/return all-to-alls for the einsums below, exactly the GShard program;
  * routing is top-k (k=1 Switch, k=2 GShard) with a capacity factor; overflowed tokens
    fall through the residual connection (standard drop semantics, deterministic);
  * routing happens WITHIN GROUPS (GShard's token groups; here one group per
    image/sequence, i.e. the natural [B, S, W] batch dim), so the one-hot
    dispatch/combine tensors are [G, S, E, C] with C ~ cf*S*k/E — memory linear in
    batch, not the O(T^2) a flat [T, E, C] dispatch over T = B*S tokens would cost;
  * dispatch/combine are one-hot einsums, not gathers/scatters — scalar scatter is the
    one thing the MXU cannot do; one-hot contractions it does at full rate;
  * the router runs in float32 (routing decisions are precision-sensitive) and the
    load-balance auxiliary loss (num_experts * mean_e[frac_tokens_e * mean_prob_e]) is
    sown into the 'moe_losses' collection for the train step to collect.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def load_balance_loss(router_probs, expert_mask):
    """Switch-Transformer aux loss: E * sum_e f_e * p_e, minimized (=1) at uniform routing.

    router_probs: [..., S, E] softmax probs; expert_mask: [..., S, E] one-hot of the chosen
    expert(s) (summed over k for top-k). f_e/p_e are means over the token axis; any leading
    (group) dims are averaged. Differentiable through the probs term only, as published.
    """
    num_experts = router_probs.shape[-1]
    frac_tokens = jnp.mean(expert_mask, axis=-2)  # f_e, not differentiable (argmax)
    mean_probs = jnp.mean(router_probs, axis=-2)  # p_e, differentiable
    return num_experts * jnp.mean(jnp.sum(frac_tokens * mean_probs, axis=-1))


class MoEMLP(nn.Module):
    """Drop-in replacement for models.layers.MLP with E experts and top-k routing."""

    width: int
    num_experts: int
    expansion: float = 4.0
    act: Callable = None
    dtype: Dtype = jnp.float32
    depth: int = 12
    top_k: int = 1
    capacity_factor: float = 1.25

    @nn.compact
    def __call__(self, x):
        from multimodal_tpu.models.layers import quick_gelu

        act = self.act or quick_gelu
        b, s, w = x.shape
        e = self.num_experts
        hidden = int(self.width * self.expansion)
        # GShard group-wise routing: one group per image/sequence, capacity per group.
        # Keeps dispatch/combine at [G,S,E,C] (linear in batch) instead of O(T^2).
        capacity = max(1, int(self.capacity_factor * s * self.top_k / e))

        # router in f32; tiny [G,S,E] matmul, negligible next to the expert FLOPs
        logits = nn.Dense(e, dtype=jnp.float32, param_dtype=jnp.float32,
                          kernel_init=nn.initializers.normal(stddev=w ** -0.5),
                          name="router")(x.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)  # [G,S,E]

        # top-k dispatch: iterate k rounds, masking chosen experts between rounds so the
        # one-hot algebra stays a fixed-shape einsum program
        remaining = probs
        dispatch = jnp.zeros((b, s, e, capacity), jnp.float32)
        combine = jnp.zeros((b, s, e, capacity), jnp.float32)
        mask_sum = jnp.zeros((b, s, e), jnp.float32)
        # position counters must be shared across rounds so two rounds never assign the
        # same (expert, slot): accumulate assigned one-hots round by round
        assigned = jnp.zeros((b, s, e), jnp.float32)
        for _ in range(self.top_k):
            idx = jnp.argmax(remaining, axis=-1)  # [G,S]
            onehot = jax.nn.one_hot(idx, e, dtype=jnp.float32)  # [G,S,E]
            gate = jnp.sum(probs * onehot, axis=-1)  # [G,S]
            # slot position of each token within its expert's per-group capacity,
            # counting earlier rounds' kept assignments
            pos = (jnp.cumsum(onehot, axis=1) - 1
                   + jnp.sum(assigned, axis=1)[:, None, :])  # [G,S,E]
            pos = jnp.sum(pos * onehot, axis=-1)  # [G,S]
            keep = (pos < capacity).astype(jnp.float32) * jnp.sum(onehot, axis=-1)
            slot = jax.nn.one_hot(pos.astype(jnp.int32), capacity, dtype=jnp.float32)
            disp_k = (onehot * keep[..., None])[..., :, None] * slot[..., None, :]
            dispatch = dispatch + disp_k
            combine = combine + disp_k * gate[..., None, None]
            mask_sum = mask_sum + onehot
            assigned = assigned + onehot * keep[..., None]
            remaining = remaining * (1.0 - onehot)

        aux = load_balance_loss(probs, mask_sum)
        self.sow("moe_losses", "load_balance", aux)

        if self.top_k > 1:  # renormalize combine weights over the chosen experts
            denom = jnp.sum(combine, axis=(2, 3), keepdims=True)
            combine = combine / jnp.maximum(denom, 1e-9)

        fc_init = nn.initializers.normal(stddev=(2 * self.width) ** -0.5)
        proj_init = nn.initializers.normal(
            stddev=(self.width ** -0.5) * ((2 * self.depth) ** -0.5)
        )
        w1 = self.param("w1", fc_init, (e, w, hidden), jnp.float32)
        b1 = self.param("b1", nn.initializers.zeros, (e, hidden), jnp.float32)
        w2 = self.param("w2", proj_init, (e, hidden, w), jnp.float32)
        b2 = self.param("b2", nn.initializers.zeros, (e, w), jnp.float32)

        cd = self.dtype
        # all-to-all in: [G,S,E,C]x[G,S,W] -> [G,E,C,W] (g on 'data', e on 'expert')
        xe = jnp.einsum("gsec,gsw->gecw", dispatch.astype(cd), x.astype(cd))
        h = act(jnp.einsum("gecw,ewh->gech", xe, w1.astype(cd))
                + b1.astype(cd)[None, :, None, :])
        ye = (jnp.einsum("gech,ehw->gecw", h, w2.astype(cd))
              + b2.astype(cd)[None, :, None, :])
        # all-to-all back: [G,S,E,C]x[G,E,C,W] -> [G,S,W]
        return jnp.einsum("gsec,gecw->gsw", combine.astype(cd), ye)


def collect_moe_losses(mutated_vars) -> jnp.ndarray:
    """Sum every sown load-balance term (one per MoE layer); 0.0 if none."""
    col = mutated_vars.get("moe_losses", {}) if mutated_vars else {}
    leaves = jax.tree_util.tree_leaves(col)
    if not leaves:
        return jnp.float32(0.0)
    return sum(jnp.sum(leaf) for leaf in leaves)
