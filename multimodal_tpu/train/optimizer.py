"""Optimizer assembly: AdamW with weight-decay exclusion + grad clip + non-finite skip.

Counterpart of reference AlignCLIP/main/run.py:279-296: AdamW where gains/biases (ndim < 2)
and logit_scale are excluded from weight decay; GradScaler is unnecessary on TPU (bf16 needs
no loss scaling) — NaN robustness comes from optax.apply_if_finite, the analogue of the
reference notebooks' NaN-grad skip loops (trainer.ipynb:cell 19)."""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class SkipIfNonfiniteState(NamedTuple):
    inner_state: optax.OptState
    notfinite_count: jnp.ndarray


def skip_if_nonfinite(inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """Exact step-skip on non-finite gradients with ONE fused pass over the grads.

    optax.apply_if_finite emits a per-leaf isfinite reduction plus a lax.cond around the
    whole update — measured at ~28 ms/step (20%) for ViT-B/32 on v5e (100 tiny kernels).
    Here: a single global sum-of-squares (finite iff every element is finite), the inner
    update always runs, and a scalar-predicate select keeps the old state/zero updates on
    the bad step — XLA fuses the selects into the update kernels."""

    def init(params):
        return SkipIfNonfiniteState(inner.init(params), jnp.zeros((), jnp.int32))

    def update(updates, state, params=None):
        total = sum(
            jnp.sum(jnp.square(u.astype(jnp.float32)))
            for u in jax.tree_util.tree_leaves(updates)
        )
        finite = jnp.isfinite(total)
        new_updates, new_inner = inner.update(updates, state.inner_state, params)
        pick = lambda a, b: jnp.where(finite, a, b)  # noqa: E731
        out_updates = jax.tree_util.tree_map(lambda u: pick(u, jnp.zeros_like(u)), new_updates)
        out_inner = jax.tree_util.tree_map(pick, new_inner, state.inner_state)
        count = jnp.where(finite, 0, state.notfinite_count + 1)
        return out_updates, SkipIfNonfiniteState(out_inner, count)

    return optax.GradientTransformation(init, update)


def wd_mask(params):
    """True where weight decay applies: ndim >= 2 and not the logit scale."""

    def is_decayed(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        return leaf.ndim >= 2 and "logit_scale" not in name

    return jax.tree_util.tree_map_with_path(is_decayed, params)


def make_optimizer(
    schedule,
    weight_decay: float = 0.2,
    beta1: float = 0.9,
    beta2: float = 0.98,
    eps: float = 1e-6,
    grad_clip_norm: Optional[float] = None,
    skip_nonfinite: bool = True,
    max_consecutive_nonfinite: int = 100,
):
    txs = []
    if grad_clip_norm is not None:
        txs.append(optax.clip_by_global_norm(grad_clip_norm))
    txs.append(
        optax.adamw(
            learning_rate=schedule,
            b1=beta1,
            b2=beta2,
            eps=eps,
            weight_decay=weight_decay,
            mask=wd_mask,
        )
    )
    tx = optax.chain(*txs)
    if skip_nonfinite:
        tx = skip_if_nonfinite(tx)
    return tx
