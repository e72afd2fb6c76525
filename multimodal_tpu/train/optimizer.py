"""Optimizer assembly: AdamW with weight-decay exclusion + grad clip + non-finite skip.

Counterpart of reference AlignCLIP/main/run.py:279-296: AdamW where gains/biases (ndim < 2)
and logit_scale are excluded from weight decay; GradScaler is unnecessary on TPU (bf16 needs
no loss scaling) — NaN robustness comes from optax.apply_if_finite, the analogue of the
reference notebooks' NaN-grad skip loops (trainer.ipynb:cell 19)."""

from __future__ import annotations

from typing import Optional

import jax
import optax


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
        tx = optax.apply_if_finite(tx, max_consecutive_errors=max_consecutive_nonfinite)
    return tx
