"""Step-wise LR schedules: linear warmup + {cosine, const, const-cooldown}.

Counterpart of reference AlignCLIP/main/scheduler.py:17-57 — same three shapes, expressed as
optax-compatible schedule functions (step -> lr) instead of optimizer-mutating closures."""

from __future__ import annotations

import jax.numpy as jnp


def _warmup(base_lr, step, warmup_steps):
    return base_lr * (step + 1) / jnp.maximum(warmup_steps, 1)


def const_lr(base_lr: float, warmup_steps: int):
    """scheduler.py:17-25."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.where(step < warmup_steps, _warmup(base_lr, step, warmup_steps), base_lr)

    return schedule


def const_lr_cooldown(
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    cooldown_steps: int,
    cooldown_power: float = 1.0,
    cooldown_end_lr: float = 0.0,
):
    """scheduler.py:28-44: const after warmup, polynomial decay over the final cooldown."""
    start_cooldown = total_steps - cooldown_steps

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        decay_progress = jnp.clip((step - start_cooldown) / jnp.maximum(cooldown_steps, 1), 0.0, 1.0)
        decay = (1.0 - decay_progress) ** cooldown_power
        cooled = decay * (base_lr - cooldown_end_lr) + cooldown_end_lr
        main = jnp.where(step < start_cooldown, base_lr, cooled)
        return jnp.where(step < warmup_steps, _warmup(base_lr, step, warmup_steps), main)

    return schedule


def cosine_lr(base_lr: float, warmup_steps: int, total_steps: int):
    """scheduler.py:47-57: cosine decay to 0 after linear warmup."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        progress = jnp.clip(
            (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1), 0.0, 1.0
        )
        decayed = 0.5 * (1.0 + jnp.cos(jnp.pi * progress)) * base_lr
        return jnp.where(step < warmup_steps, _warmup(base_lr, step, warmup_steps), decayed)

    return schedule


def make_schedule(
    name: str,
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    cooldown_steps: int = 0,
    cooldown_power: float = 1.0,
    cooldown_end_lr: float = 0.0,
):
    """Dispatch used by the train CLI (--lr-scheduler, run.py:325-341)."""
    if name == "cosine":
        return cosine_lr(base_lr, warmup_steps, total_steps)
    if name == "const":
        return const_lr(base_lr, warmup_steps)
    if name == "const-cooldown":
        return const_lr_cooldown(
            base_lr, warmup_steps, total_steps, cooldown_steps, cooldown_power, cooldown_end_lr
        )
    raise ValueError(f"unknown scheduler {name!r}")
