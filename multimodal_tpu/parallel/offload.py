"""Optimizer-state host offload: AdamW moments live in pinned host RAM, not HBM.

The standard TPU answer when a model's optimizer state prices it out of its best batch
(docs/DESIGN.md: ViT-g/14 is pinned at batch 24 by HBM with remat measured net-negative;
bf16 moments already halve the state, offload removes it from HBM entirely). The moments
are placed with ``memory_kind="pinned_host"`` shardings on the jitted train step's
in/out shardings — XLA:TPU then streams them HBM<->host around the (memory-bound)
optimizer update, overlapping the DMA with the backward where the scheduler allows.

Beyond-reference capability (the torch reference keeps AdamW state in device memory;
its CPU-offload analog would be torch's ZeRO-offload integrations). Opt in via
``--opt-state-offload`` (train CLI) or ``bench.py --offload``.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def _require_memories(mesh) -> None:
    """Raise a descriptive error on backends without pinned_host memory support (the
    CPU test mesh) instead of letting device_put fail with an opaque backend error."""
    try:
        NamedSharding(mesh, P(), memory_kind="pinned_host")
    except Exception as e:  # pragma: no cover - platform without memories support
        raise RuntimeError(
            "optimizer-state host offload needs a backend with pinned_host memory "
            "support (TPU); this backend "
            f"({mesh.devices.flat[0].platform}) does not provide it"
        ) from e


def offload_state_shardings(state, mesh):
    """Sharding tree for a TrainState: everything replicated in device HBM except the
    fused-AdamW moments (mu/nu), which are pinned to host memory."""
    from multimodal_tpu.train.optimizer import FusedAdamWState

    _require_memories(mesh)
    rep = NamedSharding(mesh, P())
    host = NamedSharding(mesh, P(), memory_kind="pinned_host")

    def map_opt(node):
        if isinstance(node, FusedAdamWState):
            return FusedAdamWState(
                count=rep,
                mu=jax.tree_util.tree_map(lambda _: host, node.mu),
                nu=jax.tree_util.tree_map(lambda _: host, node.nu),
                grad_norm=rep,
                notfinite_count=rep,
            )
        if isinstance(node, tuple) and type(node) is not tuple:  # other NamedTuples
            return type(node)(*(map_opt(c) for c in node))
        if isinstance(node, tuple):
            return tuple(map_opt(c) for c in node)
        return jax.tree_util.tree_map(lambda _: rep, node)

    return jax.tree_util.tree_map(lambda _: rep, state).replace(
        opt_state=map_opt(state.opt_state)
    )


def shard_state_offload(state, mesh):
    """Place an existing TrainState per offload_state_shardings (moments -> host)."""
    return jax.device_put(state, offload_state_shardings(state, mesh))
