"""Expert parallelism: GSPMD sharding rules for MoE expert stacks over an 'expert' axis.

Companion to models/moe.py. Expert weights live stacked as [E, ...]; sharding dim 0 over
the 'expert' mesh axis (tokens stay sharded over 'data') makes XLA lower the dispatch and
combine einsums to the GShard all-to-all program — no hand-written collectives, and the
AdamW mirrors inherit the specs so optimizer memory scales down with the expert axis too.
Router weights ([W, E]) are tiny and stay replicated.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_tpu.parallel.mesh import DATA_AXIS

EXPERT_AXIS = "expert"


def create_ep_mesh(data: int, experts: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert data * experts <= len(devices), f"need {data * experts} devices"
    arr = np.asarray(devices[: data * experts]).reshape(data, experts)
    return Mesh(arr, (DATA_AXIS, EXPERT_AXIS))


def ep_spec_for_path(path: tuple, leaf, expert_size: int) -> P:
    """Shard the leading (expert) dim of moe_mlp expert stacks; replicate the rest."""
    parts = [str(getattr(k, "key", k)) for k in path]
    if (
        "moe_mlp" in parts
        and parts[-1] in ("w1", "w2", "b1", "b2")
        and getattr(leaf, "ndim", 0) >= 1
        and leaf.shape[0] % expert_size == 0
    ):
        return P(EXPERT_AXIS)
    return P()


def ep_state_shardings(state, mesh: Mesh):
    """NamedSharding tree for a TrainState under EP rules (params + AdamW mirrors)."""
    expert_size = mesh.shape[EXPERT_AXIS]

    def spec(path, leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, ep_spec_for_path(path, leaf, expert_size))

    return jax.tree_util.tree_map_with_path(spec, state)


def shard_state_ep(state, mesh: Mesh):
    return jax.device_put(state, ep_state_shardings(state, mesh))
