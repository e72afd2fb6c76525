"""Tensor parallelism: GSPMD parameter-sharding rules over a ('data', 'model') mesh.

The reference has no TP (SURVEY §2c.4: ViT-B/L fit per GPU, DP-only) — this is the optional
scale-out extension done the TPU way: instead of manual collectives, parameters get
PartitionSpecs by name and XLA's sharding propagation inserts the all-reduces
(Megatron-style column->row parallel pairs fall out automatically):

    mlp/c_fc kernel   [W, 4W]  -> (None, 'model')   column parallel
    mlp/c_proj kernel [4W, W]  -> ('model', None)   row parallel (all-reduce after)
    attn q/k/v kernel [W, W]   -> (None, 'model')   heads sharded
    attn out kernel   [W, W]   -> ('model', None)
    everything else            -> replicated

Optimizer state (AdamW mu/nu mirror the param tree) inherits the same specs by shape-and-
path matching, so per-chip optimizer memory shrinks with the model axis too.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_tpu.parallel.mesh import DATA_AXIS

MODEL_AXIS = "model"

# (path-substring, ndim) -> spec builders; checked in order
_RULES = (
    (("mlp", "c_fc", "kernel"), P(None, MODEL_AXIS)),
    (("mlp", "c_fc", "bias"), P(MODEL_AXIS)),
    (("mlp", "c_proj", "kernel"), P(MODEL_AXIS, None)),
    (("attn", "query", "kernel"), P(None, MODEL_AXIS)),
    (("attn", "key", "kernel"), P(None, MODEL_AXIS)),
    (("attn", "value", "kernel"), P(None, MODEL_AXIS)),
    (("attn", "query", "bias"), P(MODEL_AXIS)),
    (("attn", "key", "bias"), P(MODEL_AXIS)),
    (("attn", "value", "bias"), P(MODEL_AXIS)),
    (("attn", "out", "kernel"), P(MODEL_AXIS, None)),
)


def create_tp_mesh(data: int, model: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert data * model <= len(devices), f"need {data * model} devices"
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def tp_spec_for_path(path: tuple, leaf, model_size: int) -> P:
    """PartitionSpec for one parameter (or optimizer-state mirror) leaf."""
    parts = [str(getattr(k, "key", k)) for k in path]
    for needles, spec in _RULES:
        if all(n in parts for n in needles):
            # only shard when the sharded dim divides evenly (tiny test configs may not)
            dims = [d for d in spec]
            ok = True
            for axis_idx, axis_name in enumerate(dims):
                if axis_name == MODEL_AXIS and (
                    axis_idx >= leaf.ndim or leaf.shape[axis_idx] % model_size
                ):
                    ok = False
            if ok:
                return spec
            return P()
    return P()


def tp_state_shardings(state, mesh: Mesh):
    """NamedSharding tree for a TrainState (params + optimizer mirrors) under TP rules."""
    model_size = mesh.shape[MODEL_AXIS]

    def spec(path, leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, tp_spec_for_path(path, leaf, model_size))

    return jax.tree_util.tree_map_with_path(spec, state)


def shard_state(state, mesh: Mesh):
    """Place a TrainState on the mesh with TP parameter sharding."""
    return jax.device_put(state, tp_state_shardings(state, mesh))
