"""Composed parallel forms: FSDP x TP 2-D parameter sharding over ('data', 'model').

Real multi-chip runs compose axes — Megatron-style tensor parallelism over 'model' AND
ZeRO-style parameter/optimizer sharding over 'data' on the SAME weight (the standard 2-D
layout for models that outgrow single-axis sharding). The TPU-native composition is pure
PartitionSpec algebra: take the TP spec for each leaf (parallel/tp.py rules), then shard
the largest remaining (TP-free) axis over 'data' (parallel/fsdp.py rule); leaves with no
TP rule fall back to plain FSDP over 'data'. GSPMD then emits the all-gathers /
reduce-scatters over 'data' and the row/column-parallel all-reduces over 'model' from one
annotation set — no hand-written collectives (SURVEY §2c's scaling mandate done the XLA
way; the reference is DP-only, distributed.py:63).

CLI: ``--tp N --fsdp`` together select this composition (train/run.py).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_tpu.parallel.fsdp import MIN_SHARD_SIZE, fsdp_spec_for_leaf
from multimodal_tpu.parallel.mesh import DATA_AXIS
from multimodal_tpu.parallel.tp import MODEL_AXIS, tp_spec_for_path


def fsdp_tp_spec_for_path(path: tuple, leaf, data_size: int, model_size: int,
                          min_size: int = MIN_SHARD_SIZE) -> P:
    """2-D PartitionSpec: TP rule on the 'model' axis + FSDP on the largest free axis."""
    tp_spec = tp_spec_for_path(path, leaf, model_size)
    if tuple(tp_spec) == ():  # no TP rule -> plain FSDP
        return fsdp_spec_for_leaf(leaf, data_size, min_size)
    if not hasattr(leaf, "ndim") or leaf.size < min_size:
        return tp_spec
    dims = list(tp_spec) + [None] * (leaf.ndim - len(tp_spec))
    best = None
    for i, d in enumerate(leaf.shape):
        if dims[i] is None and d % data_size == 0 and (
            best is None or d >= leaf.shape[best]
        ):
            best = i
    if best is not None:
        dims[best] = DATA_AXIS
    return P(*dims)


def fsdp_tp_state_shardings(state, mesh: Mesh, min_size: int = MIN_SHARD_SIZE):
    """NamedSharding tree for a TrainState under the composed FSDP x TP rules.

    The AdamW mu/nu mirrors inherit the same 2-D specs by path-and-shape matching, so
    per-chip optimizer memory shrinks with BOTH mesh axes (ZeRO over 'data' even for
    tensor-parallel weights)."""
    data_size = mesh.shape[DATA_AXIS]
    model_size = mesh.shape[MODEL_AXIS]

    def spec(path, leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(
            mesh, fsdp_tp_spec_for_path(path, leaf, data_size, model_size, min_size)
        )

    return jax.tree_util.tree_map_with_path(spec, state)


def shard_state_fsdp_tp(state, mesh: Mesh, min_size: int = MIN_SHARD_SIZE):
    """Place a TrainState on the mesh with composed FSDP x TP sharding."""
    return jax.device_put(state, fsdp_tp_state_shardings(state, mesh, min_size))
