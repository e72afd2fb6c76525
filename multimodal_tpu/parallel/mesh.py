"""Device mesh + sharding helpers — the TPU-native replacement for the reference's
torch.distributed/Horovod bootstrap (AlignCLIP/main/distributed.py:43-137).

Single-controller JAX: ``jax.distributed.initialize()`` (multi-host) replaces rank discovery;
a Mesh with a ``data`` axis replaces process groups; gradient psum is implicit in pjit-sharded
jax.grad; ``lax.all_gather`` inside shard_map replaces NCCL feature all-gather. For multi-slice
deployments the mesh extends to ('replica', 'data') with the replica axis over DCN."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = (DATA_AXIS,),
    devices=None,
) -> Mesh:
    """Build a mesh over all (or given) devices; default: 1-D data-parallel over everything."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) if len(axis_names) == 1 else None
        assert shape is not None, "shape required for multi-axis meshes"
    arr = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(arr, axis_names)


REPLICA_AXIS = "replica"


def create_hybrid_mesh(num_slices: int, devices=None) -> Mesh:
    """('replica', 'data') mesh for multi-slice pods: the replica axis crosses DCN (slow,
    inter-slice), the data axis rides ICI within a slice. On real multi-slice hardware the
    device order comes from mesh_utils.create_hybrid_device_mesh (places DCN on the outer
    axis); elsewhere (CPU virtual meshes, single slice) a plain reshape emulates the
    topology so the sharding program compiles identically."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % num_slices == 0, f"{n} devices not divisible into {num_slices} slices"
    per_slice = n // num_slices
    # only devices that actually span slices go through the topology-aware placement;
    # a genuine placement failure there must SURFACE (a silent reshape would misalign
    # 'replica' with slice boundaries and put the per-step collectives on DCN)
    if len({getattr(d, "slice_index", 0) for d in devices}) > 1:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (1, per_slice), (num_slices, 1), devices=devices
        )
    else:  # virtual/CPU devices or a single slice: plain reshape emulates the topology
        arr = np.asarray(devices).reshape(num_slices, per_slice)
    return Mesh(arr, (REPLICA_AXIS, DATA_AXIS))


def batch_axes(mesh: Mesh) -> tuple:
    """The mesh axes the batch dimension shards over: ('replica','data') on hybrid meshes,
    ('data',) otherwise. lax collectives accept the same tuple as axis_name."""
    return tuple(a for a in (REPLICA_AXIS, DATA_AXIS) if a in mesh.axis_names)


def data_sharding(mesh: Mesh, axis=None) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis (both axes on hybrid meshes)."""
    return NamedSharding(mesh, P(axis if axis is not None else batch_axes(mesh)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis=None):
    """Device-put a host batch (dict of arrays) with the batch dim sharded over the mesh.

    Replaces the reference's per-rank .to(device, non_blocking=True) H2D copies
    (main/train.py:100-101) with one sharded transfer."""
    sharding = data_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
