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


def data_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Device-put a host batch (dict of arrays) with the batch dim sharded over the mesh.

    Replaces the reference's per-rank .to(device, non_blocking=True) H2D copies
    (main/train.py:100-101) with one sharded transfer."""
    sharding = data_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
