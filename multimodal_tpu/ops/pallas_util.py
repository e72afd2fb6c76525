"""Shared Pallas plumbing.

``sds`` builds the ``out_shape`` ShapeDtypeStructs for a ``pallas_call`` so kernels work
INSIDE ``jax.shard_map``: under shard_map's ``check_vma=True`` (the default since JAX 0.7)
every output aval must declare which mesh axes it varies over, and a plain
``ShapeDtypeStruct`` (vma=None) is rejected at trace time. The kernel's outputs vary over
exactly the axes its primary input does, so we propagate ``jax.typeof(x).vma``.
Surfaced by the ring+shard_map CLI train step on hardware (the CPU test mesh skips the
TPU kernels, so only the chip path hit it)."""

from __future__ import annotations

import jax


def sds(shape, dtype, like=None):
    """jax.ShapeDtypeStruct carrying the varying-manual-axes (vma) of ``like``."""
    vma = getattr(jax.typeof(like), "vma", None) if like is not None else None
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


def match_vma(like, *arrays):
    """Broadcast each array's vma up to ``like``'s via ``jax.lax.pvary`` (a semantic
    no-op). Inside shard_map, kernel weights are replicated (vma={}) while activations
    vary over the batch axes; mixing the two in one primitive fails check_vma, so kernel
    entries pvary their weight operands to the activation's axes first."""
    vma = getattr(jax.typeof(like), "vma", None)
    if not vma:
        return arrays
    out = []
    for a in arrays:
        have = getattr(jax.typeof(a), "vma", None) or frozenset()
        need = tuple(sorted(set(vma) - set(have)))
        out.append(jax.lax.pvary(a, need) if need else a)
    return tuple(out)
