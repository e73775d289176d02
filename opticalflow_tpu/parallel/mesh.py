"""Device mesh and sharding utilities — the framework's distributed runtime.

The reference has no distributed layer at all (SURVEY.md §2.9: single GPU,
vestigial DataParallel prefixes only).  Here scaling is first-class and
TPU-native: a ``jax.sharding.Mesh`` over all chips with a ``data`` axis,
batches sharded along it, parameters replicated, and the gradient all-reduce
emitted by XLA as an ICI ``psum`` when the jitted train step is annotated
with these shardings.  No NCCL/MPI translation — the JAX runtime owns
collectives.

For very large frames a spatial ``space`` axis can shard H with halo
exchange via ``shard_map`` (documented, not required for Sintel/KITTI —
SURVEY.md §2.9 "sequence parallel" row).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "local_batch_size"]


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Device-put every array in a pytree with its batch dim sharded."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


def local_batch_size(global_batch: int, mesh: Mesh,
                     axis_name: str = "data") -> int:
    n = mesh.shape[axis_name]
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by mesh axis "
            f"{axis_name!r} of size {n}")
    return global_batch // n
