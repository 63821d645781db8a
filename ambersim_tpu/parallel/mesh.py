"""Device-mesh utilities for data-parallel scaling.

The framework's scaling axis is the environment batch (SURVEY.md §2.3): env
state pytrees are sharded on their leading axis over a 1-D 'batch' mesh and
models/params are replicated. Inside jit, XLA partitions rollouts across
chips and inserts ICI collectives for reductions (gradients, running
statistics) — replacing the reference stack's pmap/NCCL
(SURVEY.md §5.8) with the pjit/GSPMD idiom.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "batch") -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), axis_names=(axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "batch") -> NamedSharding:
    """Sharding that splits the leading axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree across the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_batch(tree: Any, mesh: Mesh, axis_name: str = "batch") -> Any:
    """Shard every leaf's leading axis across the mesh (device_put outside jit,
    with_sharding_constraint inside)."""
    sharding = batch_sharding(mesh, axis_name)

    def _apply(x):
        try:
            return jax.lax.with_sharding_constraint(x, sharding)
        except ValueError:  # outside jit
            return jax.device_put(x, sharding)

    return jax.tree.map(_apply, tree)
