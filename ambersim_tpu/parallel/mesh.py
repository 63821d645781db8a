"""Device-mesh utilities for data-parallel and multi-slice scaling.

The framework's scaling axis is the environment batch (SURVEY.md §2.3): env
state pytrees are sharded on their leading axis over a 1-D 'batch' mesh and
models/params are replicated. Inside jit, XLA partitions rollouts across
chips and inserts ICI collectives for reductions (gradients, running
statistics) — replacing the reference stack's pmap/NCCL
(SURVEY.md §5.8) with the pjit/GSPMD idiom.

Multi-slice plan (SURVEY.md §5.8): on a multi-slice / multi-process TPU
deployment, call :func:`initialize_distributed` once per process, then build
a 2-axis hybrid mesh with :func:`make_hybrid_mesh`. Axis 0 ("dcn") spans
slices over the data-center network; axis 1 ("batch") spans chips within a
slice over ICI. Environment batches shard over the *flattened* ("dcn",
"batch") pair so per-step physics stays slice-local, while gradient/statistic
psums reduce first over ICI and only the slice-partials cross DCN — the
bandwidth-optimal layout for pure data parallelism.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_distributed_initialized = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs: Any,
) -> bool:
    """Join a multi-process (multi-host / multi-slice) JAX runtime.

    Thin, idempotent wrapper over ``jax.distributed.initialize``: on TPU pods
    all three arguments auto-detect from the environment, so call sites can
    simply run ``initialize_distributed()`` unconditionally. Returns True if
    a distributed runtime is active after the call, False when running
    single-process (initialization failed because there is no coordinator —
    the normal single-host case, not an error).
    """
    global _distributed_initialized
    if _distributed_initialized:
        return True
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
        _distributed_initialized = True
    except Exception:
        # Single-process (no coordinator env); jax.devices() is process-local.
        _distributed_initialized = False
    return _distributed_initialized


def make_hybrid_mesh(
    axis_names: Sequence[str] = ("dcn", "batch"),
    num_slices: Optional[int] = None,
) -> Mesh:
    """2-axis mesh with slice-granularity axis 0 (DCN) and intra-slice axis 1 (ICI).

    Uses device slice indices when the runtime exposes them (real multi-slice
    TPU); otherwise treats each process as a "slice" (multi-host CPU/GPU), and
    degenerates to a 1×N mesh single-process — so code written against the
    2-axis layout runs unchanged everywhere.
    """
    devices = jax.devices()
    if num_slices is None:
        slice_ids = [getattr(d, "slice_index", None) for d in devices]
        if any(s is not None for s in slice_ids):
            num_slices = len({s for s in slice_ids if s is not None})
        else:
            num_slices = max(jax.process_count(), 1)
    if len(devices) % num_slices != 0:
        num_slices = 1
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, len(devices) // num_slices),
            dcn_mesh_shape=(num_slices, 1),
            devices=devices,
        )
    except Exception:
        # Fallback: sort by (process, id) so axis 0 strides across slices.
        devs = sorted(devices, key=lambda d: (getattr(d, "process_index", 0), d.id))
        arr = np.asarray(devs).reshape(num_slices, len(devices) // num_slices)
    return Mesh(arr, axis_names=tuple(axis_names))


def assert_sharded(tree: Any, mesh: Mesh, axis_name: str = "batch") -> None:
    """Assert every array leaf's leading axis is split over `axis_name`.

    Test helper (SURVEY.md §5.8): catches silently-replicated batches, the
    classic GSPMD foot-gun where a missing constraint makes every chip do the
    full batch. Raises AssertionError naming the first offending leaf.
    """
    n = mesh.shape[axis_name]
    if n == 1:
        return
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_paths:
        if not hasattr(leaf, "sharding") or leaf.ndim == 0:
            continue
        spec = getattr(leaf.sharding, "spec", None)
        first = spec[0] if spec is not None and len(spec) > 0 else None
        names = (first,) if isinstance(first, str) else tuple(first or ())
        if axis_name not in names:
            raise AssertionError(
                f"leaf {jax.tree_util.keystr(path)} (shape {leaf.shape}) is not "
                f"sharded over '{axis_name}': spec={spec}"
            )


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
