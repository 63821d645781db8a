"""Parameter checkpoint I/O (role of brax.io.model.save_params/load_params,
used by the reference at examples/rl/pendulum/ex_save_and_load.py:85,101 — D9).

Params are arbitrary pytrees; arrays are materialized to host numpy before
pickling so checkpoints are device-independent.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any, Union

import jax
import numpy as np


def save_params(path: Union[str, Path], params: Any) -> None:
    host_params = jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, params)
    with open(path, "wb") as f:
        pickle.dump(host_params, f)


def load_params(path: Union[str, Path]) -> Any:
    """Load a params pytree saved by save_params.

    SECURITY: this is pickle (the reference's brax.io.model format) —
    deserializing executes code from the file. Only load checkpoints you
    trust. For untrusted interchange of plain array trees, use
    save_arrays/load_arrays (npz, data-only) instead.
    """
    with open(path, "rb") as f:
        return pickle.load(f)


def save_arrays(path: Union[str, Path], tree: Any) -> None:
    """Data-only checkpoint (npz) for pytrees of arrays/scalars: safe to load
    from untrusted sources, but requires a structurally matching `like` tree
    at load time (structure is not stored as code)."""
    leaves, _ = jax.tree.flatten(tree)
    np.savez(path, **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})


def load_arrays(path: Union[str, Path], like: Any) -> Any:
    """Restore a tree saved by save_arrays into the structure of `like`."""
    with np.load(path) as z:
        leaves = [z[f"leaf_{i}"] for i in range(len(z.files))]
    _, treedef = jax.tree.flatten(like)
    return jax.tree.unflatten(treedef, leaves)
