"""Model device placement.

Over a remote-tunneled TPU, each individual host->device transfer costs
seconds, so uploading a Model's ~60 parameter arrays one-by-one is
pathological. `put_model` packs every (float32) leaf into ONE flat host
buffer, uploads it in a single transfer, and unpacks it on-device inside a
jitted program (pure slicing — no further transfers).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ambersim_tpu.core.types import Model

_UNPACK_CACHE: dict = {}


def put_model(model: Model, device: Optional[jax.Device] = None) -> Model:
    """Place all numeric Model leaves on `device` (default backend device)
    with a single host->device transfer."""
    leaves, treedef = jax.tree.flatten(model)
    shapes = tuple(np.shape(l) for l in leaves)
    host = [np.asarray(l, dtype=np.float32).ravel() for l in leaves]
    flat = np.concatenate(host) if host else np.zeros(0, np.float32)
    flat_dev = jax.device_put(flat, device)

    key = shapes
    if key not in _UNPACK_CACHE:

        def unpack(f):
            out = []
            offset = 0
            for shape in shapes:
                size = int(np.prod(shape)) if shape else 1
                out.append(jax.lax.dynamic_slice_in_dim(f, offset, size).reshape(shape))
                offset += size
            return out

        _UNPACK_CACHE[key] = jax.jit(unpack)
    leaves_dev = _UNPACK_CACHE[key](flat_dev)
    return jax.tree.unflatten(treedef, leaves_dev)
