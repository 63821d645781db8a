"""On-device uniform replay buffer (role of brax.training.replay_buffers).

A fixed-capacity ring buffer held as a pytree of device arrays, so insert and
sample stay inside jit (no host round trips): insert is a vectorized scatter
at (position + arange(n)) % capacity, sampling is a uniform gather. The whole
buffer lives in HBM; at MLP-RL scales (1M transitions x O(100) floats) that is
a few hundred MB, well inside a single chip.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayBufferState:
    data: Any  # pytree with leading axis = capacity
    insert_position: jax.Array  # int32 scalar, next write slot
    size: jax.Array  # int32 scalar, number of valid entries


def init(capacity: int, dummy_item: Any) -> ReplayBufferState:
    """Allocate a buffer of `capacity` items shaped like `dummy_item`
    (a single item, no leading batch axis)."""
    data = jax.tree.map(lambda x: jnp.zeros((capacity,) + jnp.shape(x), jnp.asarray(x).dtype), dummy_item)
    return ReplayBufferState(
        data=data,
        insert_position=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
    )


def insert(state: ReplayBufferState, batch: Any) -> ReplayBufferState:
    """Insert a batch (leading axis = n items), overwriting oldest entries."""
    capacity = jax.tree.leaves(state.data)[0].shape[0]
    n = jax.tree.leaves(batch)[0].shape[0]
    # A batch larger than capacity would wrap the scatter indices, making
    # which duplicate wins unspecified while size/insert_position advance as
    # if all items landed. Both are static, so reject it at trace time.
    if n > capacity:
        raise ValueError(f"replay.insert: batch of {n} exceeds buffer capacity {capacity}")
    idx = (state.insert_position + jnp.arange(n, dtype=jnp.int32)) % capacity
    data = jax.tree.map(lambda buf, x: buf.at[idx].set(x), state.data, batch)
    return ReplayBufferState(
        data=data,
        insert_position=(state.insert_position + n) % capacity,
        size=jnp.minimum(state.size + n, capacity),
    )


def sample(state: ReplayBufferState, key: jax.Array, batch_size: int) -> Any:
    """Uniform sample of `batch_size` items (with replacement)."""
    idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(state.size, 1))
    return jax.tree.map(lambda buf: buf[idx], state.data)
