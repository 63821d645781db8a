"""Running mean/std normalization (role of brax.training.acme
running_statistics, consumed by the reference at ambersim/rl/helpers.py:24
and examples ex_save_and_load.py:13,109 — D8 in SURVEY.md).

Welford-style accumulation over pytrees. Under a sharded batch axis inside
jit, the jnp.mean reductions become cross-device collectives automatically,
so no explicit psum is needed for multi-chip data parallelism.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

Pytree = Any


@struct.dataclass
class RunningStatisticsState:
    count: jax.Array
    mean: Pytree
    summed_variance: Pytree
    std: Pytree


def init_state(specimen: Pytree) -> RunningStatisticsState:
    """Initialize from a specimen pytree (e.g. a single observation)."""
    zeros = jax.tree.map(jnp.zeros_like, specimen)
    ones = jax.tree.map(jnp.ones_like, specimen)
    return RunningStatisticsState(
        count=jnp.zeros(()), mean=zeros, summed_variance=zeros, std=ones
    )


def update(state: RunningStatisticsState, batch: Pytree, std_min_value: float = 1e-6) -> RunningStatisticsState:
    """Accumulate statistics over all leading batch dims of `batch`."""
    specimen_ndim = jax.tree.leaves(state.mean)[0].ndim if jax.tree.leaves(state.mean) else 0
    leaf = jax.tree.leaves(batch)[0]
    batch_dims = leaf.ndim - specimen_ndim
    batch_size = 1
    for dim in leaf.shape[: batch_dims or 0]:
        batch_size *= dim
    count = state.count + batch_size

    def _update_leaf(mean, sv, b):
        axes = tuple(range(batch_dims))
        diff_to_old = b - mean
        mean_new = mean + jnp.sum(diff_to_old, axis=axes) / count
        diff_to_new = b - mean_new
        sv_new = sv + jnp.sum(diff_to_old * diff_to_new, axis=axes)
        return mean_new, sv_new

    flat = jax.tree.map(_update_leaf, state.mean, state.summed_variance, batch)
    mean = jax.tree.map(lambda x: x[0], flat, is_leaf=lambda x: isinstance(x, tuple))
    sv = jax.tree.map(lambda x: x[1], flat, is_leaf=lambda x: isinstance(x, tuple))
    std = jax.tree.map(
        lambda v: jnp.maximum(jnp.sqrt(jnp.maximum(v / jnp.maximum(count, 1.0), 0.0)), std_min_value), sv
    )
    return RunningStatisticsState(count=count, mean=mean, summed_variance=sv, std=std)


def normalize(batch: Pytree, state: RunningStatisticsState) -> Pytree:
    return jax.tree.map(lambda b, m, s: (b - m) / s, batch, state.mean, state.std)


def denormalize(batch: Pytree, state: RunningStatisticsState) -> Pytree:
    return jax.tree.map(lambda b, m, s: b * s + m, batch, state.mean, state.std)
