"""Trajectory optimization abstract API
(reference: ambersim/trajopt/base.py:12-172).

Design follows the reference's pytree-dataclass OOP rationale
(trajopt/base.py:43-62): optimizers and costs are flax structs so they can be
passed through jit/vmap; static configuration uses pytree_node=False fields.
`CostFunction.grad`/`hess` default to jax autodiff so subclasses may override
with analytic forms (base.py:119-172)."""

from __future__ import annotations

import abc
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrajectoryOptimizerParams(abc.ABC):
    """Parameters consumed by a TrajectoryOptimizer.optimize call."""


@struct.dataclass
class TrajectoryOptimizer(abc.ABC):
    """Abstract trajectory optimizer (reference base.py:37-78)."""

    @abc.abstractmethod
    def optimize(self, params: TrajectoryOptimizerParams) -> Tuple[jax.Array, jax.Array]:
        """Optimize a trajectory; returns (xs_star, us_star)."""


@struct.dataclass
class CostFunctionParams(abc.ABC):
    """Parameters consumed by a CostFunction call (reference base.py:87-90);
    costs with static-only configuration may ignore it."""


@struct.dataclass
class CostFunction(abc.ABC):
    """Cost over (state trajectory, control trajectory)
    (reference base.py:81-172)."""

    @abc.abstractmethod
    def cost(self, xs: jax.Array, us: jax.Array) -> jax.Array:
        """Total scalar cost of a trajectory. xs: (N+1, n), us: (N, m)."""

    def grad(self, xs: jax.Array, us: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """(dJ/dxs, dJ/dus) — autodiff default (reference base.py:119-139)."""
        gx = jax.grad(self.cost, argnums=0)(xs, us)
        gu = jax.grad(self.cost, argnums=1)(xs, us)
        return gx, gu

    def hess(self, xs: jax.Array, us: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """(d2J/dxs2, d2J/dus2, d2J/dxsdus) — autodiff default
        (reference base.py:141-172)."""
        hxx = jax.hessian(self.cost, argnums=0)(xs, us)
        huu = jax.hessian(self.cost, argnums=1)(xs, us)
        hxu = jax.jacfwd(jax.grad(self.cost, argnums=0), argnums=1)(xs, us)
        return hxx, huu, hxu
