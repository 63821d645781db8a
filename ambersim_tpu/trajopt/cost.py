"""Quadratic costs with analytic derivatives
(reference: ambersim/trajopt/cost.py:13-178)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ambersim_tpu.trajopt.base import CostFunction


@struct.dataclass
class StaticGoalQuadraticCost(CostFunction):
    """J = sum_k [ (x_k - xg)'Q(x_k - xg) + u_k'R u_k ] + (x_N - xg)'Qf(x_N - xg)
    with analytic gradient and block-diagonal Hessian
    (reference cost.py:36-178).

    Attributes:
      Q: (n, n) running state cost weight.
      Qf: (n, n) terminal state cost weight.
      R: (m, m) control cost weight.
      xg: (n,) static goal state.
    """

    Q: jax.Array
    Qf: jax.Array
    R: jax.Array
    xg: jax.Array

    def cost(self, xs: jax.Array, us: jax.Array) -> jax.Array:
        dx = xs - self.xg
        running = jnp.einsum("ki,ij,kj->", dx[:-1], self.Q, dx[:-1])
        terminal = dx[-1] @ self.Qf @ dx[-1]
        ctrl = jnp.einsum("ki,ij,kj->", us, self.R, us)
        return running + terminal + ctrl

    def grad(self, xs: jax.Array, us: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Analytic gradient (reference cost.py:87-113)."""
        dx = xs - self.xg
        gx_running = dx[:-1] @ (self.Q + self.Q.T)
        gx_terminal = (dx[-1] @ (self.Qf + self.Qf.T))[None]
        gx = jnp.concatenate([gx_running, gx_terminal], axis=0)
        gu = us @ (self.R + self.R.T)
        return gx, gu

    def hess(self, xs: jax.Array, us: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Analytic block-diagonal Hessians (reference cost.py:115-178)."""
        N1, n = xs.shape
        N, m = us.shape
        qq = self.Q + self.Q.T
        qqf = self.Qf + self.Qf.T
        rr = self.R + self.R.T

        hxx = jnp.zeros((N1, n, N1, n), xs.dtype)
        idx = jnp.arange(N1 - 1)
        hxx = hxx.at[idx, :, idx, :].set(jnp.broadcast_to(qq, (N1 - 1, n, n)))
        hxx = hxx.at[N1 - 1, :, N1 - 1, :].set(qqf)

        huu = jnp.zeros((N, m, N, m), us.dtype)
        jdx = jnp.arange(N)
        huu = huu.at[jdx, :, jdx, :].set(jnp.broadcast_to(rr, (N, m, m)))

        hxu = jnp.zeros((N1, n, N, m), xs.dtype)
        return hxx, huu, hxu
