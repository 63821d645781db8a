"""Gradient-based shooting trajectory optimization.

Consumes the framework's differentiable simulation (reverse-mode autodiff
flows through ``engine.step`` — see engine/linalg.differentiable_dispatch):
the total cost of a rolled-out control tape is differentiated end-to-end
through the contact dynamics and descended with Adam. This goes beyond the
reference's sampling-only optimizer (ambersim/trajopt/shooting.py:96-157) —
a capability the reference's MJX dependency enables but the reference never
exposes.

All iterations run on-device inside one jit (lax.scan over Adam steps);
batch a second level with vmap(optimize) exactly like the sampler.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ambersim_tpu.core.types import Model
from ambersim_tpu.trajopt.base import CostFunction, TrajectoryOptimizer
from ambersim_tpu.trajopt.shooting import ShootingParams, shoot


@struct.dataclass
class GradientShootingOptimizer(TrajectoryOptimizer):
    """Adam descent on the shooting cost J(us) = cost(shoot(x0, us), us)."""

    model: Model = struct.field(pytree_node=False)
    cost_function: CostFunction
    iters: int = struct.field(pytree_node=False, default=50)
    learning_rate: float = 0.05
    b1: float = 0.9
    b2: float = 0.999

    def optimize(self, params: ShootingParams) -> Tuple[jax.Array, jax.Array]:
        m = self.model
        x0 = params.x0

        # clip to actuator ctrlrange like the sampler (reference
        # shooting.py:146-148)
        lo = m.actuator_ctrlrange[:, 0]
        hi = m.actuator_ctrlrange[:, 1]

        def total_cost(us):
            xs = shoot(m, x0, us)
            return self.cost_function.cost(xs, us)

        grad_fn = jax.value_and_grad(total_cost)

        def adam_step(carry, i):
            us, mom, vel, best_us, best_cost = carry
            c, g = grad_fn(us)
            # track the best iterate seen (the guess is iterate 0, so the
            # result can never be worse than the guess — sampler invariant)
            better = c < best_cost
            best_us = jnp.where(better, us, best_us)
            best_cost = jnp.where(better, c, best_cost)
            mom = self.b1 * mom + (1 - self.b1) * g
            vel = self.b2 * vel + (1 - self.b2) * g * g
            t = i + 1
            mhat = mom / (1 - self.b1**t)
            vhat = vel / (1 - self.b2**t)
            us = us - self.learning_rate * mhat / (jnp.sqrt(vhat) + 1e-8)
            us = jnp.clip(us, lo, hi)
            return (us, mom, vel, best_us, best_cost), c

        us0 = jnp.clip(params.us_guess, lo, hi)
        carry0 = (
            us0,
            jnp.zeros_like(us0),
            jnp.zeros_like(us0),
            us0,
            jnp.asarray(jnp.inf, us0.dtype),
        )
        (us, _, _, best_us, best_cost), _ = jax.lax.scan(
            adam_step, carry0, jnp.arange(self.iters, dtype=us0.dtype)
        )
        # final candidate may beat every tracked iterate
        final_cost = total_cost(us)
        use_final = final_cost < best_cost
        us_star = jnp.where(use_final, us, best_us)
        xs_star = shoot(m, x0, us_star)
        return xs_star, us_star
