"""Shooting / predictive sampling trajectory optimization
(reference: ambersim/trajopt/shooting.py:22-157).

`shoot` rolls out a control tape with lax.scan of the engine step;
`VanillaPredictiveSampler` perturbs the control guess with Gaussian noise
(keeping the unperturbed guess as sample 0, reference shooting.py:139-143),
clips to actuator ctrlrange, vmaps rollouts over all samples, and picks the
argmin-cost winner. Entirely on-device once jitted; batch a second level with
vmap(optimize) as in reference tests/trajopt/test_predictive_sampler.py:78.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ambersim_tpu.core.types import Model
from ambersim_tpu.engine import forward as _forward
from ambersim_tpu.engine import make_data
from ambersim_tpu.engine import step as _step
from ambersim_tpu.trajopt.base import CostFunction, TrajectoryOptimizer, TrajectoryOptimizerParams


def shoot(m: Model, x0: jax.Array, us: jax.Array) -> jax.Array:
    """Roll out controls us (N, nu) from state x0 = [qpos, qvel] (nq+nv,).

    Returns xs: (N+1, nq+nv) (reference shooting.py:22-48)."""
    nq = m.nq
    data = make_data(m)
    data = data.replace(qpos=x0[:nq], qvel=x0[nq:])
    data = _forward(m, data)

    def scan_fn(d, u):
        d = _step(m, d.replace(ctrl=u))
        return d, jnp.concatenate([d.qpos, d.qvel])

    _, xs_tail = jax.lax.scan(scan_fn, data, us)
    return jnp.concatenate([x0[None], xs_tail], axis=0)


@struct.dataclass
class ShootingParams(TrajectoryOptimizerParams):
    """Initial state + control tape guess (reference shooting.py:58-73)."""

    x0: jax.Array  # (nq + nv,)
    us_guess: jax.Array  # (N, nu)

    @property
    def N(self) -> int:
        return self.us_guess.shape[-2]


@struct.dataclass
class ShootingAlgorithm(TrajectoryOptimizer):
    """Marker base for shooting-type optimizers (reference shooting.py:77-93):
    optimizers whose decision variable is an open-loop control tape rolled
    out through the dynamics."""


@struct.dataclass
class VanillaPredictiveSamplerParams(ShootingParams):
    """Adds the sampling PRNG key (reference shooting.py:97-101)."""

    rng: jax.Array = struct.field(default_factory=lambda: jax.random.PRNGKey(0))


@struct.dataclass
class VanillaPredictiveSampler(ShootingAlgorithm):
    """Predictive sampling: best of nsamples Gaussian perturbations
    (reference shooting.py:104-157)."""

    model: Model
    cost_function: CostFunction
    nsamples: int = struct.field(pytree_node=False, default=100)
    stdev: float = struct.field(pytree_node=False, default=0.1)

    def optimize(self, params: VanillaPredictiveSamplerParams) -> Tuple[jax.Array, jax.Array]:
        m = self.model
        us_guess = params.us_guess
        N, nu = us_guess.shape

        noise = self.stdev * jax.random.normal(params.rng, (self.nsamples - 1, N, nu), us_guess.dtype)
        us_samples = jnp.concatenate([us_guess[None], us_guess[None] + noise], axis=0)

        # clip to actuator ctrlrange (reference shooting.py:146-148)
        limited = jnp.asarray(m.skel.actuator_ctrllimited)
        lo = jnp.where(limited, m.actuator_ctrlrange[:, 0], -jnp.inf)
        hi = jnp.where(limited, m.actuator_ctrlrange[:, 1], jnp.inf)
        us_samples = jnp.clip(us_samples, lo, hi)

        xs_samples = jax.vmap(shoot, in_axes=(None, None, 0))(m, params.x0, us_samples)
        costs = jax.vmap(self.cost_function.cost)(xs_samples, us_samples)
        best = jnp.argmin(costs)
        xs_star = jax.lax.dynamic_index_in_dim(xs_samples, best, keepdims=False)
        us_star = jax.lax.dynamic_index_in_dim(us_samples, best, keepdims=False)
        return xs_star, us_star
