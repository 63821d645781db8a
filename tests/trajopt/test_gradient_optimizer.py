"""Gradient-based shooting optimizer: descends the rollout cost by
differentiating end-to-end through the dynamics (differentiable simulation,
the capability MJX enables but the reference never exposes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string
from ambersim_tpu.trajopt import GradientShootingOptimizer, ShootingParams, StaticGoalQuadraticCost, shoot

PENDULUM = """
<mujoco><option timestep="0.02" iterations="1" ls_iterations="4"/>
<compiler angle="radian"/><worldbody>
  <body pos="0 0 1">
    <joint name="h" axis="0 1 0" damping="0.1"/>
    <geom type="capsule" fromto="0 0 0 0 0 -0.4" size="0.03" mass="0.3"/>
  </body>
</worldbody>
<actuator><motor joint="h" gear="1" ctrlrange="-2 2"/></actuator>
</mujoco>
"""


@pytest.mark.slow
def test_gradient_descent_decreases_cost():
    from ambersim_tpu.engine.setconst import set_constants

    m = set_constants(compile_spec(parse_mjcf_string(PENDULUM)))
    nx = m.nq + m.nv
    cost = StaticGoalQuadraticCost(
        Q=0.1 * jnp.eye(nx),
        Qf=10.0 * jnp.eye(nx),
        R=0.001 * jnp.eye(m.nu),
        xg=jnp.zeros(nx).at[0].set(1.0),
    )
    opt = GradientShootingOptimizer(model=m, cost_function=cost, iters=30, learning_rate=0.1)
    params = ShootingParams(x0=jnp.zeros(nx), us_guess=jnp.zeros((20, m.nu)))

    xs_star, us_star = jax.jit(opt.optimize)(params)

    guess_cost = cost.cost(shoot(m, params.x0, params.us_guess), params.us_guess)
    star_cost = cost.cost(xs_star, us_star)
    # strictly better than the zero-control guess, and the tape respects the
    # actuator ctrlrange clip
    assert float(star_cost) < 0.9 * float(guess_cost)
    assert float(jnp.max(jnp.abs(us_star))) <= 2.0 + 1e-6
    # the optimized swing actually moves toward the goal angle
    assert float(xs_star[-1, 0]) > 0.3


def test_gradient_optimizer_batched():
    """vmap(optimize) over a batch of initial states (sampler parity)."""
    from ambersim_tpu.engine.setconst import set_constants

    m = set_constants(compile_spec(parse_mjcf_string(PENDULUM)))
    nx = m.nq + m.nv
    cost = StaticGoalQuadraticCost(
        Q=0.1 * jnp.eye(nx),
        Qf=10.0 * jnp.eye(nx),
        R=0.001 * jnp.eye(m.nu),
        xg=jnp.zeros(nx).at[0].set(1.0),
    )
    opt = GradientShootingOptimizer(model=m, cost_function=cost, iters=10, learning_rate=0.1)
    x0s = jnp.stack([jnp.zeros(nx), jnp.zeros(nx).at[0].set(-0.4)])
    ps = jax.vmap(lambda x0: ShootingParams(x0=x0, us_guess=jnp.zeros((10, m.nu))))(x0s)
    xs, us = jax.jit(jax.vmap(opt.optimize))(ps)
    assert xs.shape == (2, 11, nx) and us.shape == (2, 10, m.nu)
    assert np.isfinite(np.asarray(xs)).all()
