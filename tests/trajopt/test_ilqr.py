"""iLQR optimizer: monotone cost decrease, goal-reaching on the pendulum,
quaternion-manifold tangent handling (nq != nv), and the batched-vmap
property mirrored from the predictive-sampler tests (reference
tests/trajopt/test_predictive_sampler.py:60-87)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ambersim_tpu.engine.setconst import set_constants
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string
from ambersim_tpu.trajopt import ILQR, ILQRParams, shoot, state_add, state_diff

PENDULUM = """
<mujoco><option timestep="0.05" gravity="0 0 -9.81"/>
<compiler angle="radian"/><worldbody>
  <body pos="0 0 1">
    <joint name="h" axis="0 1 0" damping="0.05"/>
    <geom type="capsule" fromto="0 0 0 0 0 -0.4" size="0.03" mass="0.3"/>
  </body>
</worldbody>
<actuator><motor joint="h" gear="1" ctrlrange="-3 3"/></actuator>
</mujoco>
"""

BALL_BODY = """
<mujoco><option timestep="0.02" gravity="0 0 0"/>
<compiler angle="radian"/><worldbody>
  <body pos="0 0 1">
    <joint name="b" type="ball" damping="0.1"/>
    <geom type="box" size="0.1 0.05 0.02" mass="0.4"/>
  </body>
</worldbody>
<actuator>
  <motor joint="b" gear="1 0 0" ctrlrange="-1 1"/>
  <motor joint="b" gear="0 1 0" ctrlrange="-1 1"/>
  <motor joint="b" gear="0 0 1" ctrlrange="-1 1"/>
</actuator>
</mujoco>
"""


def _compile(xml):
    return set_constants(compile_spec(parse_mjcf_string(xml)))


def _pendulum_ilqr(iterations=8):
    m = _compile(PENDULUM)
    goal = jnp.array([jnp.pi / 2, 0.0])

    def running(x, u):
        dx = x - goal
        return 0.5 * (dx @ dx) + 0.05 * (u @ u)

    def terminal(x):
        dx = x - goal
        return 50.0 * (dx @ dx)

    return m, ILQR(model=m, running_cost=running, terminal_cost=terminal, iterations=iterations)


def test_state_add_diff_roundtrip_manifold():
    """state_diff inverts state_add to first order, on a ball joint
    (nq = 4, nv = 3)."""
    m = _compile(BALL_BODY)
    assert m.nq == 4 and m.nv == 3
    x = jnp.concatenate([jnp.array([0.9, 0.3, 0.3, 0.1]) / jnp.linalg.norm(jnp.array([0.9, 0.3, 0.3, 0.1])), jnp.array([0.2, -0.1, 0.4])])
    z = jnp.array([0.03, -0.02, 0.05, 0.1, 0.2, -0.3])
    x2 = state_add(m, x, z)
    z_back = state_diff(m, x2, x)
    np.testing.assert_allclose(np.asarray(z_back), np.asarray(z), rtol=1e-4, atol=1e-5)
    # zero increment is exact
    np.testing.assert_allclose(np.asarray(state_diff(m, x, x)), 0.0, atol=1e-7)


def test_ilqr_swings_pendulum_to_goal():
    """From hanging rest, iLQR drives the pendulum to pi/2 and the cost is
    far below the zero-control guess."""
    m, opt = _pendulum_ilqr(iterations=10)
    N = 40
    params = ILQRParams(x0=jnp.zeros(2), us_guess=jnp.zeros((N, 1)))
    xs, us = jax.jit(opt.optimize)(params)

    xs_guess = shoot(m, params.x0, params.us_guess)
    c_guess = float(opt._traj_cost(xs_guess, params.us_guess))
    c_star = float(opt._traj_cost(xs, us))
    assert c_star < 0.2 * c_guess, (c_star, c_guess)
    assert abs(float(xs[-1, 0]) - np.pi / 2) < 0.1, float(xs[-1, 0])
    # controls respect ctrlrange clipping
    assert float(jnp.max(jnp.abs(us))) <= 3.0 + 1e-6


def test_ilqr_never_worse_than_guess():
    """alpha = 0 keeps the nominal, so even 1 iteration cannot regress."""
    m, opt = _pendulum_ilqr(iterations=1)
    N = 20
    rng = jax.random.PRNGKey(3)
    us_guess = 0.5 * jax.random.normal(rng, (N, 1))
    params = ILQRParams(x0=jnp.array([0.4, -0.3]), us_guess=us_guess)
    xs, us = jax.jit(opt.optimize)(params)
    xs_guess = shoot(m, params.x0, us_guess)
    assert float(opt._traj_cost(xs, us)) <= float(opt._traj_cost(xs_guess, us_guess)) + 1e-6


def test_ilqr_ball_joint_manifold():
    """Quaternion-state model (nq != nv): iLQR reorients a floating box to a
    target attitude, exercising the tangent-space linearization."""
    m = _compile(BALL_BODY)
    qgoal = jnp.array([np.cos(0.4), 0.0, np.sin(0.4), 0.0])  # 0.8 rad about y
    xgoal = jnp.concatenate([qgoal, jnp.zeros(3)])

    def running(x, u):
        return 0.01 * (u @ u)

    def terminal(x):
        z = state_diff(m, x, xgoal)
        return 200.0 * (z @ z)

    opt = ILQR(model=m, running_cost=running, terminal_cost=terminal, iterations=10)
    N = 40
    x0 = jnp.concatenate([jnp.array([1.0, 0, 0, 0]), jnp.zeros(3)])
    params = ILQRParams(x0=x0, us_guess=jnp.zeros((N, 3)))
    xs, us = jax.jit(opt.optimize)(params)
    # final attitude essentially at the goal (pure-terminal cost)
    err = float(jnp.linalg.norm(state_diff(m, xs[-1], xgoal)[:3]))
    assert err < 0.01, err


@pytest.mark.slow
def test_ilqr_batched_vmap():
    """vmap(optimize) over a batch of initial states: every instance improves
    on its own guess (the predictive-sampler batched property, reference
    test_predictive_sampler.py:60-87)."""
    m, opt = _pendulum_ilqr(iterations=4)
    N = 20
    x0s = jnp.stack([jnp.array([a, 0.0]) for a in np.linspace(-1.0, 1.0, 4)])
    us_guess = jnp.zeros((4, N, 1))
    batch = ILQRParams(x0=x0s, us_guess=us_guess)
    xs, us = jax.jit(jax.vmap(opt.optimize))(batch)
    assert xs.shape == (4, N + 1, 2) and us.shape == (4, N, 1)
    for i in range(4):
        xs_g = shoot(m, x0s[i], us_guess[i])
        assert float(opt._traj_cost(xs[i], us[i])) <= float(
            opt._traj_cost(xs_g, us_guess[i])
        ) + 1e-6
