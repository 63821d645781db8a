"""Receding-horizon MPC driver tests: closed-loop stabilization beats
open-loop, warm-start plumbing, vmapped batch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ambersim_tpu.engine.setconst import set_constants
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string
from ambersim_tpu.trajopt import (
    StaticGoalQuadraticCost,
    VanillaPredictiveSampler,
    VanillaPredictiveSamplerParams,
    shoot,
)
from ambersim_tpu.trajopt.mpc import run_mpc, run_mpc_batch

PENDULUM = """
<mujoco><option timestep="0.02" iterations="4" ls_iterations="8"/>
<compiler angle="radian"/><worldbody>
  <body pos="0 0 1">
    <joint name="h" axis="0 1 0" damping="0.1"/>
    <geom type="capsule" fromto="0 0 0 0 0 -0.4" size="0.03" mass="0.3"/>
  </body>
</worldbody>
<actuator><motor joint="h" gear="1" ctrlrange="-2 2"/></actuator>
</mujoco>
"""


@pytest.fixture(scope="module")
def model():
    return set_constants(compile_spec(parse_mjcf_string(PENDULUM)))


def _sampler(model):
    # goal: upright (theta = pi), zero velocity
    cost = StaticGoalQuadraticCost(
        Q=jnp.diag(jnp.array([10.0, 0.1])),
        Qf=jnp.diag(jnp.array([10.0, 0.1])),
        R=0.001 * jnp.eye(1),
        xg=jnp.array([jnp.pi, 0.0]),
    )
    return VanillaPredictiveSampler(model=model, cost_function=cost, nsamples=64, stdev=0.3)


def test_mpc_smoke(model):
    """Fast shape/consistency check on the scanned MPC driver."""
    ps = _sampler(model)
    x0 = jnp.array([jnp.pi - 0.3, 0.0])
    params = VanillaPredictiveSamplerParams(
        x0=x0, us_guess=jnp.zeros((6, 1)), rng=jax.random.PRNGKey(0)
    )
    n_steps = 4
    xs, us, data_final = jax.jit(lambda p: run_mpc(model, ps, p, n_steps))(params)
    assert xs.shape == (n_steps + 1, 2) and us.shape == (n_steps, 1)
    # consistency: Data carries the same final state
    np.testing.assert_allclose(np.asarray(data_final.qpos), np.asarray(xs[-1, :1]), rtol=1e-6)


@pytest.mark.slow
def test_mpc_stabilizes_near_upright(model):
    """Start slightly off upright: MPC holds the pendulum near the goal while
    the same tape run open loop (no re-solving) drifts off and falls."""
    ps = _sampler(model)
    x0 = jnp.array([jnp.pi - 0.3, 0.0])
    horizon = 10
    params = VanillaPredictiveSamplerParams(
        x0=x0, us_guess=jnp.zeros((horizon, 1)), rng=jax.random.PRNGKey(0)
    )
    n_steps = 40
    xs, us, data_final = jax.jit(lambda p: run_mpc(model, ps, p, n_steps))(params)
    assert xs.shape == (n_steps + 1, 2) and us.shape == (n_steps, 1)
    final_err = float(jnp.abs(xs[-1, 0] - jnp.pi))
    # consistency: Data carries the same final state
    np.testing.assert_allclose(np.asarray(data_final.qpos), np.asarray(xs[-1, :1]), rtol=1e-6)
    assert final_err < 0.2, f"MPC failed to stabilize: final angle err {final_err}"

    # open loop: one solve from x0, then the solved tape replayed blindly for
    # all n_steps (padded past the horizon by holding its last knot).
    _, us_open = ps.optimize(params)
    pad = jnp.tile(us_open[-1:], (n_steps - us_open.shape[0], 1))
    xs_open = shoot(model, x0, jnp.concatenate([us_open, pad], axis=0))
    open_err = float(jnp.abs(xs_open[-1, 0] - jnp.pi))
    assert final_err < open_err, (final_err, open_err)


@pytest.mark.slow
def test_mpc_batch_over_initial_states(model):
    ps = _sampler(model)
    x0s = jnp.array([[jnp.pi - 0.2, 0.0], [jnp.pi + 0.25, 0.3]])
    params = VanillaPredictiveSamplerParams(
        x0=x0s,
        us_guess=jnp.zeros((2, 8, 1)),
        rng=jax.random.split(jax.random.PRNGKey(1), 2),
    )
    xs, us, _ = jax.jit(lambda p: run_mpc_batch(model, ps, p, 25))(params)
    assert xs.shape == (2, 26, 2) and us.shape == (2, 25, 1)
    errs = np.abs(np.asarray(xs[:, -1, 0]) - np.pi)
    assert (errs < 0.25).all(), errs
