"""Predictive sampler tests (mirrors reference
tests/trajopt/test_predictive_sampler.py:44-87: jitted smoke on a hand model
with contacts disabled + batched cost-decrease property)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ambersim_tpu.core.types import DisableBit, IntegratorType, SolverType
from ambersim_tpu.trajopt import (
    StaticGoalQuadraticCost,
    VanillaPredictiveSampler,
    VanillaPredictiveSamplerParams,
)
from ambersim_tpu.utils.io_utils import load_model_from_file

GRIPPER_URDF_PATH = None  # built in fixture below


def _make_sampler(nsamples=24):
    """Gripper-with-mimic model, contacts disabled, Newton solver, 1 iteration
    (mirrors the reference fixture config at test_predictive_sampler.py:17-41)."""
    import tests.test_model_io as mio

    import tempfile, os

    tmp = tempfile.mkdtemp()
    p = os.path.join(tmp, "gripper.urdf")
    with open(p, "w") as f:
        f.write(mio.GRIPPER_URDF)
    model = load_model_from_file(p, solver="newton", iterations=1, ls_iterations=4)
    model = model.replace(
        opt=model.opt.replace(
            timestep=jnp.asarray(0.002, jnp.float32),
            disableflags=model.opt.disableflags | DisableBit.CONTACT,
            integrator=int(IntegratorType.EULER),
        )
    )
    assert model.opt.solver == int(SolverType.NEWTON)

    nx = model.nq + model.nv
    Q = 0.1 * jnp.eye(nx)
    Qf = 10.0 * jnp.eye(nx)
    R = 0.001 * jnp.eye(model.nu)
    xg = jnp.zeros(nx).at[0].set(0.8).at[1].set(0.5)
    cost = StaticGoalQuadraticCost(Q=Q, Qf=Qf, R=R, xg=xg)
    return VanillaPredictiveSampler(model=model, cost_function=cost, nsamples=nsamples, stdev=0.3)


def test_smoke_jitted():
    sampler = _make_sampler()
    m = sampler.model
    params = VanillaPredictiveSamplerParams(
        x0=jnp.zeros(m.nq + m.nv),
        us_guess=jnp.zeros((10, m.nu)),
        rng=jax.random.PRNGKey(0),
    )
    xs, us = jax.jit(sampler.optimize)(params)
    assert xs.shape == (11, m.nq + m.nv)
    assert us.shape == (10, m.nu)
    assert np.isfinite(np.asarray(xs)).all()


@pytest.mark.slow
def test_cost_decrease_batched():
    """Optimized cost <= guess cost for a batch of random problems —
    guaranteed since sample 0 is the unperturbed guess (reference
    test_predictive_sampler.py:60-87)."""
    sampler = _make_sampler()
    m = sampler.model
    nx = m.nq + m.nv
    batch = 8
    rng = jax.random.PRNGKey(1)
    keys = jax.random.split(rng, batch)
    x0s = 0.2 * jax.random.normal(jax.random.PRNGKey(2), (batch, nx))
    us_guess = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (batch, 10, m.nu))

    params = VanillaPredictiveSamplerParams(x0=x0s, us_guess=us_guess, rng=keys)
    xs, us = jax.jit(jax.vmap(sampler.optimize))(params)

    from ambersim_tpu.trajopt.shooting import shoot

    xs_guess = jax.vmap(shoot, in_axes=(None, 0, 0))(m, x0s, us_guess)
    cost_guess = jax.vmap(sampler.cost_function.cost)(xs_guess, us_guess)
    cost_star = jax.vmap(sampler.cost_function.cost)(xs, us)
    # relative slack: the sample-0 rollout inside optimize (vmap over
    # samples inside vmap over problems) and the direct shoot here fuse
    # differently, so their f32 costs differ by reduction-order noise
    # (~5e-7 relative observed); the property holds up to that noise
    cg = np.asarray(cost_guess)
    assert np.all(np.asarray(cost_star) <= cg + 1e-5 + 1e-5 * np.abs(cg))
