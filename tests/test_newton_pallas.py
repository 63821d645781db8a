"""Parity of the fused Pallas Newton solver (ops/newton_pallas.py) against
the jnp path, using interpret mode so the kernel logic is validated on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ambersim_tpu.engine import collision, constraint, make_data, smooth, solver
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string
from ambersim_tpu.ops.newton_pallas import newton_solve_batched

CONTACT_SCENE = """
<mujoco><option timestep="0.002"/><compiler angle="radian"/><worldbody>
  <geom name="floor" type="plane" size="0 0 1"/>
  <body pos="0 0 0.08" euler="0.1 0.05 0"><freejoint/>
    <geom type="box" size="0.1 0.08 0.05"/></body>
  <body pos="0.3 0 0.5">
    <joint name="h" axis="0 1 0" range="-0.5 0.5" frictionloss="0.3" damping="0.1"/>
    <geom type="capsule" fromto="0 0 0 0 0 -0.4" size="0.03"/>
    <body pos="0 0 -0.4"><joint name="h2" axis="0 1 0"/>
      <geom type="sphere" size="0.05"/></body>
  </body>
</worldbody>
<equality><joint joint1="h" joint2="h2" polycoef="0 0.5 0 0 0"/></equality>
</mujoco>
"""


def _pre_solve(m, d):
    d = smooth.fwd_position_smooth(m, d)
    d = collision.collision(m, d)
    d = constraint.make_constraint(m, d)
    d = smooth.fwd_velocity(m, d)
    d = smooth.fwd_actuation(m, d)
    return smooth.fwd_acceleration(m, d)


def _run_parity(m, check_rows=True):
    s = m.skel
    if check_rows:
        assert s.ne > 0 and s.nf > 0 and s.nl > 0  # all row families exercised

    nq, nv = s.nq, s.nv
    B = 20  # deliberately not a multiple of the 128 tile: exercises padding
    key = jax.random.PRNGKey(3)
    d0 = make_data(m)
    keys = jax.random.split(key, B)

    def init(k):
        k1, k2 = jax.random.split(k)
        return d0.replace(
            qpos=d0.qpos + 0.03 * jax.random.normal(k1, (nq,)),
            qvel=0.5 * jax.random.normal(k2, (nv,)),
        )

    batch = jax.vmap(init)(keys)
    batch = jax.vmap(lambda dd: _pre_solve(m, dd))(batch)

    # reference: per-env jnp Newton (dispatch falls back off-TPU)
    ref = jax.vmap(lambda dd: solver.solve(m, dd), in_axes=0)(batch)

    iters = int(max(m.opt.iterations, 1))
    ls = int(max(m.opt.ls_iterations, 1))
    tol = m.opt.tolerance * s.nv * jnp.maximum(jnp.sum(m.body_mass), 1.0)
    qacc, force, qfrc = newton_solve_batched(
        batch.efc_J,
        batch.qM,
        batch.efc_aref,
        batch.efc_D,
        batch.efc_frictionloss,
        batch.efc_active.astype(jnp.float32),
        batch.qacc_smooth,
        batch.qacc_warmstart,
        tol,
        ne=int(s.ne),
        nf=int(s.nf),
        iterations=iters,
        ls_iterations=ls,
        use_ws=True,
        interpret=True,
    )

    np.testing.assert_allclose(np.asarray(qacc), np.asarray(ref.qacc), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(force), np.asarray(ref.efc_force), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(qfrc), np.asarray(ref.qfrc_constraint), rtol=1e-4, atol=1e-4
    )


def test_pallas_newton_matches_jnp():
    from ambersim_tpu.engine.setconst import set_constants

    _run_parity(set_constants(compile_spec(parse_mjcf_string(CONTACT_SCENE))))


def test_pallas_newton_quadruped_nv18():
    """nv = 18 > 2 sublane tiles: exercises the lower-triangle Hessian
    assembly padding and the aligned-block Cholesky updates (j0 = 8, 16)."""
    from ambersim_tpu.utils.io_utils import load_model_from_file

    _run_parity(load_model_from_file("models/quadruped/quadruped.xml"), check_rows=False)
