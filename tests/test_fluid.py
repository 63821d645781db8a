"""Fluid-force (density/viscosity/wind) parity vs the MuJoCo C oracle.

engine/smooth._fluid_force implements the inertia-box model of mj_passive:
equivalent box half-sizes from body inertia, viscous sphere drag on the local
6D velocity (linear part relative to opt.wind), quadratic density drag per
box face, applied as a world wrench at xipos. Pinned formula-for-formula.
"""

import mujoco
import numpy as np
import pytest

import jax

from ambersim_tpu.engine import forward, make_data, step
from ambersim_tpu.engine.setconst import set_constants
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

FLUID_RIG = """
<mujoco>
  <option timestep="0.002" density="1.2" viscosity="0.3" wind="0.5 -0.2 0.1"/>
  <worldbody>
    <body pos="0 0 1">
      <freejoint/>
      <geom type="box" size="0.1 0.15 0.2" density="400" euler="15 25 35"/>
      <body pos="0.3 0 0"><joint name="h" axis="0 1 0" damping="0.01"/>
        <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.04" density="300"/></body>
    </body>
  </worldbody>
</mujoco>
"""


def _load_pair(xml):
    mj_model = mujoco.MjModel.from_xml_string(xml)
    model = set_constants(compile_spec(parse_mjcf_string(xml)))
    return mj_model, model


def test_fluid_passive_parity():
    """qfrc_passive (spring/damper + fluid wrench) at random states."""
    mj_model, model = _load_pair(FLUID_RIG)
    mj_data = mujoco.MjData(mj_model)
    fwd = jax.jit(forward)
    rng = np.random.default_rng(9)
    for _ in range(4):
        qpos = mj_model.qpos0.copy()
        qpos[:3] += 0.2 * rng.standard_normal(3)
        q = rng.standard_normal(4)
        qpos[3:7] = q / np.linalg.norm(q)
        qpos[7] = rng.standard_normal()
        qvel = rng.standard_normal(mj_model.nv)
        mj_data.qpos[:] = qpos
        mj_data.qvel[:] = qvel
        mujoco.mj_forward(mj_model, mj_data)
        d = make_data(model).replace(
            qpos=qpos.astype(np.float32), qvel=qvel.astype(np.float32)
        )
        d = fwd(model, d)
        np.testing.assert_allclose(d.qfrc_passive, mj_data.qfrc_passive, atol=1e-5)
        np.testing.assert_allclose(d.qacc, mj_data.qacc, rtol=1e-4, atol=1e-3)


@pytest.mark.slow
def test_fluid_rollout_parity():
    """800 steps of free tumbling through wind + viscous + quadratic drag."""
    mj_model, model = _load_pair(FLUID_RIG)
    mj_data = mujoco.MjData(mj_model)
    v0 = np.array([1, 0.5, 2, 3, -2, 1, 0], np.float64)
    mj_data.qvel[:] = v0
    d = make_data(model).replace(qvel=v0.astype(np.float32))
    stp = jax.jit(step)
    for _ in range(800):
        mujoco.mj_step(mj_model, mj_data)
        d = stp(model, d)
    np.testing.assert_allclose(d.qpos, mj_data.qpos, atol=1e-4)


GRAVCOMP_RIG = """
<mujoco><option timestep="0.002"/><worldbody>
  <body pos="0 0 1" gravcomp="0.7"><freejoint/><geom type="box" size="0.1 0.1 0.1" density="500"/>
    <body pos="0.3 0 0" gravcomp="1.0"><joint axis="0 1 0"/><geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03"/></body>
  </body>
</worldbody></mujoco>
"""


def test_gravcomp_parity():
    """body gravcomp adds the antigravity wrench at each COM (mj_passive)."""
    mj_model, model = _load_pair(GRAVCOMP_RIG)
    mj_data = mujoco.MjData(mj_model)
    mj_data.qvel[:] = 0.3
    mujoco.mj_forward(mj_model, mj_data)
    d = make_data(model).replace(qvel=np.full(7, 0.3, np.float32))
    d = jax.jit(forward)(model, d)
    np.testing.assert_allclose(d.qfrc_passive, mj_data.qfrc_passive, atol=1e-5)
    # free fall with partial compensation tracks the oracle
    mj_data2 = mujoco.MjData(mj_model)
    d2 = make_data(model)
    stp = jax.jit(step)
    for _ in range(500):
        mujoco.mj_step(mj_model, mj_data2)
        d2 = stp(model, d2)
    np.testing.assert_allclose(d2.qpos, mj_data2.qpos, atol=1e-4)
