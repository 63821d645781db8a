"""Spatial-tendon parity vs the MuJoCo C oracle.

Covers site via-point routing, pulley branch divisors, and sphere/cylinder
geom wrapping (with and without sidesites), through lengths, runtime
jacobians (via ten_velocity and the passive force), and driven rollouts.
The wrap path math lives in engine/smooth.py (_wrap_seg, cf. mju_wrap).
Reference exposure: spatial tendons ride through mjx in the reference's
pipeline (ambersim/rl/base.py:93).
"""

import mujoco
import numpy as np
import pytest

import jax

from ambersim_tpu.engine import forward, make_data, step
from ambersim_tpu.engine.setconst import set_constants
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

SPATIAL_RIG = """
<mujoco model="spatial_rig">
  <option timestep="0.002"/>
  <worldbody>
    <body name="a" pos="0 0 0.5">
      <joint name="j1" axis="0 1 0" damping="0.05"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.02"/>
      <site name="sa" pos="0.3 0 0"/>
      <geom name="cylwrap" type="cylinder" size="0.06 0.2" pos="0.15 0 0.1" euler="90 0 0" contype="0" conaffinity="0"/>
      <site name="cylside" pos="0.15 0 0.2"/>
      <body name="b" pos="0.3 0 0">
        <joint name="j2" axis="0 1 0" damping="0.05"/>
        <geom type="capsule" fromto="0 0 0 0.25 0 0" size="0.02"/>
        <site name="sb" pos="0.25 0 0"/>
        <geom name="sphwrap" type="sphere" size="0.05" pos="0.1 0 0.0" contype="0" conaffinity="0"/>
      </body>
    </body>
    <site name="w1" pos="-0.2 0 0.8"/>
    <site name="w2" pos="0.5 0.1 0.9"/>
  </worldbody>
  <tendon>
    <spatial name="cyl_side" stiffness="2" damping="0.1">
      <site site="w1"/>
      <geom geom="cylwrap" sidesite="cylside"/>
      <site site="sb"/>
    </spatial>
    <spatial name="sph_noside" stiffness="1">
      <site site="sa"/>
      <geom geom="sphwrap"/>
      <site site="w2"/>
    </spatial>
    <spatial name="cyl_noside" range="0 0.6">
      <site site="sa"/>
      <geom geom="cylwrap"/>
      <site site="w1"/>
    </spatial>
    <spatial name="pulleyed">
      <site site="w1"/>
      <site site="sa"/>
      <pulley divisor="2"/>
      <site site="sa"/>
      <site site="sb"/>
    </spatial>
  </tendon>
  <actuator>
    <motor name="tm" tendon="cyl_side" gear="1.5" ctrlrange="-5 5"/>
  </actuator>
</mujoco>
"""


def _load_pair(xml):
    mj_model = mujoco.MjModel.from_xml_string(xml)
    model = set_constants(compile_spec(parse_mjcf_string(xml)))
    return mj_model, model


def test_spatial_layout():
    """length0/invweight0 at qpos0 match the MuJoCo compiler + mj_setConst."""
    mj_model, model = _load_pair(SPATIAL_RIG)
    assert model.skel.ntendon == mj_model.ntendon == 4
    np.testing.assert_allclose(model.tendon_length0, mj_model.tendon_length0, atol=1e-6)
    np.testing.assert_allclose(
        model.tendon_invweight0, mj_model.tendon_invweight0, rtol=1e-4, atol=1e-6
    )
    # default springlength resolves to length0 (mj_setConst semantics)
    np.testing.assert_allclose(
        model.tendon_lengthspring, mj_model.tendon_lengthspring, atol=1e-6
    )


def test_spatial_forward_parity():
    """Lengths, velocities (runtime jacobian), and passive forces across a
    sweep that covers both wrapped and unwrapped geometry."""
    mj_model, model = _load_pair(SPATIAL_RIG)
    mj_data = mujoco.MjData(mj_model)
    fwd = jax.jit(forward)
    rng = np.random.default_rng(2)
    wrapnums = set()
    for trial in range(12):
        qpos = np.array([-1.5 + 0.25 * trial, 1.5 - 0.25 * trial])
        qpos = qpos + 0.1 * rng.standard_normal(2)
        qvel = rng.standard_normal(mj_model.nv)
        mj_data.qpos[:] = qpos
        mj_data.qvel[:] = qvel
        mujoco.mj_forward(mj_model, mj_data)
        wrapnums.update(mj_data.ten_wrapnum.tolist())
        d = make_data(model).replace(
            qpos=qpos.astype(np.float32), qvel=qvel.astype(np.float32)
        )
        d = fwd(model, d)
        np.testing.assert_allclose(d.ten_length, mj_data.ten_length, atol=1e-6)
        np.testing.assert_allclose(d.ten_velocity, mj_data.ten_velocity, atol=1e-6)
        np.testing.assert_allclose(d.qfrc_passive, mj_data.qfrc_passive, atol=1e-5)
    # the sweep must exercise both the straight path (2 wrap points) and an
    # active geom wrap (4 wrap points), else this test proves nothing hard
    assert 2 in wrapnums and 4 in wrapnums


@pytest.mark.slow
def test_spatial_rollout_parity():
    """400-step driven rollout with tendon actuator + springs + limit."""
    mj_model, model = _load_pair(SPATIAL_RIG)
    mj_data = mujoco.MjData(mj_model)
    d = make_data(model)
    stp = jax.jit(step)
    for i in range(400):
        ctrl = np.array([2.0 * np.sin(0.01 * i)])
        mj_data.ctrl[:] = ctrl
        mujoco.mj_step(mj_model, mj_data)
        d = stp(model, d.replace(ctrl=ctrl.astype(np.float32)))
        np.testing.assert_allclose(d.qpos, mj_data.qpos, atol=5e-3)


PULLEY_RING = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body name="a" pos="0 0 0.5">
      <joint name="j1" axis="0 1 0" damping="0.05"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.02"/>
      <site name="s1" pos="0.3 0 0"/>
    </body>
    <body name="ring" pos="0.1 0 0.2">
      <geom name="wrap" type="cylinder" size="0.05 0.1" euler="90 0 0" contype="0" conaffinity="0"/>
      <site name="inside" pos="0 0 0.02"/>
    </body>
    <site name="w1" pos="0.1 0 -0.3"/>
  </worldbody>
  <tendon>
    <spatial name="t" stiffness="4" damping="0.1">
      <site site="s1"/>
      <geom geom="wrap" sidesite="inside"/>
      <site site="w1"/>
    </spatial>
  </tendon>
</mujoco>
"""


def test_interior_wrap_parity():
    """Sidesite inside the geom: the tendon bends at a single circle point
    (mju_wrap 'wrap_inside'), straight when the segment crosses the disk."""
    mj_model, model = _load_pair(PULLEY_RING)
    mj_data = mujoco.MjData(mj_model)
    fwd = jax.jit(forward)
    wrapnums = set()
    for q in [-1.2, -0.6, 0.0, 0.6, 1.2]:
        mj_data.qpos[:] = q
        mj_data.qvel[:] = 0.7
        mujoco.mj_forward(mj_model, mj_data)
        wrapnums.update(mj_data.ten_wrapnum.tolist())
        d = make_data(model).replace(
            qpos=np.array([q], np.float32), qvel=np.array([0.7], np.float32)
        )
        d = fwd(model, d)
        np.testing.assert_allclose(d.ten_length, mj_data.ten_length, atol=1e-6)
        np.testing.assert_allclose(d.ten_velocity, mj_data.ten_velocity, atol=1e-6)
    assert 2 in wrapnums and 4 in wrapnums  # both straight and bent states hit


@pytest.mark.slow
def test_interior_wrap_rollout():
    mj_model, model = _load_pair(PULLEY_RING)
    mj_data = mujoco.MjData(mj_model)
    mj_data.qvel[:] = 2.0
    d = make_data(model).replace(qvel=np.array([2.0], np.float32))
    stp = jax.jit(step)
    for _ in range(500):
        mujoco.mj_step(mj_model, mj_data)
        d = stp(model, d)
    np.testing.assert_allclose(d.qpos, mj_data.qpos, atol=1e-4)
