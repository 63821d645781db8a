"""Refsite (Cartesian) transmission parity vs MuJoCo C.

A site actuator with `refsite=` actuates the 6D pose difference of the site
relative to the reference site, expressed in the refsite frame (MuJoCo
mj_transmission, mjTRN_SITE with refsite >= 0). Reference surface: general
actuator support passed through by ambersim's loader (reference
ambersim/utils/io_utils.py:139-221 loads any MJCF actuator the C compiler
accepts)."""

import mujoco
import numpy as np

import jax
import jax.numpy as jnp

from ambersim_tpu.engine import forward, make_data, step
from ambersim_tpu.engine.setconst import set_constants
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

# 3-DoF arm with an end-effector site servoed toward a world-fixed refsite:
# one translational position actuator per world axis + one rotational.
ARM_XML = """
<mujoco><option timestep="0.004"/><compiler angle="radian"/>
<worldbody>
  <site name="target" pos="0.3 0.1 1.2" euler="0 0.4 0"/>
  <body pos="0 0 1.5">
    <joint name="j1" axis="0 0 1" damping="0.4"/>
    <geom type="capsule" fromto="0 0 0 0.35 0 0" size="0.04"/>
    <body pos="0.35 0 0">
      <joint name="j2" axis="0 1 0" damping="0.3"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.035"/>
      <body pos="0.3 0 0">
        <joint name="j3" axis="0 1 0" damping="0.2"/>
        <geom type="capsule" fromto="0 0 0 0.22 0 0" size="0.03"/>
        <site name="ee" pos="0.22 0 0" euler="0.1 0 0"/>
      </body>
    </body>
  </body>
</worldbody>
<actuator>
  <position name="px" site="ee" refsite="target" gear="1 0 0 0 0 0" kp="40" kv="4"/>
  <position name="pz" site="ee" refsite="target" gear="0 0 1 0 0 0" kp="40" kv="4"/>
  <position name="ry" site="ee" refsite="target" gear="0 0 0 0 1 0" kp="8" kv="1"/>
</actuator>
</mujoco>
"""


def _pair(xml):
    mj_model = mujoco.MjModel.from_xml_string(xml)
    model = set_constants(compile_spec(parse_mjcf_string(xml)))
    return mj_model, model


def test_refsite_length_and_moment():
    """actuator_length and the transmission moment (via qfrc_actuator) must
    match MuJoCo at an arbitrary configuration."""
    mj_model, model = _pair(ARM_XML)
    mj_data = mujoco.MjData(mj_model)
    qpos = np.array([0.5, -0.7, 0.9])
    ctrl = np.array([0.2, -0.1, 0.3])
    mj_data.qpos[:] = qpos
    mj_data.qvel[:] = [0.3, -0.2, 0.1]
    mj_data.ctrl[:] = ctrl
    mujoco.mj_forward(mj_model, mj_data)

    d = make_data(model).replace(
        qpos=jnp.asarray(qpos), qvel=jnp.array([0.3, -0.2, 0.1]), ctrl=jnp.asarray(ctrl)
    )
    d = jax.jit(forward)(model, d)
    np.testing.assert_allclose(np.asarray(d.actuator_length), mj_data.actuator_length, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(d.actuator_velocity), mj_data.actuator_velocity, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(d.actuator_force), mj_data.actuator_force, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d.qfrc_actuator), mj_data.qfrc_actuator, atol=1e-4)


def test_refsite_servo_rollout():
    """Closed-loop Cartesian servo rollout tracks MuJoCo."""
    mj_model, model = _pair(ARM_XML)
    mj_data = mujoco.MjData(mj_model)
    mj_data.qpos[:] = [0.4, -0.5, 0.6]
    d = make_data(model).replace(qpos=jnp.array([0.4, -0.5, 0.6]))
    stp = jax.jit(step)
    for _ in range(300):
        mujoco.mj_step(mj_model, mj_data)
    for _ in range(300):
        d = stp(model, d)
    np.testing.assert_allclose(np.asarray(d.qpos), mj_data.qpos, atol=2e-3)
    np.testing.assert_allclose(np.asarray(d.qvel), mj_data.qvel, atol=1e-2)
