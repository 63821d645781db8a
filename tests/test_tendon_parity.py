"""Fixed-tendon parity vs the MuJoCo C oracle.

Covers the full fixed-tendon feature surface: lengths/velocities (linear in
qpos via the compile-time jacobian), deadband springs + dampers in the passive
force, tendon limits and frictionloss as efc rows, tendon-transmission
actuators, tendon equality coupling, and tendonpos/tendonvel sensors.
Reference exposure: tendons ride through mjx in the reference's pipeline
(ambersim/rl/base.py:93); the Barrett hand couples fingers with equality
constraints (ambersim/models/barrett_hand/bh280.xml:196-200) for which fixed
tendons are the standard MuJoCo alternative.
"""

import mujoco
import numpy as np
import pytest

import jax

from ambersim_tpu.engine import forward, make_data, step
from ambersim_tpu.engine.setconst import set_constants
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

TENDON_RIG = """
<mujoco model="tendon_rig">
  <option timestep="0.002"/>
  <worldbody>
    <body name="p1" pos="0 0 0.5">
      <joint name="j1" axis="0 1 0" damping="0.02"/>
      <geom type="capsule" fromto="0 0 0 0.2 0 0" size="0.02"/>
      <body name="p2" pos="0.2 0 0">
        <joint name="j2" axis="0 1 0" damping="0.02"/>
        <geom type="capsule" fromto="0 0 0 0.2 0 0" size="0.02"/>
        <body name="p3" pos="0.2 0 0">
          <joint name="j3" axis="0 1 0" damping="0.02"/>
          <geom type="capsule" fromto="0 0 0 0.15 0 0" size="0.02"/>
        </body>
      </body>
    </body>
  </worldbody>
  <tendon>
    <fixed name="flex" range="-0.5 0.6" stiffness="1.5" damping="0.3" frictionloss="0.1">
      <joint joint="j1" coef="0.04"/>
      <joint joint="j2" coef="0.03"/>
      <joint joint="j3" coef="0.02"/>
    </fixed>
    <fixed name="couple" springlength="0 0.05" stiffness="2.0">
      <joint joint="j2" coef="0.05"/>
      <joint joint="j3" coef="-0.05"/>
    </fixed>
  </tendon>
  <actuator>
    <motor name="tm" tendon="flex" gear="3" ctrlrange="-1 1"/>
    <motor name="jm" joint="j1"/>
  </actuator>
  <equality>
    <tendon tendon1="flex" tendon2="couple" polycoef="0 0.5 0 0 0"/>
  </equality>
  <sensor>
    <tendonpos name="tp" tendon="flex"/>
    <tendonvel name="tv" tendon="couple"/>
  </sensor>
</mujoco>
"""


def _load_pair(xml):
    mj_model = mujoco.MjModel.from_xml_string(xml)
    model = set_constants(compile_spec(parse_mjcf_string(xml)))
    return mj_model, model


def test_tendon_model_layout():
    """Compile-time tendon tables match the MuJoCo compiler + mj_setConst."""
    mj_model, model = _load_pair(TENDON_RIG)
    s = model.skel
    assert s.ntendon == mj_model.ntendon == 2
    # one tendon friction row + one tendon limit row, no dof rows
    assert s.nf == 1 and s.nl == 1 and s.ne == 1
    np.testing.assert_allclose(model.tendon_length0, mj_model.tendon_length0, atol=1e-7)
    np.testing.assert_allclose(
        model.tendon_lengthspring, mj_model.tendon_lengthspring, atol=1e-7
    )
    np.testing.assert_allclose(
        model.tendon_invweight0, mj_model.tendon_invweight0, rtol=1e-4
    )
    np.testing.assert_allclose(model.tendon_range, mj_model.tendon_range, atol=1e-7)
    np.testing.assert_allclose(model.tendon_stiffness, mj_model.tendon_stiffness, atol=1e-7)
    np.testing.assert_allclose(model.tendon_damping, mj_model.tendon_damping, atol=1e-7)
    np.testing.assert_allclose(
        model.tendon_frictionloss, mj_model.tendon_frictionloss, atol=1e-7
    )
    # dense fixed-tendon jacobian vs MuJoCo's wrap tables (joint id + coef)
    ten_J = np.zeros((mj_model.ntendon, mj_model.nv))
    for t in range(mj_model.ntendon):
        adr, num = mj_model.tendon_adr[t], mj_model.tendon_num[t]
        for w in range(adr, adr + num):
            ten_J[t, mj_model.jnt_dofadr[mj_model.wrap_objid[w]]] += mj_model.wrap_prm[w]
    np.testing.assert_allclose(model.tendon_J, ten_J, atol=1e-7)


def test_tendon_forward_parity():
    """ten_length/ten_velocity, passive spring+damper, actuator force, sensors,
    and accelerations at random states."""
    mj_model, model = _load_pair(TENDON_RIG)
    mj_data = mujoco.MjData(mj_model)
    fwd = jax.jit(forward)
    rng = np.random.default_rng(7)
    for _ in range(4):
        qpos = 0.6 * rng.standard_normal(mj_model.nq)
        qvel = 0.8 * rng.standard_normal(mj_model.nv)
        ctrl = rng.uniform(-1, 1, mj_model.nu)
        mj_data.qpos[:] = qpos
        mj_data.qvel[:] = qvel
        mj_data.ctrl[:] = ctrl
        mujoco.mj_forward(mj_model, mj_data)
        d = make_data(model)
        d = d.replace(
            qpos=qpos.astype(np.float32),
            qvel=qvel.astype(np.float32),
            ctrl=ctrl.astype(np.float32),
        )
        d = fwd(model, d)
        np.testing.assert_allclose(d.ten_length, mj_data.ten_length, atol=1e-6)
        np.testing.assert_allclose(d.ten_velocity, mj_data.ten_velocity, atol=1e-6)
        np.testing.assert_allclose(d.sensordata, mj_data.sensordata, atol=1e-6)
        np.testing.assert_allclose(d.qfrc_passive, mj_data.qfrc_passive, atol=1e-6)
        np.testing.assert_allclose(d.actuator_force, mj_data.actuator_force, atol=1e-5)
        # constrained acceleration: tendon limit + friction + equality rows all
        # feed the Newton solve; f32 pipeline vs f64 oracle on stiff states
        scale = max(1.0, np.abs(mj_data.qacc).max())
        np.testing.assert_allclose(
            np.asarray(d.qacc) / scale, mj_data.qacc / scale, atol=2e-2
        )


@pytest.mark.slow
def test_tendon_rollout_parity():
    """500-step driven rollout through limits/friction/equality stays on the
    oracle trajectory."""
    mj_model, model = _load_pair(TENDON_RIG)
    mj_data = mujoco.MjData(mj_model)
    d = make_data(model)
    stp = jax.jit(step)
    for i in range(500):
        ctrl = np.array([0.6 * np.sin(0.01 * i), 0.3 * np.cos(0.013 * i)])
        mj_data.ctrl[:] = ctrl
        mujoco.mj_step(mj_model, mj_data)
        d = stp(model, d.replace(ctrl=ctrl.astype(np.float32)))
        np.testing.assert_allclose(d.qpos, mj_data.qpos, atol=2e-3)
    assert np.abs(np.asarray(d.qpos) - mj_data.qpos).max() < 2e-3


TENDON_LIMIT_SENSOR_RIG = """
<mujoco><option timestep="0.002"/><worldbody>
  <body pos="0 0 0.5"><joint name="j1" axis="0 1 0" damping="0.02"/><geom type="capsule" fromto="0 0 0 0.2 0 0" size="0.02"/>
  <body pos="0.2 0 0"><joint name="j2" axis="0 1 0" damping="0.02"/><geom type="capsule" fromto="0 0 0 0.2 0 0" size="0.02"/></body></body>
</worldbody>
<tendon><fixed name="t" range="-0.04 0.04"><joint joint="j1" coef="0.05"/><joint joint="j2" coef="0.03"/></fixed></tendon>
<sensor><tendonlimitpos name="tlp" tendon="t"/><tendonlimitvel name="tlv" tendon="t"/><tendonlimitfrc name="tlf" tendon="t"/></sensor>
</mujoco>
"""


def test_tendon_limit_sensors():
    """tendonlimitpos/vel/frc read the tendon's efc limit row (zero when the
    limit is inactive), matching the oracle."""
    mj_model, model = _load_pair(TENDON_LIMIT_SENSOR_RIG)
    mj_data = mujoco.MjData(mj_model)
    fwd = jax.jit(forward)
    for q1 in [0.2, 0.6, 1.2, -1.0]:
        qpos = np.array([q1, 0.3])
        qvel = np.array([0.5, -0.2])
        mj_data.qpos[:] = qpos
        mj_data.qvel[:] = qvel
        mujoco.mj_forward(mj_model, mj_data)
        d = make_data(model).replace(
            qpos=qpos.astype(np.float32), qvel=qvel.astype(np.float32)
        )
        d = fwd(model, d)
        np.testing.assert_allclose(
            d.sensordata, mj_data.sensordata, rtol=1e-4, atol=1e-6
        )
