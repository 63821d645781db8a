"""Muscle actuators + actuator-shortcut parity vs the MuJoCo C oracle.

Covers the FLV muscle model (mju_muscleGain / mju_muscleBias /
mju_muscleDynamics curve-for-curve), the intvelocity / damper / cylinder
shortcuts, activation clamping (actrange), and FILTEREXACT integration.
Reference exposure: actuator shortcuts ride the reference's model loading +
mjx pipeline (ambersim/utils/io_utils.py:139, ambersim/rl/base.py:93).
"""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ambersim_tpu.engine import make_data, step
from ambersim_tpu.engine import smooth
from ambersim_tpu.engine.setconst import set_constants
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

MUSCLE_RIG = """
<mujoco model="muscle_rig">
  <option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" axis="0 1 0" range="-1.2 1.2" damping="0.05"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03" density="800"/>
      <body pos="0.3 0 0">
        <joint name="j2" axis="0 1 0" range="-1.5 0.5" damping="0.05"/>
        <geom type="capsule" fromto="0 0 0 0.25 0 0" size="0.025" density="800"/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <fixed name="flex" range="-0.2 0.25">
      <joint joint="j1" coef="0.06"/>
      <joint joint="j2" coef="0.05"/>
    </fixed>
  </tendon>
  <actuator>
    <muscle name="mus1" joint="j1" gear="3" lengthrange="-3.7 3.7"/>
    <muscle name="mus2" joint="j2" gear="2" lengthrange="-3.1 1.1" timeconst="0.02 0.06"
            range="0.6 1.1" force="120" lmin="0.4" lmax="1.7" vmax="2" fpmax="1.4"
            fvmax="1.3" tausmooth="0.05"/>
    <muscle name="mus_ten" tendon="flex" lengthrange="-0.2 0.25"/>
    <intvelocity name="iv" joint="j1" kp="8" actrange="-1 1"/>
    <damper name="dmp" joint="j2" kv="1.5" ctrlrange="0 1"/>
    <cylinder name="cyl" joint="j2" timeconst="0.05" area="4" bias="1 0 -0.5"/>
  </actuator>
</mujoco>
"""


def _load_pair(xml):
    mj_model = mujoco.MjModel.from_xml_string(xml)
    model = set_constants(compile_spec(parse_mjcf_string(xml)))
    return mj_model, model


def test_actuator_shortcut_compile_parity():
    """gainprm/biasprm/dynprm/acc0/actlimited for every shortcut match the
    MuJoCo compiler + mj_setConst."""
    mj_model, model = _load_pair(MUSCLE_RIG)
    np.testing.assert_allclose(model.actuator_gainprm, mj_model.actuator_gainprm[:, :9], atol=1e-6)
    np.testing.assert_allclose(model.actuator_biasprm, mj_model.actuator_biasprm[:, :9], atol=1e-6)
    np.testing.assert_allclose(model.actuator_dynprm, mj_model.actuator_dynprm[:, :9], atol=1e-6)
    np.testing.assert_allclose(
        model.actuator_lengthrange, mj_model.actuator_lengthrange, atol=1e-6
    )
    np.testing.assert_allclose(model.actuator_acc0, mj_model.actuator_acc0, rtol=1e-5)
    np.testing.assert_array_equal(
        model.skel.actuator_actlimited, mj_model.actuator_actlimited.ravel().astype(bool)
    )
    np.testing.assert_allclose(model.actuator_actrange, mj_model.actuator_actrange, atol=1e-7)
    assert model.skel.na == mj_model.na
    np.testing.assert_array_equal(model.skel.actuator_dyntype, mj_model.actuator_dyntype.ravel())
    np.testing.assert_array_equal(model.skel.actuator_gaintype, mj_model.actuator_gaintype.ravel())
    np.testing.assert_array_equal(model.skel.actuator_biastype, mj_model.actuator_biastype.ravel())


def test_muscle_curves_vs_oracle():
    """muscle_gain_bias / muscle_dynamics == mju_muscleGain/Bias/Dynamics on a
    dense length x velocity x activation grid."""
    mj_model, model = _load_pair(MUSCLE_RIG)
    u = 1  # mus2: non-default prm incl. tausmooth
    prm = np.asarray(model.actuator_gainprm)[u]
    LR = np.asarray(model.actuator_lengthrange)[u]
    acc0 = float(model.actuator_acc0[u])
    dynprm = np.asarray(model.actuator_dynprm)[u]
    nu = model.skel.nu
    gb = jax.jit(lambda L, V: smooth.muscle_gain_bias(model, L, V))
    rng = np.random.default_rng(5)
    for _ in range(50):
        ln, v = rng.uniform(-4.0, 2.0), rng.uniform(-6.0, 6.0)
        gain, bias = gb(jnp.full(nu, ln), jnp.full(nu, v))
        g_mj = mujoco.mju_muscleGain(ln, v, LR, acc0, prm)
        b_mj = mujoco.mju_muscleBias(ln, LR, acc0, prm)
        assert abs(float(gain[u]) - g_mj) < 1e-4 * max(1.0, abs(g_mj))
        assert abs(float(bias[u]) - b_mj) < 1e-4 * max(1.0, abs(b_mj))
        c, a = rng.uniform(-0.2, 1.2), rng.uniform(0.0, 1.0)
        dyn_u = np.nonzero(np.asarray(model.skel.actuator_dyntype) != 0)[0]
        k = int(np.nonzero(dyn_u == u)[0][0])
        ad = smooth.muscle_dynamics(
            model, jnp.full(len(dyn_u), c), jnp.full(len(dyn_u), a), dyn_u
        )
        ad_mj = mujoco.mju_muscleDynamics(c, a, dynprm[:3])
        assert abs(float(ad[k]) - ad_mj) < 1e-3 * max(1.0, abs(ad_mj))


@pytest.mark.slow
def test_muscle_rollout_parity():
    """400-step driven rollout: muscles (joint + tendon transmission),
    intvelocity with actrange clamping, damper, cylinder filter."""
    mj_model, model = _load_pair(MUSCLE_RIG)
    mj_data = mujoco.MjData(mj_model)
    d = make_data(model)
    stp = jax.jit(step)
    for i in range(400):
        c = np.array(
            [
                0.5 + 0.5 * np.sin(0.02 * i),
                0.5 + 0.4 * np.cos(0.03 * i),
                0.5 + 0.5 * np.sin(0.025 * i),
                0.5 * np.sin(0.01 * i),
                0.3 + 0.2 * np.sin(0.015 * i),
                0.4 * np.cos(0.02 * i),
            ]
        )
        mj_data.ctrl[:] = c
        mujoco.mj_step(mj_model, mj_data)
        d = stp(model, d.replace(ctrl=c.astype(np.float32)))
        np.testing.assert_allclose(d.qpos, mj_data.qpos, atol=2e-3)
        np.testing.assert_allclose(d.act, mj_data.act, atol=1e-4)


def test_filterexact_integration():
    """FILTEREXACT advances act with the exact exponential (mj_advance)."""
    xml = """
    <mujoco><option timestep="0.01"/><worldbody>
      <body pos="0 0 1"><joint name="j" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03"/></body>
    </worldbody>
    <actuator>
      <general name="g" joint="j" dyntype="filterexact" dynprm="0.03" gainprm="2"/>
    </actuator></mujoco>"""
    mj_model, model = _load_pair(xml)
    mj_data = mujoco.MjData(mj_model)
    d = make_data(model)
    stp = jax.jit(step)
    for i in range(50):
        c = np.array([np.sin(0.3 * i)])
        mj_data.ctrl[:] = c
        mujoco.mj_step(mj_model, mj_data)
        d = stp(model, d.replace(ctrl=c.astype(np.float32)))
    np.testing.assert_allclose(d.act, mj_data.act, atol=1e-6)
    np.testing.assert_allclose(d.qpos, mj_data.qpos, atol=1e-5)


THRUSTER_RIG = """
<mujoco><option timestep="0.002"/><worldbody>
  <body pos="0 0 1"><freejoint/><geom type="box" size="0.15 0.15 0.03" density="400"/>
    <site name="thr1" pos="0.1 0.1 0" euler="0 10 0"/>
    <site name="thr2" pos="-0.1 -0.1 0"/>
  </body>
</worldbody>
<actuator>
  <motor name="t1" site="thr1" gear="0 0 1 0 0 0" ctrlrange="0 20"/>
  <motor name="t2" site="thr2" gear="0.3 0 1 0 0 0.05" ctrlrange="0 20"/>
</actuator></mujoco>
"""


def test_site_transmission_parity():
    """Site transmissions: a site-frame wrench (thruster) maps through the
    site jacobian (mj_transmission SITE semantics)."""
    mj_model, model = _load_pair(THRUSTER_RIG)
    mj_data = mujoco.MjData(mj_model)
    q = np.array([0.9, 0.3, 0.2, 0.1])
    q /= np.linalg.norm(q)
    mj_data.qpos[3:7] = q
    mj_data.qvel[:] = [0.2, -0.1, 0.3, 0.5, -0.2, 0.1]
    mj_data.ctrl[:] = [5.0, 3.0]
    mujoco.mj_forward(mj_model, mj_data)
    from ambersim_tpu.engine import forward

    d = make_data(model).replace(
        qpos=mj_data.qpos.astype(np.float32).copy(),
        qvel=mj_data.qvel.astype(np.float32).copy(),
        ctrl=np.array([5.0, 3.0], np.float32),
    )
    d = jax.jit(forward)(model, d)
    np.testing.assert_allclose(d.qfrc_actuator, mj_data.qfrc_actuator, atol=1e-5)
    np.testing.assert_allclose(d.actuator_velocity, mj_data.actuator_velocity, atol=1e-6)
    np.testing.assert_allclose(d.actuator_length, mj_data.actuator_length, atol=1e-7)


@pytest.mark.slow
def test_site_transmission_rollout():
    """400-step driven thruster flight tracks the oracle."""
    mj_model, model = _load_pair(THRUSTER_RIG)
    mj_data = mujoco.MjData(mj_model)
    d = make_data(model)
    stp = jax.jit(step)
    for i in range(400):
        c = np.array([4.5 + 0.4 * np.sin(0.02 * i), 4.4 + 0.3 * np.cos(0.025 * i)])
        mj_data.ctrl[:] = c
        mujoco.mj_step(mj_model, mj_data)
        d = stp(model, d.replace(ctrl=c.astype(np.float32)))
    np.testing.assert_allclose(d.qpos, mj_data.qpos, atol=1e-4)
