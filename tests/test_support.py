"""Support-function parity (jac/jac_site/mul_m/apply_ft) vs MuJoCo C."""

import mujoco
import numpy as np

import jax
import jax.numpy as jnp

from ambersim_tpu.engine import forward, make_data, support
from ambersim_tpu.engine.setconst import set_constants
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

RIG = """
<mujoco><compiler angle="radian"/><option timestep="0.002"/>
<worldbody>
  <body name="base" pos="0 0 1"><freejoint/>
    <geom name="trunk" type="box" size="0.15 0.1 0.05" density="800"/>
    <site name="imu" pos="0.05 0.02 0.03"/>
    <body name="arm" pos="0.15 0 0">
      <joint name="shoulder" axis="0 1 0" damping="0.1"/>
      <geom name="upper" type="capsule" fromto="0 0 0 0.25 0 0" size="0.03"/>
      <body name="fore" pos="0.25 0 0">
        <joint name="elbow" type="ball" damping="0.05"/>
        <geom name="lower" type="capsule" fromto="0 0 0 0.2 0 0" size="0.025"/>
        <site name="ee" pos="0.2 0 0"/>
      </body>
    </body>
  </body>
</worldbody>
</mujoco>
"""


def _pair():
    mj_model = mujoco.MjModel.from_xml_string(RIG)
    m = set_constants(compile_spec(parse_mjcf_string(RIG)))
    mj_data = mujoco.MjData(mj_model)
    rng = np.random.default_rng(3)
    qpos = mj_model.qpos0.copy()
    qpos[:3] += 0.1 * rng.standard_normal(3)
    qpos[7] = 0.6
    mj_data.qpos[:] = qpos
    mj_data.qvel[:] = 0.3 * rng.standard_normal(mj_model.nv)
    mujoco.mj_forward(mj_model, mj_data)
    d = make_data(m).replace(
        qpos=jnp.asarray(qpos, jnp.float32), qvel=jnp.asarray(mj_data.qvel, jnp.float32)
    )
    d = jax.jit(lambda d: forward(m, d))(d)
    return mj_model, mj_data, m, d


def test_jac_matches_mj_jac():
    mj_model, mj_data, m, d = _pair()
    point = np.array([0.1, -0.05, 1.1])
    for bodyid in range(1, mj_model.nbody):
        jacp = np.zeros((3, mj_model.nv))
        jacr = np.zeros((3, mj_model.nv))
        mujoco.mj_jac(mj_model, mj_data, jacp, jacr, point, bodyid)
        jp, jr = jax.jit(support.jac, static_argnums=3)(m, d, jnp.asarray(point, jnp.float32), bodyid)
        np.testing.assert_allclose(np.asarray(jp).T, jacp, atol=1e-5, err_msg=f"jacp body {bodyid}")
        np.testing.assert_allclose(np.asarray(jr).T, jacr, atol=1e-5, err_msg=f"jacr body {bodyid}")


def test_jac_site_and_velocity_consistency():
    mj_model, mj_data, m, d = _pair()
    siteid = 1  # "ee"
    jacp = np.zeros((3, mj_model.nv))
    jacr = np.zeros((3, mj_model.nv))
    mujoco.mj_jacSite(mj_model, mj_data, jacp, jacr, siteid)
    jp, jr = support.jac_site(m, d, siteid)
    np.testing.assert_allclose(np.asarray(jp).T, jacp, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jr).T, jacr, atol=1e-5)
    # jacp.T @ qvel == site world linear velocity from the oracle
    vel = np.zeros(6)
    mujoco.mj_objectVelocity(mj_model, mj_data, mujoco.mjtObj.mjOBJ_SITE, siteid, vel, 0)
    np.testing.assert_allclose(np.asarray(jp.T @ d.qvel), vel[3:], atol=1e-4)


def test_jac_body_variants():
    mj_model, mj_data, m, d = _pair()
    for bodyid in range(1, mj_model.nbody):
        jacp = np.zeros((3, mj_model.nv))
        mujoco.mj_jacBody(mj_model, mj_data, jacp, None, bodyid)
        jp, _ = support.jac_body(m, d, bodyid)
        np.testing.assert_allclose(np.asarray(jp).T, jacp, atol=1e-5)
        mujoco.mj_jacBodyCom(mj_model, mj_data, jacp, None, bodyid)
        jp, _ = support.jac_body_com(m, d, bodyid)
        np.testing.assert_allclose(np.asarray(jp).T, jacp, atol=1e-5)


def test_mul_m_and_apply_ft():
    mj_model, mj_data, m, d = _pair()
    vec = np.linspace(-1, 1, mj_model.nv)
    res = np.zeros(mj_model.nv)
    mujoco.mj_mulM(mj_model, mj_data, res, vec)
    np.testing.assert_allclose(np.asarray(support.mul_m(m, d, jnp.asarray(vec, jnp.float32))), res, rtol=1e-4, atol=1e-4)

    force = np.array([1.0, -2.0, 3.0])
    torque = np.array([0.5, 0.2, -0.4])
    point = np.array([0.2, 0.0, 1.05])
    bodyid = 3
    qfrc = np.zeros(mj_model.nv)
    mujoco.mj_applyFT(mj_model, mj_data, force, torque, point, bodyid, qfrc)
    ours = support.apply_ft(
        m, d, jnp.asarray(force, jnp.float32), jnp.asarray(torque, jnp.float32), jnp.asarray(point, jnp.float32), bodyid
    )
    np.testing.assert_allclose(np.asarray(ours), qfrc, atol=1e-5)
