"""Stage-by-stage parity of smooth dynamics vs the MuJoCo C engine.

Strategy mirrors the reference's testing discipline: cross-validate against an
independent implementation rather than golden files (SURVEY.md §4). Constraints
are disabled here; contact/solver parity has its own tests.
"""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ambersim_tpu.core.types import DisableBit
from ambersim_tpu.engine import forward, make_data, step
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

PENDULUM = open("ambersim_tpu/models/pendulum/pendulum.xml").read()

DOUBLE_PENDULUM = """
<mujoco model="dp">
  <option timestep="0.005"/>
  <worldbody>
    <body name="upper" pos="0 0 2">
      <joint name="shoulder" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" fromto="0 0 0 0 0 -0.5" size="0.04"/>
      <body name="lower" pos="0 0 -0.5">
        <joint name="elbow" axis="1 0 0" damping="0.2" stiffness="3.0" springref="10"/>
        <geom type="capsule" fromto="0 0 0 0.1 0 -0.4" size="0.03"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""

SLIDER_ARM = """
<mujoco model="slider_arm">
  <compiler angle="degree"/>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="cart" pos="0 0 0.5">
      <joint name="slide_x" type="slide" axis="1 0 0" damping="0.05"/>
      <geom type="box" size="0.1 0.08 0.05" density="500"/>
      <body name="pole" pos="0 0 0.05" euler="0 15 0">
        <joint name="hinge1" axis="0 1 0" armature="0.01"/>
        <geom type="capsule" size="0.02 0.25" pos="0 0 0.25"/>
        <body name="tip" pos="0 0 0.5">
          <joint name="hinge2" axis="1 0 0"/>
          <geom type="sphere" size="0.04" density="2000"/>
        </body>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor joint="slide_x" gear="2"/>
    <motor joint="hinge1"/>
  </actuator>
</mujoco>
"""

FREE_BODY = """
<mujoco model="free_body">
  <option timestep="0.002"/>
  <worldbody>
    <body name="brick" pos="0.1 0.2 1.0" euler="0 0 30">
      <freejoint/>
      <geom type="box" size="0.1 0.05 0.02" density="800"/>
      <geom type="sphere" size="0.03" pos="0.08 0 0.03" density="1200"/>
    </body>
  </worldbody>
</mujoco>
"""

BALL_CHAIN = """
<mujoco model="ball_chain">
  <option timestep="0.002"/>
  <worldbody>
    <body name="link1" pos="0 0 1.5">
      <joint name="ball1" type="ball" damping="0.01"/>
      <geom type="capsule" fromto="0 0 0 0 0 -0.3" size="0.02"/>
      <body name="link2" pos="0 0 -0.3">
        <joint name="ball2" type="ball"/>
        <geom type="capsule" fromto="0 0 0 0 0.1 -0.25" size="0.02"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""

ALL_MODELS = {
    "pendulum": PENDULUM,
    "double_pendulum": DOUBLE_PENDULUM,
    "slider_arm": SLIDER_ARM,
    "free_body": FREE_BODY,
    "ball_chain": BALL_CHAIN,
}


def _load_pair(xml: str):
    mj_model = mujoco.MjModel.from_xml_string(xml)
    mj_model.opt.disableflags |= (
        mujoco.mjtDisableBit.mjDSBL_CONTACT | mujoco.mjtDisableBit.mjDSBL_CONSTRAINT
    )
    spec = parse_mjcf_string(xml)
    model = compile_spec(spec)
    model = model.replace(opt=model.opt.replace(disableflags=model.opt.disableflags | DisableBit.CONSTRAINT))
    return mj_model, model


def _random_state(mj_model, rng):
    qpos = mj_model.qpos0.copy()
    qvel = 0.5 * rng.standard_normal(mj_model.nv)
    for j in range(mj_model.njnt):
        jt = mj_model.jnt_type[j]
        qa = mj_model.jnt_qposadr[j]
        if jt == mujoco.mjtJoint.mjJNT_FREE:
            qpos[qa : qa + 3] += 0.3 * rng.standard_normal(3)
            q = rng.standard_normal(4)
            qpos[qa + 3 : qa + 7] = q / np.linalg.norm(q)
        elif jt == mujoco.mjtJoint.mjJNT_BALL:
            q = rng.standard_normal(4)
            qpos[qa : qa + 4] = q / np.linalg.norm(q)
        else:
            qpos[qa] += 0.7 * rng.standard_normal()
    return qpos, qvel


@pytest.mark.parametrize("name", list(ALL_MODELS))
def test_forward_parity(name):
    xml = ALL_MODELS[name]
    mj_model, model = _load_pair(xml)
    rng = np.random.default_rng(0)

    fwd = jax.jit(forward, static_argnums=())

    for trial in range(3):
        qpos, qvel = _random_state(mj_model, rng)
        ctrl = 0.5 * rng.standard_normal(mj_model.nu)

        mj_data = mujoco.MjData(mj_model)
        mj_data.qpos[:] = qpos
        mj_data.qvel[:] = qvel
        mj_data.ctrl[:] = ctrl
        mujoco.mj_forward(mj_model, mj_data)

        d = make_data(model)
        d = d.replace(
            qpos=jnp.asarray(qpos, jnp.float32),
            qvel=jnp.asarray(qvel, jnp.float32),
            ctrl=jnp.asarray(ctrl, jnp.float32),
        )
        d = fwd(model, d)

        np.testing.assert_allclose(d.xpos, mj_data.xpos, atol=1e-5, err_msg=f"{name} xpos")
        # quaternions match up to sign
        xq = np.asarray(d.xquat)
        sign = np.sign(np.sum(xq * mj_data.xquat, axis=-1, keepdims=True))
        np.testing.assert_allclose(sign * xq, mj_data.xquat, atol=1e-5, err_msg=f"{name} xquat")
        np.testing.assert_allclose(d.xipos, mj_data.xipos, atol=1e-5, err_msg=f"{name} xipos")
        np.testing.assert_allclose(d.subtree_com, mj_data.subtree_com, atol=1e-5, err_msg=f"{name} subtree_com")
        np.testing.assert_allclose(d.cdof, mj_data.cdof, atol=1e-5, err_msg=f"{name} cdof")

        qm_dense = np.zeros((mj_model.nv, mj_model.nv))
        mujoco.mj_fullM(mj_model, mj_data, qm_dense)
        np.testing.assert_allclose(d.qM, qm_dense, rtol=1e-4, atol=1e-5, err_msg=f"{name} qM")

        np.testing.assert_allclose(d.qfrc_bias, mj_data.qfrc_bias, rtol=1e-4, atol=1e-4, err_msg=f"{name} qfrc_bias")
        np.testing.assert_allclose(
            d.qfrc_passive, mj_data.qfrc_passive, rtol=1e-4, atol=1e-5, err_msg=f"{name} qfrc_passive"
        )
        np.testing.assert_allclose(
            d.qfrc_actuator, mj_data.qfrc_actuator, rtol=1e-4, atol=1e-5, err_msg=f"{name} qfrc_actuator"
        )
        np.testing.assert_allclose(d.qacc, mj_data.qacc, rtol=1e-3, atol=1e-3, err_msg=f"{name} qacc")


@pytest.mark.parametrize("name", list(ALL_MODELS))
@pytest.mark.slow
def test_rollout_parity(name):
    """Multi-step trajectory comparison (accumulated error budget)."""
    xml = ALL_MODELS[name]
    mj_model, model = _load_pair(xml)
    rng = np.random.default_rng(1)
    qpos, qvel = _random_state(mj_model, rng)
    qvel *= 0.2

    mj_data = mujoco.MjData(mj_model)
    mj_data.qpos[:] = qpos
    mj_data.qvel[:] = qvel

    d = make_data(model)
    d = d.replace(qpos=jnp.asarray(qpos, jnp.float32), qvel=jnp.asarray(qvel, jnp.float32))

    stp = jax.jit(step)
    nsteps = 100
    for _ in range(nsteps):
        mujoco.mj_step(mj_model, mj_data)
    for _ in range(nsteps):
        d = stp(model, d)

    np.testing.assert_allclose(d.qpos, mj_data.qpos, rtol=1e-2, atol=2e-3, err_msg=f"{name} qpos after {nsteps}")
    np.testing.assert_allclose(d.qvel, mj_data.qvel, rtol=1e-2, atol=5e-3, err_msg=f"{name} qvel after {nsteps}")


def test_xfrc_applied_parity():
    """External (force, torque) at body CoM — MuJoCo xfrc_applied layout
    (ADVICE r1: ordering must be force-first)."""
    xml = """
<mujoco><option timestep="0.002"/><worldbody>
  <body name="b" pos="0 0 1"><freejoint/>
    <geom type="box" size="0.1 0.08 0.05" pos="0.02 0 0"/></body>
</worldbody></mujoco>
"""
    mj_model = mujoco.MjModel.from_xml_string(xml)
    mj_model.opt.disableflags |= (
        mujoco.mjtDisableBit.mjDSBL_CONTACT | mujoco.mjtDisableBit.mjDSBL_CONSTRAINT
    )
    mj_data = mujoco.MjData(mj_model)
    mj_data.xfrc_applied[1] = [1.5, -0.7, 9.0, 0.2, 0.4, -0.3]  # force, torque
    mujoco.mj_forward(mj_model, mj_data)

    from ambersim_tpu.engine.setconst import set_constants

    model = set_constants(compile_spec(parse_mjcf_string(xml)))
    model = model.replace(opt=model.opt.replace(disableflags=int(DisableBit.CONSTRAINT)))
    d = make_data(model)
    d = d.replace(
        xfrc_applied=d.xfrc_applied.at[1].set(jnp.array([1.5, -0.7, 9.0, 0.2, 0.4, -0.3]))
    )
    d = jax.jit(forward)(model, d)
    np.testing.assert_allclose(d.qacc, mj_data.qacc, rtol=1e-4, atol=1e-4)
