"""Inverse dynamics parity vs the MuJoCo C oracle (mj_inverse), plus the
forward/inverse consistency identity qfrc_inverse = qfrc_actuator +
qfrc_applied when fed forward dynamics' own qacc."""

import mujoco
import numpy as np

import jax
import jax.numpy as jnp

from ambersim_tpu.engine import forward, inverse, make_data
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

PENDULUM = """
<mujoco><option timestep="0.002"/><worldbody>
  <body name="arm" pos="0 0 0.5">
    <joint name="hinge" type="hinge" axis="0 1 0" damping="0.2" frictionloss="0.4"
           limited="true" range="-2.5 2.5"/>
    <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03" mass="0.5"/>
  </body>
</worldbody>
<actuator><motor joint="hinge" gear="1"/></actuator>
</mujoco>
"""

BALL_ON_PLANE = """
<mujoco><option timestep="0.002" cone="{cone}"/><worldbody>
  <geom type="plane" size="2 2 0.1"/>
  <body name="ball" pos="0 0 0.098">
    <freejoint/>
    <geom type="sphere" size="0.1" mass="1" friction="0.8 0.005 0.0001"/>
  </body>
</worldbody></mujoco>
"""


def _pair(xml):
    mj_model = mujoco.MjModel.from_xml_string(xml)
    from ambersim_tpu.engine.setconst import set_constants

    model = set_constants(compile_spec(parse_mjcf_string(xml)))
    return mj_model, model


def _mj_inverse(mm, qpos, qvel, qacc):
    md = mujoco.MjData(mm)
    md.qpos[:] = qpos
    md.qvel[:] = qvel
    md.qacc[:] = qacc
    mujoco.mj_inverse(mm, md)
    return md.qfrc_inverse.copy()


def _ours_inverse(model, qpos, qvel, qacc):
    d = make_data(model).replace(
        qpos=jnp.asarray(qpos, jnp.float32),
        qvel=jnp.asarray(qvel, jnp.float32),
        qacc=jnp.asarray(qacc, jnp.float32),
    )
    return np.asarray(jax.jit(inverse, static_argnums=())(model, d).qfrc_inverse)


def test_inverse_pendulum_limit_friction():
    """Smooth + limit + frictionloss rows: sweep configurations incl. one at
    the joint limit and one in the friction-cone linear (saturated) zone."""
    mm, model = _pair(PENDULUM)
    for qpos, qvel, qacc in [
        ([0.3], [1.2], [4.0]),
        ([2.49], [0.5], [-3.0]),  # inside limit margin
        ([0.0], [0.0], [0.001]),  # friction quadratic zone
        ([-1.0], [-2.0], [30.0]),  # friction saturated zone
    ]:
        ref = _mj_inverse(mm, qpos, qvel, qacc)
        got = _ours_inverse(model, qpos, qvel, qacc)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_inverse_contact_pyramidal():
    mm, model = _pair(BALL_ON_PLANE.format(cone="pyramidal"))
    qpos = [0.0, 0.0, 0.098, 1.0, 0.0, 0.0, 0.0]
    qvel = [0.05, -0.02, -0.1, 0.3, 0.0, 0.1]
    qacc = [0.2, 0.1, -1.0, 0.0, 0.5, 0.0]
    ref = _mj_inverse(mm, qpos, qvel, qacc)
    got = _ours_inverse(model, qpos, qvel, qacc)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_inverse_contact_elliptic():
    mm, model = _pair(BALL_ON_PLANE.format(cone="elliptic"))
    qpos = [0.0, 0.0, 0.098, 1.0, 0.0, 0.0, 0.0]
    qvel = [0.3, -0.02, -0.1, 0.3, 0.0, 0.1]  # sliding: middle cone zone
    qacc = [0.2, 0.1, -1.0, 0.0, 0.5, 0.0]
    ref = _mj_inverse(mm, qpos, qvel, qacc)
    got = _ours_inverse(model, qpos, qvel, qacc)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_forward_inverse_consistency():
    """inverse(forward(d).qacc) recovers qfrc_actuator + qfrc_applied."""
    _, model = _pair(BALL_ON_PLANE.format(cone="pyramidal"))
    d = make_data(model).replace(
        qvel=jnp.asarray([0.1, 0.0, -0.2, 0.2, 0.0, 0.0], jnp.float32),
        qfrc_applied=jnp.asarray([0.3, 0.0, 0.1, 0.0, 0.05, 0.0], jnp.float32),
    )
    df = jax.jit(forward)(model, d)
    di = jax.jit(inverse)(model, df)
    np.testing.assert_allclose(
        np.asarray(di.qfrc_inverse),
        np.asarray(df.qfrc_actuator + d.qfrc_applied),
        rtol=1e-3,
        atol=1e-3,
    )
