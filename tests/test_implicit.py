"""Full 'implicit' integrator parity vs MuJoCo C (mjINT_IMPLICIT).

The full implicit integrator includes the exact Coriolis/centrifugal velocity
derivative d(-qfrc_bias)/dqvel in the implicit solve (reference role: the MJX
pipeline config surface at ambersim/utils/io_utils.py:161-183 passes the
integrator through; MuJoCo C is the behavior oracle). Our derivative comes
from forward-mode autodiff through com_vel+RNEA rather than a hand-written
mjd_rne_vel — these must agree to machine precision, so rollouts must track
MuJoCo within accumulation tolerance.
"""

import mujoco
import numpy as np

import jax
import jax.numpy as jnp

from ambersim_tpu.engine import make_data, step
from ambersim_tpu.engine.setconst import set_constants
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

# Asymmetric free body spinning fast: gyroscopic precession is pure Coriolis,
# the term the full implicit integrator must capture (implicitfast omits it).
GYRO_XML = """
<mujoco><option timestep="0.005" integrator="{integrator}" gravity="0 0 0"/>
<compiler angle="radian"/>
<worldbody><body pos="0 0 1">
  <freejoint/>
  <geom type="box" size="0.3 0.1 0.02" mass="1.2"/>
</body></worldbody></mujoco>
"""

# Damped double pendulum swung hard: Coriolis coupling between links.
CHAIN_XML = """
<mujoco><option timestep="0.004" integrator="implicit"/><compiler angle="radian"/>
<worldbody><body pos="0 0 1.5">
  <joint name="h1" axis="0 1 0" damping="0.05"/>
  <geom type="capsule" fromto="0 0 0 0 0 -0.5" size="0.03"/>
  <body pos="0 0 -0.5">
    <joint name="h2" axis="1 0 0" damping="0.02"/>
    <geom type="capsule" fromto="0 0 0 0 0.45 0" size="0.025"/>
    <body pos="0 0.45 0">
      <joint name="h3" axis="0 1 0" damping="0.02"/>
      <geom type="capsule" fromto="0 0 0 0 0 -0.35" size="0.02"/>
    </body>
  </body>
</body></worldbody>
<actuator><velocity joint="h1" kv="0.8"/></actuator>
</mujoco>
"""

# Fluid drag (viscosity + density): its velocity derivative enters the
# implicit solve in MuJoCo for both implicit and implicitfast.
FLUID_XML = """
<mujoco><option timestep="0.005" integrator="{integrator}" viscosity="0.9" density="80"/>
<compiler angle="radian"/>
<worldbody><body pos="0 0 1">
  <freejoint/>
  <geom type="box" size="0.12 0.07 0.03" mass="0.4"/>
</body></worldbody></mujoco>
"""


def _pair(xml):
    mj_model = mujoco.MjModel.from_xml_string(xml)
    model = set_constants(compile_spec(parse_mjcf_string(xml)))
    return mj_model, model


def _rollout_pair(xml, qvel0, nsteps, qpos0=None):
    mj_model, model = _pair(xml)
    mj_data = mujoco.MjData(mj_model)
    if qpos0 is not None:
        mj_data.qpos[:] = qpos0
    mj_data.qvel[:] = qvel0
    d = make_data(model)
    if qpos0 is not None:
        d = d.replace(qpos=jnp.asarray(qpos0, dtype=d.qpos.dtype))
    d = d.replace(qvel=jnp.asarray(qvel0, dtype=d.qvel.dtype))
    stp = jax.jit(step)
    for _ in range(nsteps):
        mujoco.mj_step(mj_model, mj_data)
    for _ in range(nsteps):
        d = stp(model, d)
    return mj_data, d


def test_implicit_gyroscopic_free_body():
    """Tumbling asymmetric body (Dzhanibekov-adjacent): full implicit must
    track MuJoCo's implicit, which implicitfast visibly does not."""
    qvel0 = np.array([0.0, 0, 0, 6.0, 0.15, 0.1])
    mj_data, d = _rollout_pair(GYRO_XML.format(integrator="implicit"), qvel0, 300)
    np.testing.assert_allclose(np.asarray(d.qpos), mj_data.qpos, atol=2e-3)
    np.testing.assert_allclose(np.asarray(d.qvel), mj_data.qvel, atol=5e-3)


def test_implicit_differs_from_implicitfast_on_gyro():
    """Sanity: on the spinning body the two integrators must diverge —
    otherwise the Coriolis derivative is not actually being used."""
    qvel0 = np.array([0.0, 0, 0, 6.0, 0.15, 0.1])
    _, d_full = _rollout_pair(GYRO_XML.format(integrator="implicit"), qvel0, 300)
    _, d_fast = _rollout_pair(GYRO_XML.format(integrator="implicitfast"), qvel0, 300)
    assert np.abs(np.asarray(d_full.qpos) - np.asarray(d_fast.qpos)).max() > 1e-4


def test_implicit_chain_with_velocity_actuator():
    mj_model, model = _pair(CHAIN_XML)
    mj_data = mujoco.MjData(mj_model)
    mj_data.qpos[:] = [0.9, 0.4, -0.3]
    mj_data.qvel[:] = [2.0, -1.5, 1.0]
    mj_data.ctrl[:] = [0.5]
    d = make_data(model).replace(
        qpos=jnp.array([0.9, 0.4, -0.3]),
        qvel=jnp.array([2.0, -1.5, 1.0]),
        ctrl=jnp.array([0.5]),
    )
    stp = jax.jit(step)
    for _ in range(250):
        mujoco.mj_step(mj_model, mj_data)
    for _ in range(250):
        d = stp(model, d)
    np.testing.assert_allclose(np.asarray(d.qpos), mj_data.qpos, atol=3e-3)
    np.testing.assert_allclose(np.asarray(d.qvel), mj_data.qvel, atol=1e-2)


def test_implicitfast_fluid_drag_derivative():
    """Fluid-drag velocity derivative enters MuJoCo's implicitfast solve
    (mjd_passive_vel), symmetrized; ours must match on a falling+spinning box
    in viscous dense fluid."""
    qvel0 = np.array([0.4, -0.2, 0, 3.0, 2.0, 1.0])
    mj_data, d = _rollout_pair(FLUID_XML.format(integrator="implicitfast"), qvel0, 200)
    np.testing.assert_allclose(np.asarray(d.qpos), mj_data.qpos, atol=2e-3)
    np.testing.assert_allclose(np.asarray(d.qvel), mj_data.qvel, atol=5e-3)


def test_implicit_fluid_drag_derivative():
    qvel0 = np.array([0.4, -0.2, 0, 3.0, 2.0, 1.0])
    mj_data, d = _rollout_pair(FLUID_XML.format(integrator="implicit"), qvel0, 200)
    np.testing.assert_allclose(np.asarray(d.qpos), mj_data.qpos, atol=2e-3)
    np.testing.assert_allclose(np.asarray(d.qvel), mj_data.qvel, atol=5e-3)
