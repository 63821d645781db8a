"""Adhesion (BODY-transmission) actuator parity vs MuJoCo C.

<adhesion body=.../> distributes a gain*ctrl force over the contact normals
of all contacts involving the body, including contacts inside the gap (so
adhesion can act at a distance). Reference surface: general actuator support
passed through by ambersim's loader (reference ambersim/utils/io_utils.py:
139-221 loads any MJCF actuator the C compiler accepts)."""

import mujoco
import numpy as np

import jax
import jax.numpy as jnp

from ambersim_tpu.engine import forward, make_data, step
from ambersim_tpu.engine.setconst import set_constants
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

BOX_XML = """
<mujoco><option timestep="0.002"/><compiler angle="radian"/>
<worldbody>
  <geom name="floor" type="plane" size="2 2 0.1" friction="1 0.005 0.0001"/>
  <body name="box" pos="0 0 0.049">
    <freejoint/>
    <geom name="bg" type="box" size="0.05 0.05 0.05" mass="0.5" friction="1 0.005 0.0001"/>
  </body>
</worldbody>
<actuator><adhesion name="adh" body="box" ctrlrange="0 20" gain="30"/></actuator>
</mujoco>
"""

# box hovering above the floor inside a gap: the solver sees no contact, the
# adhesion actuator still pulls (MuJoCo's adhesion-at-a-distance semantics)
GAP_XML = """
<mujoco><option timestep="0.002"/><compiler angle="radian"/>
<worldbody>
  <geom name="floor" type="plane" size="2 2 0.1" margin="0.02" gap="0.02"/>
  <body name="box" pos="0 0 0.058">
    <freejoint/>
    <geom name="bg" type="box" size="0.05 0.05 0.05" mass="0.5" margin="0.02" gap="0.02"/>
  </body>
</worldbody>
<actuator><adhesion name="adh" body="box" ctrlrange="0 50" gain="40"/></actuator>
</mujoco>
"""


def _pair(xml):
    mj_model = mujoco.MjModel.from_xml_string(xml)
    model = set_constants(compile_spec(parse_mjcf_string(xml)))
    return mj_model, model


def test_adhesion_force_and_moment():
    """qfrc_actuator from the adhesion transmission matches MuJoCo on a
    resting multi-contact box (4 active floor contacts)."""
    mj_model, model = _pair(BOX_XML)
    mj_data = mujoco.MjData(mj_model)
    mj_data.ctrl[0] = 0.7
    mujoco.mj_forward(mj_model, mj_data)

    d = make_data(model).replace(ctrl=jnp.array([0.7]))
    d = jax.jit(forward)(model, d)
    np.testing.assert_allclose(np.asarray(d.actuator_force), mj_data.actuator_force, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d.qfrc_actuator), mj_data.qfrc_actuator, atol=1e-5)
    assert float(d.qfrc_actuator[2]) < -20.0  # pulls the box down


def test_adhesion_through_gap():
    """Adhesion acts at a distance through the margin: a hovering box within
    includemargin feels the pull. MuJoCo 3.10 semantics (oracle-verified):
    margins ADD across the pair, gap is dynamically inert, and the
    at-a-distance contact rows stay ACTIVE in the solver — full qacc parity."""
    mj_model, model = _pair(GAP_XML)
    mj_data = mujoco.MjData(mj_model)
    mj_data.ctrl[0] = 1.0
    mujoco.mj_forward(mj_model, mj_data)

    d = make_data(model).replace(ctrl=jnp.array([1.0]))
    d = jax.jit(forward)(model, d)
    # margin-range contact: constraint rows active on both engines
    assert mj_data.nefc > 0
    assert float(jnp.sum(d.efc_active)) == float(mj_data.nefc)
    assert float(d.qfrc_actuator[2]) < -30.0
    np.testing.assert_allclose(np.asarray(d.qfrc_actuator), mj_data.qfrc_actuator, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d.qacc), mj_data.qacc, rtol=5e-3, atol=1e-3)


def test_adhesion_holds_rollout():
    """Closed-loop rollout parity: adhesion sticks the box to the floor while
    an applied lateral force would otherwise tip it."""
    mj_model, model = _pair(BOX_XML)
    mj_data = mujoco.MjData(mj_model)
    mj_data.ctrl[0] = 10.0
    mj_data.xfrc_applied[1, 0] = 1.5  # lateral pull on the box

    d = make_data(model).replace(ctrl=jnp.array([10.0]))
    xf = jnp.zeros_like(d.xfrc_applied).at[1, 0].set(1.5)
    d = d.replace(xfrc_applied=xf)
    stp = jax.jit(step)
    for _ in range(150):
        mujoco.mj_step(mj_model, mj_data)
    for _ in range(150):
        d = stp(model, d)
    np.testing.assert_allclose(np.asarray(d.qpos), mj_data.qpos, atol=2e-3)
    # adhesion dominates: the box has not lifted or tipped
    assert abs(float(d.qpos[2]) - 0.05) < 5e-3
