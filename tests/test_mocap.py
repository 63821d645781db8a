"""Mocap (kinematic target) bodies: d.mocap_pos/mocap_quat drive the frames
of jointless world-children, parity vs the MuJoCo C engine (mjData.mocap_*
semantics; reference's MJX dependency exposes the same surface)."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ambersim_tpu.engine import forward, make_data, step
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

MOCAP_WELD = """
<mujoco><option timestep="0.002"/><worldbody>
  <body name="target" mocap="true" pos="0.1 0 0.5" euler="0 0 30">
    <geom type="sphere" size="0.02" contype="0" conaffinity="0"/>
  </body>
  <body name="box" pos="0.1 0 0.5">
    <freejoint/><geom type="box" size="0.05 0.05 0.05" mass="0.1"/>
  </body>
</worldbody>
<equality><weld body1="target" body2="box"/></equality>
</mujoco>
"""


def _pair(xml):
    mj_model = mujoco.MjModel.from_xml_string(xml)
    from ambersim_tpu.engine.setconst import set_constants

    model = set_constants(compile_spec(parse_mjcf_string(xml)))
    return mj_model, model


def test_mocap_compile_fields():
    mj_model, model = _pair(MOCAP_WELD)
    s = model.skel
    assert mj_model.nmocap == s.nmocap == 1
    np.testing.assert_array_equal(s.body_mocapid, mj_model.body_mocapid)
    d = make_data(model)
    np.testing.assert_allclose(np.asarray(d.mocap_pos), [[0.1, 0, 0.5]], atol=1e-7)


def test_mocap_rejects_jointed_body():
    bad = MOCAP_WELD.replace('<body name="box" pos="0.1 0 0.5">',
                             '<body name="box" mocap="true" pos="0.1 0 0.5">')
    with pytest.raises(ValueError, match="mocap"):
        compile_spec(parse_mjcf_string(bad))


def test_mocap_kinematics_follow_target():
    """Moving mocap_pos/quat moves the body and its geoms, matching mj_forward."""
    mj_model, model = _pair(MOCAP_WELD)
    mj_data = mujoco.MjData(mj_model)
    new_pos = np.array([0.3, -0.2, 0.7])
    new_quat = np.array([np.cos(0.4), 0.0, np.sin(0.4), 0.0])
    mj_data.mocap_pos[0] = new_pos
    mj_data.mocap_quat[0] = new_quat
    mujoco.mj_forward(mj_model, mj_data)

    d = make_data(model)
    d = d.replace(mocap_pos=jnp.array([new_pos]), mocap_quat=jnp.array([new_quat]))
    d = jax.jit(forward)(model, d)

    bid = int(np.nonzero(np.asarray(model.skel.body_mocapid) >= 0)[0][0])
    np.testing.assert_allclose(np.asarray(d.xpos[bid]), mj_data.xpos[bid], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d.xquat[bid]), mj_data.xquat[bid], atol=1e-6)
    gid = int(model.skel.geom_bodyid[0]) == bid and 0 or 1
    np.testing.assert_allclose(np.asarray(d.geom_xpos), mj_data.geom_xpos, atol=1e-6)


def test_mocap_weld_drag_rollout():
    """Free box welded to a mocap target tracks a moved target; trajectory
    parity vs the C engine over 100 steps."""
    mj_model, model = _pair(MOCAP_WELD)
    mj_data = mujoco.MjData(mj_model)
    target = np.array([0.25, 0.1, 0.6])
    mj_data.mocap_pos[0] = target
    for _ in range(100):
        mujoco.mj_step(mj_model, mj_data)

    d = make_data(model)
    d = d.replace(mocap_pos=jnp.array([target]))

    @jax.jit
    def roll(d):
        return jax.lax.fori_loop(0, 100, lambda _, dd: step(model, dd), d)

    d = roll(d)
    np.testing.assert_allclose(np.asarray(d.qpos), mj_data.qpos, rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(d.qvel), mj_data.qvel, rtol=1e-2, atol=5e-3)
    # the box is being pulled toward the target
    assert np.linalg.norm(np.asarray(d.qpos[:3]) - target) < 0.12
