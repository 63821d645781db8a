"""Keyframes (<keyframe><key .../>): mjModel.key_* compile parity vs the
MuJoCo C engine, make_data(keyframe=...) reset semantics
(mj_resetDataKeyframe role), and XML round-trip."""

import mujoco
import numpy as np

from ambersim_tpu.engine import make_data
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.export import spec_to_xml
from ambersim_tpu.mjcf.parser import parse_mjcf_string

KEYED = """
<mujoco><option timestep="0.01"/><worldbody>
  <body name="box" pos="0 0 1">
    <freejoint/>
    <geom type="box" size=".1 .1 .1" mass="1"/>
  </body>
  <body name="arm">
    <joint name="hinge" type="hinge" axis="0 1 0"/>
    <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03" mass="0.5"/>
  </body>
  <body name="target" mocap="true" pos="0.5 0 0.5">
    <geom type="sphere" size="0.02" contype="0" conaffinity="0" mass="0.01"/>
  </body>
</worldbody>
<actuator><motor joint="hinge" gear="1"/></actuator>
<keyframe>
  <key name="home" time="1.5" qpos="0 0 2 1 1 0 0 0.3" qvel="0 0 0.5 0 0 0 0.2"
       ctrl="0.7" mpos="0.1 0.2 0.3" mquat="2 0 0 0"/>
  <key qpos="0 0 1 1 0 0 0 -0.2"/>
</keyframe>
</mujoco>
"""


def _pair(xml):
    mj_model = mujoco.MjModel.from_xml_string(xml)
    from ambersim_tpu.engine.setconst import set_constants

    model = set_constants(compile_spec(parse_mjcf_string(xml)))
    return mj_model, model


def test_keyframe_compile_parity():
    mj_model, model = _pair(KEYED)
    s = model.skel
    assert s.nkey == mj_model.nkey == 2
    assert s.key_names == ("home", "")
    np.testing.assert_allclose(np.asarray(model.key_time), mj_model.key_time, atol=1e-6)
    # quaternions normalized at compile (key 0 has an unnormalized free quat)
    np.testing.assert_allclose(
        np.asarray(model.key_qpos), mj_model.key_qpos.reshape(2, -1), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(model.key_qvel), mj_model.key_qvel.reshape(2, -1), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(model.key_ctrl), mj_model.key_ctrl.reshape(2, -1), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(model.key_mpos), mj_model.key_mpos.reshape(2, -1, 3), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(model.key_mquat), mj_model.key_mquat.reshape(2, -1, 4), atol=1e-6
    )


def test_keyframe_reset():
    mj_model, model = _pair(KEYED)
    mj_data = mujoco.MjData(mj_model)
    mujoco.mj_resetDataKeyframe(mj_model, mj_data, 0)
    d = make_data(model, keyframe="home")
    np.testing.assert_allclose(np.asarray(d.qpos), mj_data.qpos, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d.qvel), mj_data.qvel, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d.ctrl), mj_data.ctrl, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d.mocap_pos), mj_data.mocap_pos, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d.mocap_quat), mj_data.mocap_quat, atol=1e-6)
    assert float(d.time) == mj_data.time
    # index form and default form
    d1 = make_data(model, keyframe=1)
    np.testing.assert_allclose(np.asarray(d1.qpos), np.asarray(model.key_qpos[1]), atol=1e-6)
    d_none = make_data(model)
    np.testing.assert_allclose(np.asarray(d_none.qpos), np.asarray(model.qpos0), atol=1e-6)


def test_keyframe_unknown_name():
    _, model = _pair(KEYED)
    import pytest

    with pytest.raises(KeyError):
        make_data(model, keyframe="nope")


def test_keyframe_xml_roundtrip():
    spec = parse_mjcf_string(KEYED)
    xml2 = spec_to_xml(spec)
    spec2 = parse_mjcf_string(xml2)
    assert len(spec2.keyframes) == 2
    m1 = compile_spec(spec)
    m2 = compile_spec(spec2)
    np.testing.assert_allclose(np.asarray(m1.key_qpos), np.asarray(m2.key_qpos), atol=1e-12)
    np.testing.assert_allclose(np.asarray(m1.key_time), np.asarray(m2.key_time), atol=1e-12)
