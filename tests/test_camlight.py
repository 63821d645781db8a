"""Camera/light kinematics parity vs the MuJoCo C oracle (mj_camlight).

Covers all five mjtCamLight modes for cameras and lights, the compiled
*_0 constants (mj_setConst), and <frame>-wrapped cameras/lights.
Reference role: render-support kinematics of the MJX pipeline the reference
consumes via mjx.forward (SURVEY.md §2.2 D3).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from ambersim_tpu.engine import forward, make_data
from ambersim_tpu.engine.setconst import set_constants
from ambersim_tpu.mjcf.compiler import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

def _load(xml):
    return set_constants(compile_spec(parse_mjcf_string(xml)))


CAM_XML = """
<mujoco>
  <worldbody>
    <light pos="0 0 3" dir="0 0 -1" directional="true"/>
    <camera name="c_world" pos="2 0 1" euler="0 50 90"/>
    <body name="tgt" pos="0.3 -0.2 0.5">
      <joint type="slide" axis="1 0 0"/><geom type="sphere" size="0.05" mass="1"/>
      <body name="sub" pos="0.1 0.4 0.2">
        <joint type="hinge"/><geom type="sphere" size="0.04" mass="2"/>
      </body>
    </body>
    <body name="camb" pos="1.0 2.0 0.8" euler="5 -10 15">
      <joint type="hinge" axis="0 0 1"/><geom type="sphere" size="0.05" mass="1"/>
      <camera name="c_fix" pos="0.1 0.2 0.3" euler="10 20 30" fovy="60"/>
      <camera name="c_trk" mode="track" pos="0.1 0.2 0.3" euler="10 20 30"/>
      <camera name="c_tcom" mode="trackcom" pos="0.1 0.2 0.3" euler="10 20 30"/>
      <camera name="c_tb" mode="targetbody" target="tgt" pos="0.1 0.2 0.3"/>
      <camera name="c_tbc" mode="targetbodycom" target="tgt" pos="0.1 0.2 0.3"/>
      <light name="l_fix" pos="0.1 0.2 0.3" dir="0.3 -0.4 -0.8"/>
      <light name="l_trk" mode="track" pos="0.1 0.2 0.3" dir="0 0 -1"/>
      <light name="l_tcom" mode="trackcom" pos="0.1 0.2 0.3" dir="0 0 -1"/>
      <light name="l_tb" mode="targetbody" target="sub" pos="0.1 0.2 0.3"/>
      <light name="l_tbc" mode="targetbodycom" target="tgt" pos="0.1 0.2 0.3"/>
    </body>
  </worldbody>
</mujoco>
"""


@pytest.fixture(scope="module")
def pair():
    m = _load(CAM_XML)
    mm = mujoco.MjModel.from_xml_string(CAM_XML)
    return m, mm


def test_compiled_constants(pair):
    m, mm = pair
    assert m.skel.ncam == mm.ncam and m.skel.nlight == mm.nlight
    np.testing.assert_array_equal(np.asarray(m.skel.cam_mode), mm.cam_mode)
    np.testing.assert_array_equal(np.asarray(m.skel.cam_bodyid), mm.cam_bodyid)
    np.testing.assert_array_equal(np.asarray(m.skel.cam_targetbodyid), mm.cam_targetbodyid)
    np.testing.assert_array_equal(np.asarray(m.skel.light_mode), mm.light_mode)
    np.testing.assert_array_equal(np.asarray(m.skel.light_targetbodyid), mm.light_targetbodyid)
    directional = mm.light_type == int(mujoco.mjtLightType.mjLIGHT_DIRECTIONAL)
    np.testing.assert_array_equal(np.asarray(m.skel.light_directional), directional)
    for name in (
        "cam_pos",
        "cam_quat",
        "cam_fovy",
        "cam_pos0",
        "cam_poscom0",
        "light_pos",
        "light_dir",
        "light_pos0",
        "light_poscom0",
        "light_dir0",
    ):
        ours = np.asarray(getattr(m, name))
        np.testing.assert_allclose(ours, getattr(mm, name), atol=1e-5, err_msg=name)
    np.testing.assert_allclose(np.asarray(m.cam_mat0).reshape(-1, 9), mm.cam_mat0, atol=1e-5)


@pytest.mark.parametrize("qp", [[0.0, 0.0, 0.0], [0.7, 0.4, 1.1], [-0.5, 2.0, -2.3]])
def test_camlight_parity(pair, qp):
    m, mm = pair
    d = jax.jit(forward, static_argnums=())(m, make_data(m).replace(qpos=jnp.array(qp, jnp.float32)))
    md = mujoco.MjData(mm)
    md.qpos[:] = qp
    mujoco.mj_forward(mm, md)
    np.testing.assert_allclose(np.asarray(d.cam_xpos), md.cam_xpos, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d.cam_xmat).reshape(-1, 9), md.cam_xmat, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d.light_xpos), md.light_xpos, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d.light_xdir), md.light_xdir, atol=1e-5)


def test_camlight_in_frame():
    xml = """
    <mujoco>
      <worldbody>
        <body name="b" pos="0.2 0.1 0.4">
          <joint type="hinge" axis="0 1 0"/><geom type="sphere" size="0.05" mass="1"/>
          <frame pos="0.1 -0.2 0.3" euler="0 0 40">
            <camera name="c" pos="0.05 0 0.1" euler="10 0 0"/>
            <light name="l" pos="0.05 0 0.1" dir="1 0 -1"/>
          </frame>
        </body>
      </worldbody>
    </mujoco>
    """
    m = _load(xml)
    mm = mujoco.MjModel.from_xml_string(xml)
    md = mujoco.MjData(mm)
    md.qpos[:] = 0.6
    mujoco.mj_forward(mm, md)
    d = forward(m, make_data(m).replace(qpos=jnp.array([0.6], jnp.float32)))
    np.testing.assert_allclose(np.asarray(d.cam_xpos), md.cam_xpos, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d.cam_xmat).reshape(-1, 9), md.cam_xmat, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d.light_xpos), md.light_xpos, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d.light_xdir), md.light_xdir, atol=1e-5)
