"""<frame> element parity vs MuJoCo C.

Frames are pure coordinate transforms the compiler folds into their children
(bodies, geoms, sites, joints, inertials); they never appear in the compiled
model. Reference surface: any MJCF the C compiler accepts loads through
ambersim's loader (reference ambersim/utils/io_utils.py:139-221)."""

import mujoco
import numpy as np

from ambersim_tpu.engine import forward, make_data
from ambersim_tpu.engine.setconst import set_constants
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

# Nested frames (euler + pos), frame-wrapped body/geom/site/joint, worldbody
# frame, fromto geom inside a frame, childclass carrying through a frame.
FRAME_XML = """
<mujoco><compiler angle="degree"/>
<default>
  <default class="small"><geom size="0.02"/></default>
</default>
<worldbody>
  <frame pos="0.1 0 0.5" euler="0 0 30">
    <site name="ws" pos="0.05 0 0" euler="0 15 0"/>
    <geom name="wg" type="sphere" size="0.03" pos="0 0.2 0"/>
    <frame pos="0 0 0.3" axisangle="1 0 0 20">
      <body name="b1" pos="0.1 0.1 0" euler="0 0 45">
        <joint name="j1" type="hinge" axis="0 1 0" pos="0.02 0 0"/>
        <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03"/>
        <frame pos="0.3 0 0" euler="10 0 0">
          <joint name="j2" type="slide" axis="0 0 1"/>
          <geom name="fg" class="small" type="sphere" pos="0 0 0.1"/>
          <site name="fs" pos="0.01 0.02 0.03" euler="5 5 5"/>
          <inertial pos="0.05 0 0" mass="0.7" diaginertia="0.01 0.012 0.013"/>
          <body name="b2" pos="0.1 0 0">
            <joint name="j3" axis="1 0 0"/>
            <geom type="box" size="0.04 0.03 0.02" euler="0 0 10"/>
          </body>
        </frame>
      </body>
    </frame>
  </frame>
</worldbody>
</mujoco>
"""


def test_frame_fold_parity():
    mj_model = mujoco.MjModel.from_xml_string(FRAME_XML)
    model = set_constants(compile_spec(parse_mjcf_string(FRAME_XML)))
    mj_data = mujoco.MjData(mj_model)

    assert model.skel.nq == mj_model.nq == 3
    np.testing.assert_allclose(np.asarray(model.body_pos), mj_model.body_pos, atol=1e-8)
    np.testing.assert_allclose(np.abs(np.asarray(model.body_quat)), np.abs(mj_model.body_quat), atol=1e-8)
    np.testing.assert_allclose(np.asarray(model.body_ipos), mj_model.body_ipos, atol=1e-7)
    np.testing.assert_allclose(np.asarray(model.jnt_pos), mj_model.jnt_pos, atol=1e-8)
    np.testing.assert_allclose(np.asarray(model.jnt_axis), mj_model.jnt_axis, atol=1e-8)

    rng = np.random.default_rng(3)
    q = rng.uniform(-0.5, 0.5, mj_model.nq)
    mj_data.qpos[:] = q
    mujoco.mj_forward(mj_model, mj_data)
    d = make_data(model)
    d = d.replace(qpos=q.astype(np.float32))
    d = forward(model, d)
    np.testing.assert_allclose(np.asarray(d.geom_xpos), mj_data.geom_xpos, atol=2e-6)
    np.testing.assert_allclose(np.asarray(d.geom_xmat), mj_data.geom_xmat.reshape(-1, 3, 3), atol=2e-6)
    np.testing.assert_allclose(np.asarray(d.site_xpos), mj_data.site_xpos, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(d.site_xmat), mj_data.site_xmat.reshape(-1, 3, 3), atol=2e-6
    )
