"""Joint actuatorfrcrange parity vs MuJoCo C.

`<joint actuatorfrcrange>` clamps the total actuator force transmitted to the
joint's dofs (mj_fwdActuation's qfrc_actuator clamp). Reference surface: any
MJCF the C compiler accepts loads through ambersim's loader (reference
ambersim/utils/io_utils.py:139-221)."""

import mujoco
import numpy as np

from ambersim_tpu.engine import forward, make_data, step
from ambersim_tpu.engine.setconst import set_constants
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

# Strong motors (gear 10) against a tight actuatorfrcrange so the clamp is
# active; one joint clamped asymmetrically, one unclamped as control.
XML = """
<mujoco><option timestep="0.004"/><compiler angle="radian"/>
<worldbody>
  <body pos="0 0 1">
    <joint name="j1" axis="0 1 0" damping="0.1" actuatorfrcrange="-0.8 0.5"/>
    <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.04"/>
    <body pos="0.3 0 0">
      <joint name="j2" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" fromto="0 0 0 0.25 0 0" size="0.035"/>
    </body>
  </body>
</worldbody>
<actuator>
  <motor joint="j1" gear="10"/>
  <motor joint="j2" gear="10"/>
</actuator>
</mujoco>
"""


def test_actfrcrange_clamp_parity():
    mj_model = mujoco.MjModel.from_xml_string(XML)
    model = set_constants(compile_spec(parse_mjcf_string(XML)))
    np.testing.assert_allclose(
        np.asarray(model.jnt_actfrcrange), mj_model.jnt_actfrcrange, atol=1e-8
    )
    assert bool(model.skel.jnt_actfrclimited[0]) and not bool(model.skel.jnt_actfrclimited[1])

    mj_data = mujoco.MjData(mj_model)
    mj_data.ctrl[:] = [1.0, -0.3]
    mujoco.mj_forward(mj_model, mj_data)
    d = make_data(model).replace(ctrl=np.array([1.0, -0.3], np.float32))
    d = forward(model, d)
    # gear*ctrl = 10 on j1 -> clamped to 0.5; j2 = -3 unclamped
    np.testing.assert_allclose(np.asarray(d.qfrc_actuator), mj_data.qfrc_actuator, atol=1e-6)
    assert abs(float(d.qfrc_actuator[0]) - 0.5) < 1e-6

    # short rollout with the clamp active both directions
    for i in range(50):
        ctrl = np.array([np.sin(0.3 * i) * 2, np.cos(0.2 * i)], np.float64)
        mj_data.ctrl[:] = ctrl
        mujoco.mj_step(mj_model, mj_data)
        d = d.replace(ctrl=ctrl.astype(np.float32))
        d = step(model, d)
    np.testing.assert_allclose(np.asarray(d.qpos), mj_data.qpos, atol=2e-4)
    np.testing.assert_allclose(np.asarray(d.qvel), mj_data.qvel, atol=2e-3)
