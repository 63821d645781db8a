"""<option actuatorgroupdisable> + <user> sensor parity vs the C oracle."""

import jax.numpy as jnp
import mujoco
import numpy as np

from ambersim_tpu.engine import forward, make_data
from ambersim_tpu.engine.setconst import set_constants
from ambersim_tpu.mjcf.compiler import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

XML = """
<mujoco>
  <option actuatorgroupdisable="1 3"/>
  <worldbody>
    <body><joint name="j" type="hinge" damping="0.1"/>
      <geom type="capsule" fromto="0 0 0 0 0 -0.3" size="0.04" mass="1"/></body>
  </worldbody>
  <actuator>
    <motor joint="j" gear="2" group="0" ctrlrange="-2 2"/>
    <motor name="m1" joint="j" gear="2" group="1" ctrlrange="-2 2"/>
    <motor joint="j" gear="2" group="3" ctrlrange="-2 2"/>
    <general joint="j" group="1" dyntype="filter" dynprm="0.1" gainprm="5" ctrlrange="-2 2"/>
  </actuator>
  <sensor>
    <user dim="3" needstage="pos"/>
    <jointpos joint="j"/>
    <actuatorfrc actuator="m1"/>
  </sensor>
</mujoco>
"""


def test_group_disable_and_user_sensor():
    m = set_constants(compile_spec(parse_mjcf_string(XML)))
    assert m.opt.disableactuator == 0b1010
    d = make_data(m).replace(
        qpos=jnp.array([0.3], jnp.float32), ctrl=jnp.ones(4, jnp.float32)
    )
    d = forward(m, d)
    mm = mujoco.MjModel.from_xml_string(XML)
    md = mujoco.MjData(mm)
    md.qpos[:] = 0.3
    md.ctrl[:] = 1.0
    mujoco.mj_forward(mm, md)
    np.testing.assert_allclose(np.asarray(d.actuator_force), md.actuator_force, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d.qfrc_actuator), md.qfrc_actuator, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d.act_dot), md.act_dot, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d.sensordata), md.sensordata, atol=1e-6)
    assert float(d.actuator_force[1]) == 0.0 and float(d.actuator_force[2]) == 0.0
