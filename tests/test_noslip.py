"""Noslip post-pass parity vs the MuJoCo C oracle (mjOption.noslip_iterations;
reference surfaces solver options through its model loader, cf. reference
ambersim/utils/io_utils.py:212-217)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from ambersim_tpu.engine import forward, make_data, step
from ambersim_tpu.mjcf import load_model

XML = """
<mujoco>
  <option timestep="0.002" noslip_iterations="{NI}" noslip_tolerance="0" cone="{CONE}"/>
  <worldbody>
    <geom type="plane" size="3 3 .1" friction=".5 .005 .0001" solimp="0.7 0.8 0.01"/>
    <body pos="0 0 0.049">
      <joint type="free"/>
      <geom type="box" size=".1 .1 .05" mass="2" friction=".5 .005 .0001" solimp="0.7 0.8 0.01"/>
    </body>
    <body pos="0.5 0 0.12">
      <joint name="h" type="hinge" axis="0 0 1" frictionloss="0.8"/>
      <geom type="capsule" fromto="0 0 0 .2 0 0" size=".02" mass="0.5" contype="0" conaffinity="0"/>
    </body>
  </worldbody>
  <actuator><motor joint="h" gear="1"/></actuator>
</mujoco>
"""


def _make(tmp_path, ni, cone):
    path = str(tmp_path / f"noslip_{ni}_{cone}.xml")
    with open(path, "w") as f:
        f.write(XML.format(NI=ni, CONE=cone))
    m = load_model(path)
    mm = mujoco.MjModel.from_xml_path(path)
    return m, mm


@pytest.mark.parametrize("cone", ["pyramidal", "elliptic"])
@pytest.mark.parametrize("ni", [1, 3])
def test_noslip_forward_parity(tmp_path, cone, ni):
    """qacc parity with a lateral force near the stick boundary + a hinge
    torque below frictionloss: noslip must zero the hinge creep and match the
    oracle's contact forces."""
    m, mm = _make(tmp_path, ni, cone)
    md = mujoco.MjData(mm)
    md.xfrc_applied[1, 0] = 8.0  # mu*N = 0.5*2*9.81 = 9.81
    md.ctrl[0] = 0.5  # < frictionloss=0.8: should stick exactly under noslip
    mujoco.mj_forward(mm, md)

    d = make_data(m)
    xf = jnp.zeros_like(d.xfrc_applied).at[1, 0].set(8.0)
    d = d.replace(xfrc_applied=xf, ctrl=jnp.array([0.5]))
    d = jax.jit(lambda d: forward(m, d))(d)

    np.testing.assert_allclose(np.asarray(d.qacc), md.qacc, atol=5e-4)
    # the noslip-specific behavior: frictionloss row is hard (no creep)
    assert abs(float(d.qacc[6])) < 1e-5
    assert abs(md.qacc[6]) < 1e-5


def test_noslip_rollout_parity(tmp_path):
    m, mm = _make(tmp_path, 10, "pyramidal")
    md = mujoco.MjData(mm)
    md.ctrl[0] = 0.5
    d = make_data(m).replace(ctrl=jnp.array([0.5]))
    stepj = jax.jit(lambda d: step(m, d))
    for _ in range(50):
        d = stepj(d)
        mujoco.mj_step(mm, md)
    np.testing.assert_allclose(np.asarray(d.qpos), md.qpos, atol=2e-5)
    # hinge never moved: frictionloss holds exactly under noslip
    assert abs(md.qpos[7]) < 1e-9 and abs(float(d.qpos[7])) < 1e-7
