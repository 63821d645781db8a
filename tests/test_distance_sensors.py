"""Geom-distance sensor parity (<distance>/<normal>/<fromto>, mjtSensor
39-41) vs the MuJoCo C oracle.

These sensors report the signed surface distance, contact normal, and the
closest surface-point segment between two geoms (or the min over all geom
pairs of two bodies), searching out to `cutoff`; beyond cutoff they return
(cutoff, 0, 0). Reference role: MJX sensor coverage of SURVEY.md §2.2 D3.
"""

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


def _both(xml, qpos=None):
    m = _load(xml)
    d = make_data(m)
    if qpos is not None:
        d = d.replace(qpos=jnp.array(qpos, jnp.float32))
    d = forward(m, d)
    mm = mujoco.MjModel.from_xml_string(xml)
    md = mujoco.MjData(mm)
    if qpos is not None:
        md.qpos[:] = qpos
    mujoco.mj_forward(mm, md)
    return np.asarray(d.sensordata), md.sensordata.copy()


def _pair_xml(g1, g2, pos2, cutoff, attach='geom1="ga" geom2="gb"'):
    return f"""
    <mujoco>
      <worldbody>
        <body name="a" pos="0 0 1"><joint type="free"/>{g1}</body>
        <body name="b" pos="{pos2}"><joint type="free"/>{g2}</body>
      </worldbody>
      <sensor>
        <distance {attach} cutoff="{cutoff}"/>
        <normal {attach} cutoff="{cutoff}"/>
        <fromto {attach} cutoff="{cutoff}"/>
      </sensor>
    </mujoco>
    """


SPHERE_A = '<geom name="ga" type="sphere" size="0.1" mass="1"/>'
SPHERE_B = '<geom name="gb" type="sphere" size="0.15" mass="1"/>'
BOX_B = '<geom name="gb" type="box" size="0.1 0.12 0.14" mass="1"/>'
CAP_A = '<geom name="ga" type="capsule" size="0.05 0.2" mass="1"/>'
CAP_B = '<geom name="gb" type="capsule" size="0.07 0.15" euler="30 20 0" mass="1"/>'


@pytest.mark.parametrize(
    "g1,g2,pos2",
    [
        (SPHERE_A, SPHERE_B, "0.5 0.2 1.2"),  # separated
        (SPHERE_A, SPHERE_B, "0.15 0.1 1.05"),  # penetrating
        (SPHERE_A, BOX_B, "0.4 0.1 1.1"),
        (SPHERE_A, BOX_B, "0.12 0.05 1.02"),  # penetrating
        (CAP_A, CAP_B, "0.3 0.1 1.1"),
        (SPHERE_A, CAP_B, "0.35 -0.1 0.9"),
    ],
)
def test_pair_parity(g1, g2, pos2):
    ours, ref = _both(_pair_xml(g1, g2, pos2, cutoff=2.0))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_beyond_cutoff_returns_cutoff_and_zeros():
    ours, ref = _both(_pair_xml(SPHERE_A, SPHERE_B, "3 0 1", cutoff=1.0))
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    assert ours[0] == 1.0 and not ours[1:].any()


def test_zero_cutoff_still_reports_penetration():
    ours, ref = _both(_pair_xml(SPHERE_A, SPHERE_B, "0.2 0 1", cutoff=0.0))
    np.testing.assert_allclose(ours, ref, atol=2e-5)
    assert ours[0] < 0


def test_body_attachment_min_over_geom_pairs():
    xml = """
    <mujoco>
      <worldbody>
        <body name="a" pos="0 0 1">
          <joint type="free"/>
          <geom type="sphere" size="0.1" mass="1"/>
          <geom type="sphere" size="0.05" pos="0.3 0 0" mass="1"/>
        </body>
        <body name="b" pos="0.8 0 1">
          <joint type="free"/>
          <geom type="sphere" size="0.1" mass="1"/>
          <geom type="box" size="0.05 0.05 0.05" pos="-0.2 0 0" mass="1"/>
        </body>
      </worldbody>
      <sensor>
        <distance body1="a" body2="b" cutoff="3"/>
        <normal body1="a" body2="b" cutoff="3"/>
        <fromto body1="a" body2="b" cutoff="3"/>
      </sensor>
    </mujoco>
    """
    ours, ref = _both(xml)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_plane_pair():
    xml = """
    <mujoco>
      <worldbody>
        <geom name="floor" type="plane" size="5 5 0.1"/>
        <body name="a" pos="0.1 -0.2 0.4">
          <joint type="free"/><geom name="ga" type="sphere" size="0.1" mass="1"/>
        </body>
      </worldbody>
      <sensor>
        <distance geom1="floor" geom2="ga" cutoff="5"/>
        <normal geom1="floor" geom2="ga" cutoff="5"/>
        <fromto geom1="floor" geom2="ga" cutoff="5"/>
      </sensor>
    </mujoco>
    """
    ours, ref = _both(xml)
    np.testing.assert_allclose(ours, ref, atol=2e-5)
