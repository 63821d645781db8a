"""<replicate> and <composite type="cable"> expansion parity vs the MuJoCo C
oracle: compiled body poses, joint structure, and short dynamic rollouts.

Reference role: the reference loads arbitrary MJCF through the MuJoCo
compiler (SURVEY.md §2.2 D1); these are the macro-expansion features its
models could use.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from ambersim_tpu.engine import make_data, step
from ambersim_tpu.engine.setconst import set_constants
from ambersim_tpu.mjcf.compiler import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string


def _load(xml):
    return set_constants(compile_spec(parse_mjcf_string(xml)))


def _compare_structure(xml):
    m = _load(xml)
    mm = mujoco.MjModel.from_xml_string(xml)
    assert m.skel.nbody == mm.nbody and m.skel.njnt == mm.njnt and m.skel.ngeom == mm.ngeom
    np.testing.assert_array_equal(np.asarray(m.skel.body_parentid), mm.body_parentid)
    np.testing.assert_array_equal(np.asarray(m.skel.jnt_type), mm.jnt_type)
    # canonicalize quat signs before comparing
    bq = np.asarray(m.body_quat)
    bq = np.where(bq[:, :1] < 0, -bq, bq)
    rq = np.where(mm.body_quat[:, :1] < 0, -mm.body_quat, mm.body_quat)
    np.testing.assert_allclose(np.asarray(m.body_pos), mm.body_pos, atol=1e-5)
    np.testing.assert_allclose(bq, rq, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m.geom_pos), mm.geom_pos, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m.body_mass), mm.body_mass, atol=1e-6)
    return m, mm


def _rollout_parity(m, mm, steps=100, atol=2e-3):
    md = mujoco.MjData(mm)
    d = make_data(m)
    stepj = jax.jit(lambda dd: step(m, dd))
    for _ in range(steps):
        d = stepj(d)
        mujoco.mj_step(mm, md)
    np.testing.assert_allclose(np.asarray(d.qpos), md.qpos, atol=atol)


REPLICATE_XML = """
<mujoco>
  <worldbody>
    <geom type="plane" size="5 5 0.1"/>
    <replicate count="4" offset="0.3 0 0" euler="0 0 30" sep="-">
      <body name="b" pos="0 0.5 1">
        <joint name="j" type="hinge" damping="0.1"/>
        <geom name="g" type="capsule" fromto="0 0 0 0 0 -0.3" size="0.04" mass="1"/>
      </body>
    </replicate>
  </worldbody>
  <sensor>
    <jointpos joint="j-2"/>
  </sensor>
</mujoco>
"""


def test_replicate_structure_and_rollout():
    m, mm = _compare_structure(REPLICATE_XML)
    assert m.skel.nsensor == 1
    _rollout_parity(m, mm)


def test_replicate_default_sep_names():
    xml = """
    <mujoco><worldbody>
      <replicate count="2" offset="0.4 0 0">
        <body name="b"><joint type="hinge"/><geom type="sphere" size="0.05" mass="1"/></body>
      </replicate>
    </worldbody></mujoco>
    """
    m = _load(xml)
    assert list(m.skel.body_names) == ["world", "b0", "b1"]


CABLE_CURVE_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <composite type="cable" curve="cos(s) sin(s) s" count="8 1 1" size="1 0.2 2"
               offset="0 0 1" initial="free">
      <geom type="capsule" size="0.01" mass="0.01"/>
      <joint kind="main" damping="0.02" armature="0.001"/>
    </composite>
  </worldbody>
</mujoco>
"""


def test_cable_helix_structure_and_rollout():
    m, mm = _compare_structure(CABLE_CURVE_XML)
    _rollout_parity(m, mm, steps=50, atol=2e-3)


def test_cable_vertex_list():
    verts = np.array([[0, 0, 1], [0.1, 0, 1.05], [0.2, 0.03, 1.0], [0.3, 0, 0.95], [0.42, 0, 1.0]])
    vtx = " ".join(str(x) for x in verts.ravel())
    xml = f"""
    <mujoco><worldbody>
      <composite type="cable" vertex="{vtx}" initial="ball" prefix="rope">
        <geom type="capsule" size="0.01" mass="0.02"/>
      </composite>
    </worldbody></mujoco>
    """
    m, mm = _compare_structure(xml)
    assert "ropeB_first" in m.skel.body_names and "ropeB_last" in m.skel.body_names


def test_cable_hanging_swing():
    # pinned straight cable swinging under gravity: trajectory parity
    xml = """
    <mujoco>
      <option timestep="0.002"/>
      <worldbody>
        <composite type="cable" curve="s" count="6 1 1" size="0.5" offset="0 0 1" initial="none">
          <geom type="capsule" size="0.01" mass="0.05"/>
          <joint kind="main" damping="0.01"/>
        </composite>
      </worldbody>
    </mujoco>
    """
    m, mm = _compare_structure(xml)
    _rollout_parity(m, mm, steps=100, atol=2e-3)
