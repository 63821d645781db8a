"""<contact> sensor parity vs the MuJoCo C oracle (mjSENS_CONTACT).

Pins the conventions implemented in engine/sensor.py::_contact_sensor:
layout/intprm encoding, in-order vs swapped sign rules (third wrench
component, normal = frame n, tangent = frame t1), reduce modes
(none/mindist/maxforce/netforce), found counts, site volume filter, and
subtree matching. Reference exposure: sensors ride mjx.Data.sensordata
through the reference's pipeline (ambersim/rl/base.py:93).
"""

import mujoco
import numpy as np

import jax
import jax.numpy as jnp

from ambersim_tpu.engine import forward, make_data, step
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

SLIDE_RIG = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body name="b" pos="0 0 0.099"><freejoint/>
      <geom name="g" type="sphere" size="0.1" density="1000" condim="6" friction="1 0.05 0.001"/>
    </body>
  </worldbody>
  <sensor>
    <contact name="inorder" geom1="floor" geom2="g" data="found force torque dist pos normal tangent" num="2"/>
    <contact name="swapped" geom1="g" geom2="floor" data="found force torque dist pos normal tangent" num="2"/>
    <contact name="net" geom1="g" data="found force torque dist pos normal tangent" reduce="netforce"/>
    <contact name="onesided" body1="b" data="found force normal"/>
  </sensor>
</mujoco>
"""

BOX_RIG = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <site name="zone" type="box" size="0.2 0.06 0.1" pos="0.05 0 0"/>
    <body name="bx" pos="0 0 0.049"><freejoint/>
      <geom name="gbx" type="box" size="0.05 0.05 0.05" density="1000"/>
    </body>
  </worldbody>
  <sensor>
    <contact name="all4" geom1="gbx" data="found force dist pos normal" num="6"/>
    <contact name="net" body1="bx" data="found force torque" reduce="netforce"/>
    <contact name="deepest" geom1="gbx" reduce="mindist" data="found dist pos"/>
    <contact name="strongest" geom1="gbx" reduce="maxforce" data="force pos"/>
    <contact name="zoned" site="zone" body2="bx" data="found" num="1"/>
  </sensor>
</mujoco>
"""

SUBTREE_RIG = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body name="parent" pos="0 0 0.099"><freejoint/>
      <geom name="gA" type="sphere" size="0.1" density="1000"/>
      <body name="child" pos="0.5 0.2 0">
        <joint name="h" type="hinge" axis="0 1 0"/>
        <geom name="gB" type="sphere" size="0.1" density="300"/>
      </body>
    </body>
  </worldbody>
  <sensor>
    <contact name="sub" subtree1="parent" data="found force pos" num="3"/>
    <contact name="childonly" body1="child" data="found force pos" num="2"/>
    <contact name="sub2" subtree2="parent" data="found normal" num="3"/>
  </sensor>
</mujoco>
"""


def _load_pair(xml):
    from ambersim_tpu.engine.setconst import set_constants

    mj_model = mujoco.MjModel.from_xml_string(xml)
    spec = parse_mjcf_string(xml)
    model = set_constants(compile_spec(spec))
    return mj_model, model


def _sensor_slices(mj_model):
    out = {}
    for i in range(mj_model.nsensor):
        name = mujoco.mj_id2name(mj_model, mujoco.mjtObj.mjOBJ_SENSOR, i)
        out[name] = slice(mj_model.sensor_adr[i], mj_model.sensor_adr[i] + mj_model.sensor_dim[i])
    return out


def _stepped_pair(xml, qvel0, nsteps):
    """Step both engines nsteps from the same init; return (want, got)."""
    mj_model, model = _load_pair(xml)
    mj_data = mujoco.MjData(mj_model)
    mj_data.qvel[: len(qvel0)] = qvel0
    for _ in range(nsteps):
        mujoco.mj_step(mj_model, mj_data)
    mujoco.mj_forward(mj_model, mj_data)

    d = make_data(model)
    qv = np.zeros(model.nv, np.float32)
    qv[: len(qvel0)] = qvel0
    d = d.replace(qvel=jnp.asarray(qv))
    stp = jax.jit(step)
    for _ in range(nsteps):
        d = stp(model, d)
    d = jax.jit(forward)(model, d)
    return mj_model, mj_data.sensordata.copy(), np.asarray(d.sensordata)


def test_contact_sensor_layout():
    mj_model, model = _load_pair(SLIDE_RIG)
    s = model.skel
    np.testing.assert_array_equal(s.sensor_type, mj_model.sensor_type.ravel())
    np.testing.assert_array_equal(s.sensor_dim, mj_model.sensor_dim)
    np.testing.assert_array_equal(s.sensor_adr, mj_model.sensor_adr)
    np.testing.assert_array_equal(s.sensor_objtype, mj_model.sensor_objtype.ravel())
    np.testing.assert_array_equal(s.sensor_objid, mj_model.sensor_objid.ravel())
    np.testing.assert_array_equal(s.sensor_reftype, mj_model.sensor_reftype.ravel())
    np.testing.assert_array_equal(s.sensor_refid, mj_model.sensor_refid.ravel())
    np.testing.assert_array_equal(s.sensor_intprm, mj_model.sensor_intprm)


def test_contact_sensor_single_contact_full_fields():
    """Sliding+spinning sphere: one contact, every field, both match orders."""
    mj_model, want, got = _stepped_pair(SLIDE_RIG, [1.0, 0.4, 0, 0, 0, 3.0], 4)
    slices = _sensor_slices(mj_model)
    assert want[slices["inorder"]][0] == 1  # oracle sanity: one contact found
    for name in ("inorder", "swapped", "net", "onesided"):
        np.testing.assert_allclose(
            got[slices[name]], want[slices[name]], rtol=5e-3, atol=2e-3, err_msg=name
        )


def test_contact_sensor_box_reduces():
    """Box on floor: 4 contacts; none/mindist/maxforce/netforce + site filter."""
    mj_model, want, got = _stepped_pair(BOX_RIG, [0.8, 0, 0, 0, 0, 0], 60)
    slices = _sensor_slices(mj_model)

    # reduce=none slots may come in different contact order: compare as
    # multisets sorted by pos (fields per slot: found 1, force 3, dist 1,
    # pos 3, normal 3 = 11)
    w = want[slices["all4"]].reshape(6, 11)
    g = got[slices["all4"]].reshape(6, 11)
    assert w[0, 0] == 4 and g[0, 0] == 4
    worder = np.lexsort((np.round(w[:, 6], 3), np.round(w[:, 5], 3)))
    gorder = np.lexsort((np.round(g[:, 6], 3), np.round(g[:, 5], 3)))
    np.testing.assert_allclose(g[gorder], w[worder], rtol=5e-3, atol=5e-3)

    np.testing.assert_allclose(got[slices["net"]], want[slices["net"]], rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(got[slices["deepest"]], want[slices["deepest"]], rtol=5e-3, atol=1e-4)
    # maxforce: ties between the two leading corners are broken arbitrarily —
    # compare force and |pos| projections loosely
    np.testing.assert_allclose(
        got[slices["strongest"]][:3], want[slices["strongest"]][:3], rtol=2e-2, atol=5e-3
    )
    np.testing.assert_allclose(got[slices["zoned"]], want[slices["zoned"]], atol=0)


def test_contact_sensor_subtree_and_sides():
    mj_model, want, got = _stepped_pair(SUBTREE_RIG, [0, 0, 0, 0, 0, 0, 0], 5)
    slices = _sensor_slices(mj_model)
    assert want[slices["sub"]][0] == 2  # both spheres touch the floor
    for name in ("sub", "childonly", "sub2"):
        w = want[slices[name]]
        g = got[slices[name]]
        dim = {"sub": 7, "childonly": 7, "sub2": 4}[name]
        wr = w.reshape(-1, dim)
        gr = g.reshape(-1, dim)
        worder = np.lexsort((wr[:, 1],))
        gorder = np.lexsort((gr[:, 1],))
        np.testing.assert_allclose(gr[gorder], wr[worder], rtol=5e-3, atol=5e-3, err_msg=name)
