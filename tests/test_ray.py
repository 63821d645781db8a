"""Ray casting + rangefinder sensor parity vs the MuJoCo C oracle.

engine/ray.py implements mju_rayGeom closed forms per geom type (plane bounds,
sphere/capsule/cylinder/ellipsoid quadratics, box slabs, convex-hull
face-plane intervals) and the scene-level mj_ray with body exclusion; the
rangefinder sensor casts along its site's +z axis and reads -1 on a miss.
"""

import os
import tempfile

import mujoco
import numpy as np

import pytest

import jax

from ambersim_tpu.engine import forward, make_data, smooth
from ambersim_tpu.engine.ray import ray
from ambersim_tpu.engine.setconst import set_constants
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf, parse_mjcf_string


def _pos_only(model, d):
    """Geom/site poses only: ray queries don't need dynamics, and compiling
    the full forward (collision+constraints+solver) dominates test time."""
    return smooth.kinematics(model, d)


def _pos_and_sensors(model, d):
    """Kinematics + the sensor pass: enough for rangefinder sensordata
    without compiling collision/constraints/solver."""
    from ambersim_tpu.engine import sensor

    return sensor.sensors(model, smooth.kinematics(model, d))

RAY_RIG = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 0.1"/>
    <body pos="0 0 1">
      <joint name="jy" axis="0 1 0" damping="0.1"/>
      <geom name="host" type="box" size="0.1 0.1 0.1"/>
      <site name="rf_down" pos="0 0 -0.15" zaxis="0 0 -1"/>
      <site name="rf_tilt" pos="0.15 0 0" zaxis="1 0 -0.5"/>
      <site name="rf_up" pos="0 0 0.15" zaxis="0 0 1"/>
    </body>
    <body pos="1.2 0 1"><joint axis="0 1 0"/><geom name="ball" type="sphere" size="0.15"/></body>
    <body pos="0 1.2 1"><joint axis="1 0 0"/><geom name="cap" type="capsule" size="0.08 0.2" euler="90 0 0"/></body>
    <body pos="-1.2 0 1"><joint axis="0 1 0"/><geom name="cyl" type="cylinder" size="0.12 0.15"/></body>
    <body pos="0 -1.2 1"><joint axis="1 0 0"/><geom name="ell" type="ellipsoid" size="0.1 0.15 0.2"/></body>
    <body pos="1.2 1.2 1"><joint axis="0 1 0"/><geom name="bx" type="box" size="0.1 0.12 0.14" euler="10 20 30"/></body>
  </worldbody>
  <sensor>
    <rangefinder name="down" site="rf_down"/>
    <rangefinder name="tilt" site="rf_tilt"/>
    <rangefinder name="up" site="rf_up"/>
  </sensor>
</mujoco>
"""

# a convex octahedron mesh for the hull ray path
OCTA_OBJ = """
v 0.2 0 0
v -0.2 0 0
v 0 0.25 0
v 0 -0.25 0
v 0 0 0.3
v 0 0 -0.3
f 1 3 5
f 3 2 5
f 2 4 5
f 4 1 5
f 3 1 6
f 2 3 6
f 4 2 6
f 1 4 6
"""

MESH_RIG = """
<mujoco>
  <asset><mesh name="octa" file="octa.obj"/></asset>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 0.1"/>
    <body pos="0 0 0.8"><joint axis="0 1 0"/><geom name="m" type="mesh" mesh="octa"/></body>
  </worldbody>
</mujoco>
"""


def _load_pair_str(xml):
    mj_model = mujoco.MjModel.from_xml_string(xml)
    model = set_constants(compile_spec(parse_mjcf_string(xml)))
    return mj_model, model


@pytest.mark.slow
def test_rangefinder_parity():
    """All three rangefinders (hit floor / hit objects / miss) across poses."""
    mj_model, model = _load_pair_str(RAY_RIG)
    mj_data = mujoco.MjData(mj_model)
    fwd = jax.jit(forward)
    rng = np.random.default_rng(6)
    for _ in range(6):
        qpos = rng.uniform(-1.2, 1.2, mj_model.nq)
        mj_data.qpos[:] = qpos
        mujoco.mj_forward(mj_model, mj_data)
        d = make_data(model).replace(qpos=qpos.astype(np.float32))
        d = fwd(model, d)
        np.testing.assert_allclose(d.sensordata, mj_data.sensordata, atol=1e-5)


def test_ray_all_geom_types():
    """Standalone ray() vs mj_ray over random rays hitting every geom type."""
    mj_model, model = _load_pair_str(RAY_RIG)
    mj_data = mujoco.MjData(mj_model)
    mujoco.mj_forward(mj_model, mj_data)
    d = jax.jit(_pos_only)(model, make_data(model))
    rng = np.random.default_rng(7)
    ray_j = jax.jit(lambda p, v: ray(model, d, p, v))
    hits = 0
    for _ in range(40):
        pnt = rng.uniform(-2, 2, 3)
        pnt[2] = rng.uniform(0.2, 2)
        v = rng.standard_normal(3)
        v /= np.linalg.norm(v)
        geomid = np.zeros(1, np.int32)
        t_mj = mujoco.mj_ray(mj_model, mj_data, pnt, v, None, 1, -1, geomid)
        t_us, g_us = ray_j(pnt.astype(np.float32), v.astype(np.float32))
        if t_mj < 0:
            assert float(t_us) < 0
        else:
            assert abs(t_mj - float(t_us)) < 1e-4, (t_mj, float(t_us))
            assert int(g_us) == int(geomid[0])
            hits += 1
    assert hits >= 15


def test_ray_mesh_hull():
    """Ray vs convex mesh: hull face-plane intervals match mj_ray on the
    triangle mesh (identical for convex inputs)."""
    with tempfile.TemporaryDirectory() as tmp:
        with open(os.path.join(tmp, "octa.obj"), "w") as f:
            f.write(OCTA_OBJ)
        xml_path = os.path.join(tmp, "scene.xml")
        with open(xml_path, "w") as f:
            f.write(MESH_RIG)
        mj_model = mujoco.MjModel.from_xml_path(xml_path)
        model = set_constants(compile_spec(parse_mjcf(xml_path)))
    mj_data = mujoco.MjData(mj_model)
    mujoco.mj_forward(mj_model, mj_data)
    d = jax.jit(_pos_only)(model, make_data(model))
    rng = np.random.default_rng(8)
    hits = 0
    for _ in range(30):
        # rays aimed at the octahedron's neighborhood from random directions
        target = np.array([0.0, 0.0, 0.8]) + 0.1 * rng.standard_normal(3)
        origin = target + rng.uniform(0.8, 1.6) * _unit(rng)
        v = target - origin
        v /= np.linalg.norm(v)
        geomid = np.zeros(1, np.int32)
        t_mj = mujoco.mj_ray(mj_model, mj_data, origin, v, None, 1, -1, geomid)
        t_us, g_us = ray(model, d, origin.astype(np.float32), v.astype(np.float32))
        if t_mj < 0:
            assert float(t_us) < 0
        else:
            assert abs(t_mj - float(t_us)) < 1e-4
            hits += 1
    assert hits >= 10


def _unit(rng):
    v = rng.standard_normal(3)
    if v[2] < 0:
        v[2] = -v[2]  # stay above the floor plane
    return v / np.linalg.norm(v)


HFIELD_RAY_RIG = """
<mujoco>
  <asset><hfield name="t" nrow="9" ncol="9" size="1 1 0.3 0.1"/></asset>
  <worldbody>
    <geom name="hf" type="hfield" hfield="t"/>
    <body pos="0 0 0.6"><freejoint/><geom type="sphere" size="0.05"/>
      <site name="rf" pos="0 0 -0.06" zaxis="0 0 -1"/></body>
  </worldbody>
  <sensor><rangefinder name="down" site="rf"/></sensor>
</mujoco>
"""


def test_rangefinder_over_terrain():
    """Downward rangefinder over a wavy hfield (ray vs grid triangles)."""
    mj_model = mujoco.MjModel.from_xml_string(HFIELD_RAY_RIG)
    data = (0.5 + 0.5 * np.sin(np.linspace(0, 6, 81))).astype(np.float32)
    mj_model.hfield_data[:] = data
    model = set_constants(compile_spec(parse_mjcf_string(HFIELD_RAY_RIG)))
    model = model.replace(hfield_data=data.reshape(1, 9, 9))
    mj_data = mujoco.MjData(mj_model)
    fwd = jax.jit(_pos_and_sensors)
    rng = np.random.default_rng(11)
    for _ in range(6):
        qpos = mj_model.qpos0.copy()
        qpos[:3] = [rng.uniform(-0.7, 0.7), rng.uniform(-0.7, 0.7), rng.uniform(0.3, 0.8)]
        mj_data.qpos[:] = qpos
        mujoco.mj_forward(mj_model, mj_data)
        d = make_data(model).replace(qpos=qpos.astype(np.float32))
        d = fwd(model, d)
        np.testing.assert_allclose(d.sensordata, mj_data.sensordata, atol=1e-5)
