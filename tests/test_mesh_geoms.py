"""Convex mesh geom support: compile parity (re-centering, principal frame,
exact hull inertia) and plane-mesh contact dynamics vs the MuJoCo C engine."""

import os

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ambersim_tpu.engine import make_data, step
from ambersim_tpu.mjcf.mesh import convex_hull, hull_mass_properties, save_obj
from ambersim_tpu.utils.io_utils import load_model_from_file

ROCK_VERTS = np.array(
    [[0.0, 0, 0], [0.12, 0, 0], [0, 0.1, 0], [0, 0, 0.14], [0.1, 0.1, 0.02]]
)


@pytest.fixture
def mesh_scene(tmp_path):
    hv, hf = convex_hull(ROCK_VERTS)
    save_obj(os.path.join(tmp_path, "rock.obj"), hv, hf)
    xml = f"""
<mujoco><option timestep="0.002"/><compiler meshdir="{tmp_path}"/>
<asset><mesh name="rock" file="rock.obj"/></asset>
<worldbody><geom name="floor" type="plane" size="0 0 1"/>
<body pos="0 0 0.3" euler="0.5 0.3 0.1"><freejoint/>
<geom type="mesh" mesh="rock" density="800"/></body></worldbody></mujoco>"""
    path = os.path.join(tmp_path, "scene.xml")
    with open(path, "w") as f:
        f.write(xml)
    return path


def test_mesh_compile_parity(mesh_scene):
    mj_model = mujoco.MjModel.from_xml_path(mesh_scene)
    model = load_model_from_file(mesh_scene)
    assert model.skel.nmesh == 1
    np.testing.assert_allclose(model.geom_pos[1], mj_model.geom_pos[1], atol=1e-6)
    np.testing.assert_allclose(model.body_mass[1], mj_model.body_mass[1], rtol=1e-5)
    np.testing.assert_allclose(model.body_inertia[1], mj_model.body_inertia[1], rtol=1e-4)
    np.testing.assert_allclose(model.body_ipos[1], mj_model.body_ipos[1], atol=1e-6)


def test_mesh_drop_parity(mesh_scene):
    mj_model = mujoco.MjModel.from_xml_path(mesh_scene)
    mj_data = mujoco.MjData(mj_model)
    model = load_model_from_file(mesh_scene)
    d = make_data(model)
    stp = jax.jit(step)
    for _ in range(400):
        mujoco.mj_step(mj_model, mj_data)
    for _ in range(400):
        d = stp(model, d)
    np.testing.assert_allclose(d.qpos, mj_data.qpos, atol=2e-2)
    assert float(d.qpos[2]) < 0.1  # settled on the floor


def test_hull_mass_properties_tetra():
    verts = np.array([[1.0, 1, 1], [2, 1, 1], [1, 2, 1], [1, 1, 2.5]])
    hv, hf = convex_hull(verts)
    vol, com, imat = hull_mass_properties(hv, hf)
    np.testing.assert_allclose(vol, 0.25, rtol=1e-9)
    np.testing.assert_allclose(com, [1.25, 1.25, 1.375], rtol=1e-9)
    w = np.sort(np.linalg.eigvalsh(imat * 1000))[::-1]
    np.testing.assert_allclose(w, [36.1232, 27.3438, 16.2205], rtol=1e-4)


@pytest.mark.slow
def test_mesh_pair_matrix(tmp_path):
    """sphere/capsule/box/mesh vs mesh narrowphase: a mixed pile tracks the C
    engine through its first impacts (0.2 s; later multi-impact chains are
    chaotic between any two solvers)."""
    hv, hf = convex_hull(
        np.array([[0.0, 0, 0], [0.12, 0, 0], [0, 0.1, 0], [0, 0, 0.14], [0.1, 0.1, 0.02], [0.06, 0.05, 0.1]])
    )
    save_obj(os.path.join(tmp_path, "rock.obj"), hv, hf)
    xml = f"""
<mujoco><option timestep="0.002"/><compiler meshdir="{tmp_path}"/>
<asset><mesh name="rock" file="rock.obj"/></asset>
<worldbody><geom name="floor" type="plane" size="0 0 1"/>
<body pos="0 0 0.1" euler="0.5 0.3 0.1"><freejoint/><geom type="mesh" mesh="rock" density="800"/></body>
<body pos="0.02 0.01 0.35" euler="1.5 0.2 0"><freejoint/><geom type="mesh" mesh="rock" density="600"/></body>
<body pos="-0.02 0.02 0.55"><freejoint/><geom type="sphere" size="0.04" density="700"/></body>
<body pos="0.03 -0.02 0.75" euler="0.9 0 0.4"><freejoint/><geom type="box" size="0.05 0.04 0.03" density="650"/></body>
<body pos="-0.03 -0.01 0.95" euler="0.3 1.1 0"><freejoint/><geom type="capsule" size="0.025 0.06" density="700"/></body>
</worldbody></mujoco>"""
    path = os.path.join(tmp_path, "pile.xml")
    with open(path, "w") as f:
        f.write(xml)
    mj_model = mujoco.MjModel.from_xml_path(path)
    mj_data = mujoco.MjData(mj_model)
    model = load_model_from_file(path)
    # the full pair-type matrix is present
    tpairs = set(
        (int(model.skel.geom_type[a]), int(model.skel.geom_type[b]))
        for a, b in zip(model.skel.pair_geom1, model.skel.pair_geom2)
    )
    assert (7, 7) in tpairs and (2, 7) in tpairs and (3, 7) in tpairs and (6, 7) in tpairs

    d = make_data(model)
    stp = jax.jit(step)
    for _ in range(100):
        mujoco.mj_step(mj_model, mj_data)
    for _ in range(100):
        d = stp(model, d)
    pos_idx = np.concatenate([np.arange(7 * i, 7 * i + 3) for i in range(5)])
    np.testing.assert_allclose(
        np.asarray(d.qpos)[pos_idx], mj_data.qpos[pos_idx], atol=5e-3, err_msg="mesh pile positions"
    )
