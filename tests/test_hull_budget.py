"""Compile-time hull-vertex budget (maxhullvert) for the SAT narrowphase:
decimation quality, compiler integration, and a dense-mesh (320-vert rock)
drop cross-checked against MuJoCo C. VERDICT r2 #3; the reference role is
the MJX convex pipeline's 64-vert hull cap cited at
ambersim/utils/io_utils.py:230-233."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ambersim_tpu.mjcf.mesh import convex_hull, decimate_hull


def _blob(n=400, seed=3):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v * rng.uniform(0.8, 1.2, size=(n, 1))


def test_decimate_respects_budget_and_volume():
    hv, hf = convex_hull(_blob())
    assert len(hv) > 64
    dv = decimate_hull(hv, 64)
    assert len(dv) <= 64
    # decimated hull is a subset of the true hull's vertices (never grows)
    assert all(any(np.allclose(p, q) for q in hv) for p in dv[:5])
    from scipy.spatial import ConvexHull

    vol_full = ConvexHull(hv).volume
    vol_dec = ConvexHull(dv).volume
    assert vol_dec <= vol_full + 1e-9
    # greedy farthest-outside refinement keeps the budgeted hull tight
    assert vol_dec > 0.93 * vol_full, (vol_dec, vol_full)


def test_decimate_noop_below_budget():
    hv, _ = convex_hull(_blob(n=30))
    out = decimate_hull(hv, 64)
    assert out is hv


def test_compiler_applies_budget_to_dense_mesh():
    from ambersim_tpu.utils.io_utils import load_model_from_file

    model = load_model_from_file("models/rock/rock_scene.xml")
    # rock.obj has a 320-vert hull; the default 64 budget bounds the
    # compiled collision hull (and with it SAT axis/support cost)
    nvert = model.mesh_vert.shape[1] if model.mesh_vert.ndim == 3 else model.mesh_vert.shape[0]
    assert nvert <= 64, nvert


def test_compiler_budget_override():
    import os

    from ambersim_tpu.mjcf import compile_spec
    from ambersim_tpu.mjcf.parser import parse_mjcf_string

    rock_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "ambersim_tpu", "models", "rock"
    )
    xml = f"""
<mujoco><compiler maxhullvert="32" meshdir="{rock_dir}"/>
<asset><mesh name="rock" file="rock.obj"/></asset>
<worldbody><body><freejoint/><geom type="mesh" mesh="rock"/></body></worldbody>
</mujoco>"""
    model = compile_spec(parse_mjcf_string(xml))
    nvert = model.mesh_vert.shape[1] if model.mesh_vert.ndim == 3 else model.mesh_vert.shape[0]
    assert nvert <= 32, nvert


def test_rock_drop_parity_vs_mujoco():
    """The budgeted 64-vert hull still lands and settles like MuJoCo C
    stepping the same scene (which applies its own maxhullvert=64 cap)."""
    mujoco = pytest.importorskip("mujoco")
    from ambersim_tpu.engine import make_data, step
    from ambersim_tpu.utils.io_utils import load_model_from_file

    model = load_model_from_file("models/rock/rock_scene.xml")
    d = make_data(model)
    stp = jax.jit(step)
    nsteps = 450
    for _ in range(nsteps):
        d = stp(model, d)
    qp = np.asarray(d.qpos)

    import os

    xml_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..",
        "ambersim_tpu",
        "models",
        "rock",
        "rock_scene.xml",
    )
    mm = mujoco.MjModel.from_xml_path(xml_path)
    dd = mujoco.MjData(mm)
    for _ in range(nsteps):
        mujoco.mj_step(mm, dd)

    # Both engines support the rock on the floor at a similar rest height.
    # MuJoCo's own maxhullvert=64 decimation yields a rounder hull that keeps
    # slowly rolling past 600 steps (|qvel| ~ 1.4-4 observed), so "MuJoCo
    # settled" is not assertable; our greedy farthest-outside decimation
    # settles crisply — assert that, plus height agreement.
    assert abs(qp[2] - dd.qpos[2]) < 2e-2, (qp[2], dd.qpos[2])
    assert float(jnp.linalg.norm(d.qvel)) < 0.1
