"""Cylinder/ellipsoid collision via synthesized hulls vs the MuJoCo C oracle.

Pairs with no analytic narrowphase (cylinder/ellipsoid vs sphere, capsule,
box, mesh, and each other) dispatch through the SAT convex pipeline using
compile-synthesized hulls (20-gon prisms, 74-vert UV ellipsoids) — the role
MJX fills with mesh approximations. Geom type, inertia, rbound, and ray
casting stay analytic; only collision dispatch remaps (mjcf/compiler.py
_pair_types). Resting states match the analytic oracle to ~1 mm.
"""

import mujoco
import numpy as np
import pytest

import jax

from ambersim_tpu.engine import make_data, step
from ambersim_tpu.engine.setconst import set_constants
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

STACK_RIG = """
<mujoco><option timestep="0.002"/><worldbody>
  <geom name="floor" type="plane" size="4 4 0.1"/>
  <body pos="0 0 0.5"><freejoint/><geom name="cyl" type="cylinder" size="0.1 0.15"/></body>
  <body pos="1 0 0.1"><freejoint/><geom name="bx" type="box" size="0.15 0.15 0.1"/></body>
  <body pos="1 0 0.5"><freejoint/><geom name="cyl2" type="cylinder" size="0.08 0.1"/></body>
  <body pos="2 0 0.3"><freejoint/><geom name="ell" type="ellipsoid" size="0.15 0.1 0.08"/></body>
</worldbody></mujoco>
"""


def _load_pair(xml):
    mj_model = mujoco.MjModel.from_xml_string(xml)
    model = set_constants(compile_spec(parse_mjcf_string(xml)))
    return mj_model, model


def test_pair_matrix_has_no_drops():
    """No 'geoms will not collide' warnings: every pair routes somewhere."""
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _load_pair(STACK_RIG)
    assert not [x for x in w if "will not collide" in str(x.message)]


@pytest.mark.slow
def test_cylinder_ellipsoid_settle_parity():
    """Upright cylinder on floor, cylinder stacked on a box, ellipsoid on
    floor: resting heights match the analytic oracle to ~1 mm."""
    mj_model, model = _load_pair(STACK_RIG)
    mj_data = mujoco.MjData(mj_model)
    d = make_data(model)
    stp = jax.jit(step)
    for _ in range(1500):
        mujoco.mj_step(mj_model, mj_data)
        d = stp(model, d)
    ours = np.asarray(d.qpos).reshape(4, 7)
    mjq = mj_data.qpos.reshape(4, 7)
    np.testing.assert_allclose(ours[:, 2], mjq[:, 2], atol=2e-3)  # heights
    np.testing.assert_allclose(ours[:, :2], mjq[:, :2], atol=5e-3)  # stay put
    assert abs(ours[2, 2] - 0.3) < 2e-3  # cyl2 is ON the box, not through it
