"""Global contact cap: <custom><numeric name="max_contact_points" data="K"/>.

The collision driver still evaluates every candidate pair, then a lax.top_k
by penetration-past-margin compacts the candidate slots to K before
constraint assembly (engine/collision.py), so the efc row count — and the
Newton-kernel cost, linear in rows — scales with K rather than with the
candidate count. This is the MJX/Brax custom-numeric knob (reference
ecosystem convention; cf. ambersim's MJX dependency role at
/root/reference/ambersim/utils/io_utils.py:222-241).

Pinned here:
  * layout: capped ncon/nefc shrink; candidate capacity (ncand) unchanged
  * exactness: when <= K contacts are active the capped trajectory matches
    the uncapped one (row order differs; the solve is order-invariant up to
    fp summation)
  * overflow: the K deepest contacts win, simulation stays finite
  * safety: mixed-condim models warn and ignore the cap
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ambersim_tpu import ROOT
from ambersim_tpu.engine import make_data
from ambersim_tpu.engine.forward import step
from ambersim_tpu.engine.setconst import set_constants
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string


def _compile(xml):
    return set_constants(compile_spec(parse_mjcf_string(xml)))


def _with_cap(xml: str, cap: int) -> str:
    block = f'<custom><numeric name="max_contact_points" data="{cap}"/></custom>'
    return xml.replace("</mujoco>", block + "</mujoco>")


def _quadruped_xml() -> str:
    with open(os.path.join(ROOT, "models/quadruped/quadruped.xml")) as f:
        xml = f.read()
    # strip any cap already baked into the packaged model: these tests
    # construct capped/uncapped variants themselves (the packaged model may
    # mention max_contact_points in a comment without carrying a <custom> cap)
    if "<custom>" in xml and "max_contact_points" in xml:
        start = xml.index("<custom>")
        end = xml.index("</custom>") + len("</custom>")
        xml = xml[:start] + xml[end:]
    return xml


def _rollout(m, nsteps, kp=60.0, kd=2.0):
    d = make_data(m)
    nu = m.nu

    def body(d, _):
        ctrl = kp * (jnp.zeros(nu) - d.qpos[7:]) - kd * d.qvel[6:]
        d = step(m, d.replace(ctrl=ctrl))
        return d, None

    d, _ = jax.lax.scan(body, d, None, length=nsteps)
    return d


@pytest.mark.slow
def test_capped_layout():
    xml = _quadruped_xml()
    m0 = _compile(xml)
    m1 = _compile(_with_cap(xml, 16))
    assert m0.skel.ncand == m0.skel.ncon  # uncapped: no compaction
    assert m1.skel.ncand == m0.skel.ncand  # candidates unchanged
    assert m1.skel.ncon == 16
    # quadruped rows: 12 frictionloss + 12 limits + 4 rows per contact
    assert m1.skel.nefc == 24 + 4 * 16
    assert m1.skel.nefc < m0.skel.nefc
    assert len(m1.skel.con_dim) == 16 and len(m1.skel.con_efcadr) == 16


@pytest.mark.slow
def test_capped_matches_uncapped_when_under_cap():
    # standing quadruped: 4 foot contacts active, far under the cap of 16
    xml = _quadruped_xml()
    m0 = _compile(xml)
    m1 = _compile(_with_cap(xml, 16))
    d0 = jax.jit(lambda: _rollout(m0, 100))()
    d1 = jax.jit(lambda: _rollout(m1, 100))()
    assert bool(jnp.isfinite(d1.qpos).all())
    # row order differs between the layouts, so summation order inside the
    # solver differs: exact semantics, fp-level drift only
    np.testing.assert_allclose(np.asarray(d0.qpos), np.asarray(d1.qpos), atol=2e-3)
    np.testing.assert_allclose(np.asarray(d0.qvel), np.asarray(d1.qvel), atol=2e-2)
    # the active contacts selected are the true ones (feet on the floor)
    active0 = int((d0.contact.dist < d0.contact.includemargin).sum())
    active1 = int((d1.contact.dist < d1.contact.includemargin).sum())
    assert active0 == active1


@pytest.mark.slow
def test_overflow_keeps_deepest():
    # 6 spheres resting on the floor, cap 3: sim must stay finite and the
    # 3 deepest contacts must be the selected slots
    # contype/conaffinity split: spheres collide with the floor only, so the
    # candidate set is exactly the 6 sphere-floor pairs
    bodies = "".join(
        f'<body name="b{i}" pos="{0.3 * i:.2f} 0 {0.049 - 0.001 * i}">'
        f'<freejoint/>'
        f'<geom type="sphere" size="0.05" density="800" contype="1" conaffinity="2"/></body>'
        for i in range(6)
    )
    xml = (
        '<mujoco><option timestep="0.002"/><compiler angle="radian"/>'
        '<worldbody><geom name="floor" type="plane" size="0 0 1" contype="2" conaffinity="1"/>'
        + bodies
        + "</worldbody></mujoco>"
    )
    m = _compile(_with_cap(xml, 3))
    assert m.skel.ncon == 3 and m.skel.ncand == 6
    d = make_data(m)
    d = jax.jit(lambda d: step(m, d))(d)
    assert bool(jnp.isfinite(d.qpos).all())
    # all six penetrate (z < r); the deepest three are the later bodies
    sel_g2 = np.sort(np.asarray(d.contact.geom2))
    assert (d.contact.dist < d.contact.includemargin).all()
    np.testing.assert_array_equal(sel_g2, np.array([4, 5, 6]))  # geom 0 = floor


def test_mixed_condim_warns_and_ignores():
    # pair condim is the max over the two geoms (MuJoCo semantics), so the
    # floor must itself be condim=1 for a genuinely mixed slot set:
    # sphere1-floor -> condim 1, sphere2-floor / sphere1-sphere2 -> condim 3
    xml = (
        '<mujoco><compiler angle="radian"/><worldbody>'
        '<geom name="floor" type="plane" size="0 0 1" condim="1"/>'
        '<body pos="0 0 0.04"><freejoint/>'
        '<geom type="sphere" size="0.05" condim="1"/></body>'
        '<body pos="1 0 0.04"><freejoint/>'
        '<geom type="sphere" size="0.05" condim="3"/></body>'
        "</worldbody></mujoco>"
    )
    with pytest.warns(UserWarning, match="max_contact_points"):
        m = _compile(_with_cap(xml, 1))
    assert m.skel.ncon == m.skel.ncand == 3
