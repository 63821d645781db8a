"""Broadphase pruning (VERDICT r1 item 5 / SURVEY.md §7 step 5).

Type-pair groups over the compile-time cap get `cap` contact slots filled at
runtime with the cap most-overlapping pairs (bounding-sphere top-k in
engine/collision.py). These tests pin:
  * slot layout: capped groups shrink ncon/nefc; static groups unchanged
  * selection: the actually-colliding pairs land in slots with correct geoms
  * physics: capped == exact when true contact count < cap
  * scaling: contact capacity is constant in object count (the compile-time
    guarantee behind sublinear step cost; wall-clock is benched on TPU)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ambersim_tpu.engine import make_data
from ambersim_tpu.engine.forward import step
from ambersim_tpu.engine.setconst import set_constants
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string


def _sphere_grid_xml(n, spacing=0.16, radius=0.05, z0=0.2):
    rng = np.random.default_rng(3)
    side = int(np.ceil(np.sqrt(n)))
    bodies = []
    for i in range(n):
        x = (i % side - side / 2) * spacing + rng.uniform(-0.01, 0.01)
        y = (i // side - side / 2) * spacing + rng.uniform(-0.01, 0.01)
        z = z0 + rng.uniform(0, 0.02)
        bodies.append(
            f'<body name="b{i}" pos="{x:.3f} {y:.3f} {z:.3f}"><freejoint/>'
            f'<geom name="g{i}" type="sphere" size="{radius}" density="800"/></body>'
        )
    return (
        '<mujoco><option timestep="0.002" iterations="4" ls_iterations="6"/>'
        '<compiler angle="radian"/><worldbody><geom name="floor" type="plane" size="0 0 1"/>'
        + "".join(bodies)
        + "</worldbody></mujoco>"
    )


def _compile(xml, cap):
    return set_constants(compile_spec(parse_mjcf_string(xml), broadphase_cap=cap))


@pytest.mark.slow
def test_capped_layout_shrinks_capacity():
    xml = _sphere_grid_xml(12)
    m0 = _compile(xml, 0)
    m1 = _compile(xml, 20)
    # plane-sphere: 12 pairs <= 20 -> static; sphere-sphere: 66 -> 20 slots
    assert m1.skel.ncon < m0.skel.ncon
    assert m1.skel.nefc < m0.skel.nefc
    assert len(m1.skel.bpg_adr) == 1
    assert (np.asarray(m1.skel.bpg_nsel) == 20).all()
    # every pair of a dynamic group has con_adr == -1, others >= 0
    con_adr = np.asarray(m1.skel.con_adr)
    assert (con_adr == -1).any() and (con_adr >= 0).any()


def test_cap_larger_than_groups_is_identity():
    xml = _sphere_grid_xml(4)
    m0 = _compile(xml, 0)
    m1 = _compile(xml, 1000)
    assert m0.skel.ncon == m1.skel.ncon
    assert m0.skel.nefc == m1.skel.nefc
    np.testing.assert_array_equal(np.asarray(m0.skel.con_adr), np.asarray(m1.skel.con_adr))


@pytest.mark.slow
def test_capacity_constant_in_object_count():
    """The compile-time guarantee behind sublinear stepping: dynamic-group
    slot count is cap, not O(n^2)."""
    caps = []
    for n in (8, 16, 24):
        m = _compile(_sphere_grid_xml(n), 6)
        s = m.skel
        # sphere-sphere slots = cap regardless of n (pairs = n(n-1)/2)
        dyn = [(int(t1), int(t2)) for t1, t2 in zip(s.bpg_type1, s.bpg_type2)]
        assert (2, 2) in dyn  # sphere-sphere capped
        caps.append(int(s.bpg_nsel[dyn.index((2, 2))]))
    assert caps == [6, 6, 6]


@pytest.mark.slow
def test_topk_selects_colliding_pairs():
    """10 spheres far apart except two overlapping: with cap=2, the
    overlapping pair occupies a slot with the right geom ids and negative
    distance."""
    bodies = []
    for i in range(10):
        # spread along x, 1 m apart; spheres 8 and 9 overlap each other
        x = 8.0 + (i - 8) * 0.06 if i >= 8 else float(i)
        bodies.append(
            f'<body name="b{i}" pos="{x} 0 5.0"><freejoint/>'
            f'<geom name="g{i}" type="sphere" size="0.05"/></body>'
        )
    xml = (
        '<mujoco><compiler angle="radian"/><worldbody>'
        + "".join(bodies)
        + "</worldbody></mujoco>"
    )
    m = _compile(xml, 2)
    s = m.skel
    d = make_data(m)
    # FK + collision + constraint assembly (no dynamics)
    from ambersim_tpu.engine.forward import fwd_position

    d = jax.jit(lambda dd: fwd_position(m, dd))(d)
    dyn = [(int(t1), int(t2)) for t1, t2 in zip(s.bpg_type1, s.bpg_type2)]
    adr = int(s.bpg_adr[dyn.index((2, 2))])
    nsel = int(s.bpg_nsel[dyn.index((2, 2))])
    g1 = np.asarray(d.contact.geom1[adr : adr + nsel])
    g2 = np.asarray(d.contact.geom2[adr : adr + nsel])
    dist = np.asarray(d.contact.dist[adr : adr + nsel])
    touching = {(int(a), int(b)) for a, b, dd_ in zip(g1, g2, dist) if dd_ < 0}
    assert touching == {(8, 9)}


@pytest.mark.slow
def test_capped_rollout_matches_exact():
    """When the true simultaneous-contact count stays under the cap, capped
    and exact all-pairs rollouts agree (slot assignment is the only thing
    that differs)."""
    xml = _sphere_grid_xml(8, spacing=0.14, z0=0.12)
    m0 = _compile(xml, 0)
    m1 = _compile(xml, 16)  # sphere-sphere pairs: 28 -> 16 slots
    assert m1.skel.ncon < m0.skel.ncon

    def roll(m, n=120):
        d = make_data(m)
        f = jax.jit(lambda dd: step(m, dd))
        for _ in range(n):
            d = f(d)
        return np.asarray(d.qpos)

    q0 = roll(m0)
    q1 = roll(m1)
    np.testing.assert_allclose(q0, q1, atol=1e-3)
    # sane settle: spheres on the floor
    assert (q1[2::7] > 0.03).all() and (q1[2::7] < 0.2).all()
