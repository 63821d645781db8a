"""Large-nv clutter rung levers (VERDICT r2 #5): the max_contact_points cap
keeps physics close to the exact all-rows solve on the 32-body clutter scene
while cutting the efc row count ~3x (the measured-throughput rung lives in
benchmarks/ladder.py; this pins correctness)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ambersim_tpu.engine import make_data, step
from ambersim_tpu.engine.setconst import set_constants
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..",
    "ambersim_tpu",
    "models",
    "objects",
    "clutter32.xml",
)


def _build(cap):
    xml = open(PATH).read()
    if cap:
        xml = xml.replace(
            "</mujoco>",
            f'<custom><numeric name="max_contact_points" data="{cap}"/></custom></mujoco>',
        )
    return set_constants(
        compile_spec(parse_mjcf_string(xml, base_dir=os.path.dirname(PATH)), broadphase_cap=48)
    )


@pytest.mark.slow
def test_contact_cap_tracks_exact_solve_on_clutter():
    m_full = _build(0)
    m_cap = _build(192)
    assert m_cap.skel.nefc < m_full.skel.nefc // 2

    nsteps = 60
    d_full = make_data(m_full)
    d_cap = make_data(m_cap)
    stp_full = jax.jit(lambda d: step(m_full, d))
    stp_cap = jax.jit(lambda d: step(m_cap, d))
    for _ in range(nsteps):
        d_full = stp_full(d_full)
        d_cap = stp_cap(d_cap)

    q_full = np.asarray(d_full.qpos)
    q_cap = np.asarray(d_cap.qpos)
    # free-body positions: every object's trajectory stays close through the
    # drop (the cap only drops the shallowest candidate contacts)
    pos_full = q_full.reshape(32, 7)[:, :3]
    pos_cap = q_cap.reshape(32, 7)[:, :3]
    err = np.abs(pos_full - pos_cap).max()
    assert err < 2e-2, err
    assert np.isfinite(q_cap).all()
