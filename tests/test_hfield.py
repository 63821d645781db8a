"""Height-field collision vs the MuJoCo C oracle.

Our hfield narrowphase collides spheres/capsules against the triangle surface
of a static KxK grid window (top-k deepest contacts, static shapes); MuJoCo
uses per-cell prism GJK. Shallow contact depths agree to float precision;
deep-burial recovery intentionally pushes along the surface normal. Reference
exposure: terrain locomotion rides the reference's mjx pipeline
(ambersim/rl/base.py:93).
"""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ambersim_tpu.engine import forward, make_data, step
from ambersim_tpu.engine.setconst import set_constants
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

HFIELD_BALL = """
<mujoco>
  <option timestep="0.002"/>
  <asset><hfield name="terrain" nrow="9" ncol="9" size="1 1 0.3 0.1"/></asset>
  <worldbody>
    <geom name="hf" type="hfield" hfield="terrain"/>
    <body name="ball" pos="0 0 0.5"><freejoint/>
      <geom name="s" type="sphere" size="0.08"/></body>
  </worldbody>
</mujoco>
"""

HFIELD_CAPSULE = """
<mujoco>
  <option timestep="0.002"/>
  <asset><hfield name="terrain" nrow="9" ncol="9" size="1 1 0.3 0.1"/></asset>
  <worldbody>
    <geom name="hf" type="hfield" hfield="terrain"/>
    <body name="cap" pos="0 0 0.5"><freejoint/>
      <geom name="c" type="capsule" size="0.05 0.15"/></body>
  </worldbody>
</mujoco>
"""


def _load_pair(xml, data):
    mj_model = mujoco.MjModel.from_xml_string(xml)
    mj_model.hfield_data[:] = data.ravel()
    model = set_constants(compile_spec(parse_mjcf_string(xml)))
    model = model.replace(hfield_data=data.reshape(1, 9, 9).astype(np.float32))
    return mj_model, model


def _wavy():
    return (0.5 + 0.5 * np.sin(np.linspace(0, 6, 81))).reshape(9, 9)


def _bowl():
    gx, gy = np.meshgrid(np.linspace(-1, 1, 9), np.linspace(-1, 1, 9))
    return (gx**2 + gy**2) / 2.0


def test_hfield_sphere_depth_parity():
    """Deepest contact distance matches the oracle for shallow penetrations."""
    mj_model, model = _load_pair(HFIELD_BALL, _wavy())
    mj_data = mujoco.MjData(mj_model)
    fwd = jax.jit(forward)
    rng = np.random.default_rng(4)
    checked = 0
    for _ in range(8):
        x, y = rng.uniform(-0.5, 0.5, 2)
        z = rng.uniform(0.15, 0.3)
        mj_data.qpos[:] = 0
        mj_data.qpos[:3] = (x, y, z)
        mj_data.qpos[3] = 1
        mujoco.mj_forward(mj_model, mj_data)
        d = make_data(model)
        d = d.replace(qpos=d.qpos.at[:3].set(jnp.array([x, y, z], jnp.float32)))
        d = fwd(model, d)
        mj_depths = sorted(mj_data.contact.dist[: mj_data.ncon])
        our_min = float(np.asarray(d.contact.dist).min())
        if mj_data.ncon and mj_depths[0] > -0.05:  # shallow regime
            assert abs(our_min - mj_depths[0]) < 1e-4, (mj_depths[0], our_min)
            checked += 1
        elif mj_data.ncon == 0:
            assert our_min > -1e-4
    assert checked >= 2  # the sweep must actually hit the surface


@pytest.mark.slow
def test_flat_hfield_matches_plane():
    """A flat hfield behaves like a plane: bounce rollout parity vs a plane
    model through the full contact pipeline."""
    flat = np.full((9, 9), 0.0)
    mj_model, model = _load_pair(HFIELD_BALL, flat)
    PLANE = HFIELD_BALL.replace(
        '<geom name="hf" type="hfield" hfield="terrain"/>',
        '<geom name="hf" type="plane" size="1 1 0.1"/>',
    ).replace('<asset><hfield name="terrain" nrow="9" ncol="9" size="1 1 0.3 0.1"/></asset>', "")
    plane_model = set_constants(compile_spec(parse_mjcf_string(PLANE)))
    d_h = make_data(model)
    d_p = make_data(plane_model)
    z0 = jnp.array([0.0, 0.0, 0.3], jnp.float32)
    d_h = d_h.replace(qpos=d_h.qpos.at[:3].set(z0))
    d_p = d_p.replace(qpos=d_p.qpos.at[:3].set(z0))
    stp_h = jax.jit(lambda d: step(model, d))
    stp_p = jax.jit(lambda d: step(plane_model, d))
    for _ in range(600):
        d_h = stp_h(d_h)
        d_p = stp_p(d_p)
    # 4 hfield contact slots vs the plane's single row make the contact
    # slightly stiffer; the resting state agrees to a fraction of a millimeter
    np.testing.assert_allclose(d_h.qpos, d_p.qpos, atol=5e-4)
    assert 0.079 < float(d_h.qpos[2]) < 0.082  # resting on the surface


@pytest.mark.slow
def test_hfield_bowl_settle_parity():
    """Ball released on a bowl terrain settles where the oracle settles."""
    mj_model, model = _load_pair(HFIELD_BALL, _bowl())
    mj_data = mujoco.MjData(mj_model)
    mj_data.qpos[:3] = (0.3, 0.2, 0.45)
    d = make_data(model)
    d = d.replace(qpos=d.qpos.at[:3].set(jnp.array([0.3, 0.2, 0.45], jnp.float32)))
    stp = jax.jit(step)
    for _ in range(2000):
        mujoco.mj_step(mj_model, mj_data)
        d = stp(model, d)
    np.testing.assert_allclose(np.asarray(d.qpos)[:3], mj_data.qpos[:3], atol=0.02)


@pytest.mark.slow
def test_hfield_capsule_settle():
    """Capsule dropped on wavy terrain comes to rest on the surface (3-sphere
    approximation of the capsule; behavioral check, not exact oracle parity)."""
    mj_model, model = _load_pair(HFIELD_CAPSULE, _wavy())
    mj_data = mujoco.MjData(mj_model)
    mj_data.qpos[:3] = (0.0, 0.0, 0.45)
    d = make_data(model)
    d = d.replace(qpos=d.qpos.at[:3].set(jnp.array([0.0, 0.0, 0.45], jnp.float32)))
    stp = jax.jit(step)
    for _ in range(2000):
        mujoco.mj_step(mj_model, mj_data)
        d = stp(model, d)
    # both engines at rest with the capsule lying on the terrain; allow a few
    # cm of positional divergence (contact sets differ during the tumble)
    assert abs(float(d.qvel[2])) < 0.05
    assert abs(float(d.qpos[2]) - mj_data.qpos[2]) < 0.08
