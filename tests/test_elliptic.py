"""Elliptic friction cones (VERDICT r1 item 10) — parity vs MuJoCo C.

Row construction was reverse-engineered from the oracle and is pinned here
exactly (J layout, D scaling with impratio and per-dim mu, friction aref
without position term); the solver's second-order-cone projection is checked
on forces at rest/slide/spin and on full trajectories (the sphere-on-plane
spin test named in the round-1 verdict).
"""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ambersim_tpu.engine import make_data, step
from ambersim_tpu.engine.forward import forward
from ambersim_tpu.engine.setconst import set_constants
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

XML = """
<mujoco><option timestep="0.002" cone="elliptic" impratio="{imp}"
  iterations="30" ls_iterations="30"/>
<compiler angle="radian"/><worldbody>
  <geom name="floor" type="plane" size="0 0 1" friction="{fr}"/>
  <body name="ball" pos="0 0 {z}">
    <freejoint/>
    <geom name="ball_geom" type="sphere" size="0.05" density="800"
          friction="{fr}" condim="{condim}"/>
  </body>
</worldbody></mujoco>
"""


def _pair(fr="0.8 0.1 0.01", condim=3, imp=1.0, z=0.049):
    xml = XML.format(fr=fr, condim=condim, imp=imp, z=z)
    mj_model = mujoco.MjModel.from_xml_string(xml)
    model = set_constants(compile_spec(parse_mjcf_string(xml)))
    return mj_model, model


@pytest.mark.parametrize("condim,imp", [(3, 1.0), (3, 4.0), (4, 1.0), (6, 2.0)])
@pytest.mark.slow
def test_efc_rows_match_oracle(condim, imp):
    mj_model, model = _pair(condim=condim, imp=imp)
    mj_data = mujoco.MjData(mj_model)
    mujoco.mj_forward(mj_model, mj_data)

    d = make_data(model)
    d = jax.jit(lambda dd: forward(model, dd))(d)

    assert model.skel.nefc == mj_data.nefc
    act = np.asarray(d.efc_active)
    assert act.all()
    np.testing.assert_allclose(np.asarray(d.efc_J)[act], mj_data.efc_J.reshape(mj_data.nefc, -1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d.efc_D)[act], mj_data.efc_D, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(d.efc_aref)[act], mj_data.efc_aref, rtol=2e-3, atol=1e-6)


@pytest.mark.parametrize(
    "qvel,condim,desc",
    [
        (np.zeros(6), 3, "rest"),
        ([1.0, 0, 0, 0, 0, 0], 3, "slide"),
        ([0, 0, 0, 0, 0, 5.0], 4, "spin"),
        ([0.3, 0, 0, 2.0, 0, 1.0], 6, "slide+roll+spin"),
    ],
)
def test_cone_forces_match_oracle(qvel, condim, desc):
    mj_model, model = _pair(fr="0.8 0.1 0.01", condim=condim)
    mj_data = mujoco.MjData(mj_model)
    mj_data.qvel[:] = qvel
    mujoco.mj_forward(mj_model, mj_data)

    d = make_data(model).replace(qvel=jnp.asarray(qvel, jnp.float32))
    d = jax.jit(lambda dd: forward(model, dd))(d)
    np.testing.assert_allclose(
        np.asarray(d.qfrc_constraint), mj_data.qfrc_constraint, rtol=5e-3, atol=2e-3
    )


@pytest.mark.slow
def test_sphere_spin_down_trajectory():
    """The verdict's acceptance case: a sphere spinning about the contact
    normal decelerates through torsional friction; trajectory parity."""
    mj_model, model = _pair(fr="0.8 0.2 0.01", condim=4, z=0.0495)
    mj_data = mujoco.MjData(mj_model)
    mj_data.qvel[5] = 6.0
    d = make_data(model).replace(qvel=jnp.zeros(6).at[5].set(6.0))
    stp = jax.jit(step)
    for _ in range(250):
        mujoco.mj_step(mj_model, mj_data)
    for _ in range(250):
        d = stp(model, d)
    # spin has decayed substantially and both engines agree on the rate
    assert abs(mj_data.qvel[5]) < 5.0
    np.testing.assert_allclose(np.asarray(d.qvel)[5], mj_data.qvel[5], atol=0.05)
    np.testing.assert_allclose(np.asarray(d.qpos), mj_data.qpos, atol=5e-3)


@pytest.mark.slow
def test_sphere_slide_friction_trajectory():
    mj_model, model = _pair(fr="0.5 0.1 0.01", condim=3, z=0.0495)
    mj_data = mujoco.MjData(mj_model)
    mj_data.qvel[0] = 1.5
    d = make_data(model).replace(qvel=jnp.zeros(6).at[0].set(1.5))
    stp = jax.jit(step)
    for _ in range(300):
        mujoco.mj_step(mj_model, mj_data)
    for _ in range(300):
        d = stp(model, d)
    np.testing.assert_allclose(np.asarray(d.qpos)[:3], mj_data.qpos[:3], atol=5e-3)
    np.testing.assert_allclose(np.asarray(d.qvel)[:3], mj_data.qvel[:3], atol=2e-2)
