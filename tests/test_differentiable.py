"""Differentiable simulation: reverse-mode gradients flow through step()
(the role MJX's differentiability plays for gradient-based trajopt; gradients
of the constraint solve come from jax.vjp of the unrolled Newton reference —
see engine/linalg.differentiable_dispatch)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ambersim_tpu.engine import make_data, step
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

PENDULUM = """
<mujoco><option timestep="0.01"/><compiler angle="radian"/><worldbody>
  <body pos="0 0 1">
    <joint name="h" axis="0 1 0" damping="0.05"/>
    <geom type="capsule" fromto="0 0 0 0 0 -0.4" size="0.03"/>
  </body>
</worldbody>
<actuator><motor joint="h" gear="1"/></actuator>
</mujoco>
"""

BALL_DROP = """
<mujoco><option timestep="0.002"/><worldbody>
  <geom type="plane" size="0 0 1"/>
  <body pos="0 0 0.15"><freejoint/><geom type="sphere" size="0.1"/></body>
</worldbody></mujoco>
"""


def _model(xml):
    from ambersim_tpu.engine.setconst import set_constants

    return set_constants(compile_spec(parse_mjcf_string(xml)))


def test_grad_matches_finite_difference_smooth():
    """d(final angle)/d(torque) on a pendulum vs central differences."""
    m = _model(PENDULUM)
    d0 = make_data(m)

    def final_angle(tau):
        d = d0.replace(ctrl=jnp.array([tau]))

        def body(dd, _):
            return step(m, dd), None

        d, _ = jax.lax.scan(body, d, None, length=20)
        return d.qpos[0]

    g = jax.jit(jax.grad(final_angle))(0.3)
    eps = 1e-2
    fd = (final_angle(0.3 + eps) - final_angle(0.3 - eps)) / (2 * eps)
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), float(fd), rtol=2e-2)


@pytest.mark.slow
def test_grad_through_contact_solve():
    """Gradients through the Newton contact solve are finite and vmappable."""
    m = _model(BALL_DROP)
    d0 = make_data(m)

    def loss(vz):
        d = d0.replace(qvel=d0.qvel.at[2].set(vz))

        def body(dd, _):
            return step(m, dd), None

        d, _ = jax.lax.scan(body, d, None, length=30)
        return d.qpos[2]

    g = jax.jit(jax.grad(loss))(-0.5)
    assert np.isfinite(float(g))
    # downward initial velocity lowers the final height until contact absorbs
    # it; either way the derivative must be finite and the vmapped form must
    # agree with the scalar one
    vzs = jnp.array([-0.5, -0.2, 0.1])
    gb = jax.jit(jax.vmap(jax.grad(loss)))(vzs)
    assert np.isfinite(np.asarray(gb)).all()
    np.testing.assert_allclose(float(gb[0]), float(g), rtol=1e-5, atol=1e-8)


@pytest.mark.slow
def test_grad_wrt_model_field():
    """Differentiating wrt a physical model parameter (gravity)."""
    m = _model(PENDULUM)
    d0 = make_data(m)

    def final_angle(gz):
        mm = m.replace(opt=m.opt.replace(gravity=jnp.array([0.0, 0.0, gz])))
        d = d0.replace(qpos=jnp.array([0.3]))

        def body(dd, _):
            return step(mm, dd), None

        d, _ = jax.lax.scan(body, d, None, length=20)
        return d.qpos[0]

    g = jax.jit(jax.grad(final_angle))(-9.81)
    eps = 1e-2
    fd = (final_angle(-9.81 + eps) - final_angle(-9.81 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=2e-2)
