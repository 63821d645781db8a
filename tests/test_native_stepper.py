"""C++ reference stepper vs the JAX engine (independent smooth-dynamics
oracle, the role MuJoCo's C engine plays for the reference — SURVEY.md D2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ambersim_tpu.engine import make_data, step
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string
from ambersim_tpu.engine.setconst import set_constants

CHAIN = """
<mujoco><option timestep="0.004"/><compiler angle="radian"/><worldbody>
  <body name="cart" pos="0 0 0.5">
    <joint name="slide_x" type="slide" axis="1 0 0" damping="0.05"/>
    <geom type="box" size="0.1 0.08 0.05" density="500" contype="0" conaffinity="0"/>
    <body name="pole" pos="0 0 0.05">
      <joint name="hinge1" axis="0 1 0" armature="0.01" stiffness="1.5" springref="0.3"/>
      <geom type="capsule" size="0.02 0.25" pos="0 0 0.25" contype="0" conaffinity="0"/>
      <body name="tip" pos="0 0 0.5">
        <joint name="hinge2" axis="1 0 0" damping="0.02"/>
        <geom type="sphere" size="0.04" density="2000" contype="0" conaffinity="0"/>
      </body>
    </body>
  </body>
</worldbody>
<actuator>
  <motor joint="slide_x" gear="2" ctrlrange="-3 3" ctrllimited="true"/>
  <motor joint="hinge1"/>
</actuator>
</mujoco>
"""


def test_cpp_stepper_matches_jax_engine():
    native = pytest.importorskip("ambersim_tpu.native")
    model = set_constants(compile_spec(parse_mjcf_string(CHAIN)))
    cpp = native.HostStepper(model)

    qpos = np.array([0.1, 0.4, -0.2])
    qvel = np.array([0.3, -0.5, 0.8])
    ctrl = np.array([1.2, -0.4])

    cpp.set_state(qpos, qvel)
    cpp.set_ctrl(ctrl)
    cpp.step(200)
    qpos_cpp, qvel_cpp = cpp.get_state()

    d = make_data(model).replace(
        qpos=jnp.asarray(qpos, jnp.float32),
        qvel=jnp.asarray(qvel, jnp.float32),
        ctrl=jnp.asarray(ctrl, jnp.float32),
    )
    stp = jax.jit(step)
    for _ in range(200):
        d = stp(model, d)

    np.testing.assert_allclose(np.asarray(d.qpos), qpos_cpp, atol=2e-3)
    np.testing.assert_allclose(np.asarray(d.qvel), qvel_cpp, atol=5e-3)


BOUNCE = """
<mujoco><option timestep="0.002" iterations="20" ls_iterations="20"/>
<compiler angle="radian"/><worldbody>
  <geom name="floor" type="plane" size="0 0 1"/>
  <body name="ball" pos="0.02 -0.01 0.3">
    <freejoint/>
    <geom name="ball_geom" type="sphere" size="0.05" density="800" friction="0.8 0.01 0.001"/>
  </body>
</worldbody></mujoco>
"""


def test_cpp_stepper_free_base_bounce_vs_both_engines():
    """Free joint + plane contact: the C++ oracle (VERDICT r1 item 7) tracks
    both the JAX engine and MuJoCo C through a drop, impact and settle."""
    native = pytest.importorskip("ambersim_tpu.native")
    mujoco = pytest.importorskip("mujoco")
    model = set_constants(compile_spec(parse_mjcf_string(BOUNCE)))
    cpp = native.HostStepper(model)

    nsteps = 400  # 0.8 s: free fall (~0.22 s), impact, settle
    cpp.step(nsteps)
    qpos_cpp, qvel_cpp = cpp.get_state()

    d = make_data(model)
    stp = jax.jit(step)
    for _ in range(nsteps):
        d = stp(model, d)
    qpos_jax = np.asarray(d.qpos)

    mm = mujoco.MjModel.from_xml_string(BOUNCE)
    dd = mujoco.MjData(mm)
    for _ in range(nsteps):
        mujoco.mj_step(mm, dd)

    # settled on the plane at sphere radius, all three engines agree
    assert abs(qpos_cpp[2] - 0.05) < 5e-3
    np.testing.assert_allclose(qpos_cpp[:3], qpos_jax[:3], atol=2e-3)
    np.testing.assert_allclose(qpos_cpp[:3], dd.qpos[:3], atol=2e-3)
    np.testing.assert_allclose(qvel_cpp, np.zeros_like(qvel_cpp), atol=5e-2)


def test_cpp_stepper_free_box_tumble_vs_jax():
    """Box dropped with spin: 4-corner plane manifold + pyramidal friction in
    the C++ oracle matches the JAX engine through contact-rich motion."""
    native = pytest.importorskip("ambersim_tpu.native")
    xml = """
<mujoco><option timestep="0.002" iterations="20" ls_iterations="20"/>
<compiler angle="radian"/><worldbody>
  <geom name="floor" type="plane" size="0 0 1"/>
  <body name="box" pos="0 0 0.12" euler="0.3 0.2 0.1">
    <freejoint/>
    <geom name="box_geom" type="box" size="0.06 0.05 0.04" density="600"
          friction="0.7 0.01 0.001"/>
  </body>
</worldbody></mujoco>
"""
    model = set_constants(compile_spec(parse_mjcf_string(xml)))
    cpp = native.HostStepper(model)
    qvel0 = np.array([0.2, -0.1, 0.0, 1.0, -2.0, 0.5])
    cpp.set_state(np.asarray(model.qpos0), qvel0)
    nsteps = 300
    cpp.step(nsteps)
    qpos_cpp, _ = cpp.get_state()

    d = make_data(model).replace(qvel=jnp.asarray(qvel0, jnp.float32))
    stp = jax.jit(step)
    for _ in range(nsteps):
        d = stp(model, d)
    qpos_jax = np.asarray(d.qpos)

    # box has come to rest on a face: height = one of the half-sizes
    assert min(abs(qpos_cpp[2] - s) for s in (0.06, 0.05, 0.04)) < 8e-3
    np.testing.assert_allclose(qpos_cpp[:3], qpos_jax[:3], atol=2e-2)
    # orientations agree up to sign
    q_c, q_j = qpos_cpp[3:7], qpos_jax[3:7]
    assert min(np.abs(q_c - q_j).max(), np.abs(q_c + q_j).max()) < 5e-2


def test_cpp_stepper_joint_limits():
    """Hinge limit rows: the C++ oracle stops a falling pendulum at its range
    limit like the JAX engine does."""
    native = pytest.importorskip("ambersim_tpu.native")
    xml = """
<mujoco><option timestep="0.002" iterations="20" ls_iterations="20"/>
<compiler angle="radian" autolimits="true"/><worldbody>
  <body name="arm" pos="0 0 1">
    <joint name="hinge" axis="0 1 0" range="-0.5 0.5"/>
    <geom type="capsule" size="0.02 0.2" pos="0 0 -0.2" density="1000"
          contype="0" conaffinity="0"/>
  </body>
</worldbody></mujoco>
"""
    model = set_constants(compile_spec(parse_mjcf_string(xml)))
    cpp = native.HostStepper(model)
    cpp.set_state(np.array([0.4]), np.array([2.0]))
    cpp.step(300)
    qpos_cpp, _ = cpp.get_state()

    d = make_data(model).replace(
        qpos=jnp.asarray([0.4], jnp.float32), qvel=jnp.asarray([2.0], jnp.float32)
    )
    stp = jax.jit(step)
    for _ in range(300):
        d = stp(model, d)

    assert qpos_cpp[0] < 0.55  # limit held (soft constraint allows slight overshoot)
    np.testing.assert_allclose(qpos_cpp, np.asarray(d.qpos), atol=2e-2)


def test_cpp_stepper_ctrl_clamp():
    native = pytest.importorskip("ambersim_tpu.native")
    model = set_constants(compile_spec(parse_mjcf_string(CHAIN)))
    cpp = native.HostStepper(model)
    cpp.set_ctrl(np.array([100.0, 0.0]))  # beyond ctrlrange +-3
    cpp.step(50)
    q_clamped, _ = cpp.get_state()
    cpp2 = native.HostStepper(model)
    cpp2.set_ctrl(np.array([3.0, 0.0]))
    cpp2.step(50)
    q_exact, _ = cpp2.get_state()
    np.testing.assert_allclose(q_clamped, q_exact, atol=1e-12)
