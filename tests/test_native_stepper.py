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


BALL_SWING = """
<mujoco><option timestep="0.002" iterations="16" ls_iterations="16"/>
<compiler angle="radian" autolimits="true"/><worldbody>
  <body name="swing" pos="0 0 1">
    <joint name="b" type="ball" range="0 1.2" damping="0.05" stiffness="0.4"
           frictionloss="0.02"/>
    <geom type="capsule" size="0.02 0.2" pos="0.12 0.05 -0.2" euler="0.3 0.5 0"
          density="1200" contype="0" conaffinity="0"/>
  </body>
</worldbody></mujoco>
"""


def test_cpp_stepper_ball_joint_vs_both_engines():
    """Ball joint with rotation limit, spring, and dof friction loss: the C++
    oracle tracks the JAX engine (8e-8-level) and MuJoCo C through a 0.8 s
    free swing (stepper.cpp v3: ball FK/cdof/expmap + Huber friction rows)."""
    native = pytest.importorskip("ambersim_tpu.native")
    model = set_constants(compile_spec(parse_mjcf_string(BALL_SWING)))
    cpp = native.HostStepper(model)
    qvel0 = np.array([1.5, -2.0, 0.7])
    cpp.set_state(np.asarray(model.qpos0), qvel0)
    nsteps = 400
    cpp.step(nsteps)
    qp_c, qv_c = cpp.get_state()

    d = make_data(model).replace(qvel=jnp.asarray(qvel0, jnp.float32))
    stp = jax.jit(step)
    for _ in range(nsteps):
        d = stp(model, d)
    np.testing.assert_allclose(qp_c, np.asarray(d.qpos), atol=1e-4)
    np.testing.assert_allclose(qv_c, np.asarray(d.qvel), atol=1e-3)

    mujoco = pytest.importorskip("mujoco")
    mm = mujoco.MjModel.from_xml_string(BALL_SWING)
    dd = mujoco.MjData(mm)
    dd.qvel[:] = qvel0
    for _ in range(nsteps):
        mujoco.mj_step(mm, dd)
    np.testing.assert_allclose(qp_c, dd.qpos, atol=2e-3)


def test_cpp_stepper_quadruped_stand_parity():
    """The flagship quadruped (free root + 12 hinges with frictionloss,
    plane-vs-box/sphere/CAPSULE contacts) runs in the native host oracle and
    tracks the JAX engine through a 0.6 s PD stand — closing VERDICT r2's
    last partial (D2). Reference role: MuJoCo C stepping any model in
    examples/interactive_simulation.py:57-71."""
    native = pytest.importorskip("ambersim_tpu.native")
    from ambersim_tpu.utils.io_utils import load_model_from_file

    model = load_model_from_file("models/quadruped/quadruped.xml")
    cpp = native.HostStepper(model)
    qpos0 = np.asarray(model.qpos0, np.float64)
    nsteps, kp, kd = 300, 60.0, 2.0
    cpp.set_state(qpos0, np.zeros(model.nv))
    for _ in range(nsteps):
        qp, qv = cpp.get_state()
        cpp.set_ctrl(kp * (qpos0[7:] - qp[7:]) - kd * qv[6:])
        cpp.step(1)
    qp_c, qv_c = cpp.get_state()

    d = make_data(model)
    q0j = jnp.asarray(qpos0, jnp.float32)
    stp = jax.jit(
        lambda m, d: step(
            m, d.replace(ctrl=kp * (q0j[7:] - d.qpos[7:]) - kd * d.qvel[6:])
        )
    )
    for _ in range(nsteps):
        d = stp(model, d)
    qp_j = np.asarray(d.qpos)
    # standing, all feet loaded, both engines agree to f32 rollout precision
    assert qp_c[2] > 0.2 and qp_j[2] > 0.2
    np.testing.assert_allclose(qp_c, qp_j, atol=1e-3)


@pytest.mark.slow
def test_cpp_stepper_humanoid_multijoint_vs_jax():
    """The humanoid's stacked-hinge bodies (2-3 joints per body) exercise the
    multi-joint FK/RNEA path; C++ and JAX engines agree through a PD stand
    (looser band: 25-dof contact-rich f32-vs-f64 rollouts diverge chaotically
    at box-corner contacts)."""
    native = pytest.importorskip("ambersim_tpu.native")
    from ambersim_tpu.utils.io_utils import load_model_from_file

    model = load_model_from_file("models/humanoid/humanoid.xml")
    cpp = native.HostStepper(model)
    qpos0 = np.asarray(model.qpos0, np.float64)
    nsteps, kp, kd = 200, 120.0, 4.0
    cpp.set_state(qpos0, np.zeros(model.nv))
    for _ in range(nsteps):
        qp, qv = cpp.get_state()
        u = kp * (qpos0[7:] - qp[7:]) - kd * qv[6:]
        cpp.set_ctrl(u[: model.nu])
        cpp.step(1)
    qp_c, _ = cpp.get_state()

    d = make_data(model)
    q0j = jnp.asarray(qpos0, jnp.float32)
    stp = jax.jit(
        lambda m, d: step(
            m,
            d.replace(ctrl=(kp * (q0j[7:] - d.qpos[7:]) - kd * d.qvel[6:])[: m.nu]),
        )
    )
    for _ in range(nsteps):
        d = stp(model, d)
    qp_j = np.asarray(d.qpos)
    assert qp_c[2] > 0.55 and qp_j[2] > 0.55  # both still standing
    np.testing.assert_allclose(qp_c, qp_j, atol=0.1)
