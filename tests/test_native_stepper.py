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
