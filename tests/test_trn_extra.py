"""jointinparent + slidercrank transmission parity vs the MuJoCo C oracle.

Covers actuator_moment rows, actuator_length, and qfrc_actuator for the two
transmission types the basic joint/tendon/site paths don't reach, plus the
ball-joint transmission length (gear . expmap). Reference role: actuation
stage of the MJX pipeline (SURVEY.md §2.2 D3).
"""

import jax.numpy as jnp
import mujoco
import numpy as np

from ambersim_tpu.engine import forward, make_data
from ambersim_tpu.engine.setconst import set_constants
from ambersim_tpu.engine.smooth import actuator_moment
from ambersim_tpu.mjcf.compiler import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body name="b" pos="0 0 1" euler="0 0 30">
      <joint name="ball" type="ball"/>
      <geom type="sphere" size="0.1" mass="1"/>
    </body>
    <body name="crank" pos="1 0 1">
      <joint name="h" type="hinge" axis="0 1 0"/>
      <geom type="capsule" fromto="0 0 0 0.2 0 0" size="0.02" mass="0.5"/>
      <site name="cs" pos="0.2 0 0"/>
    </body>
    <body name="slider" pos="1.5 0 1">
      <joint name="sl" type="slide" axis="1 0 0"/>
      <geom type="box" size="0.05 0.05 0.05" mass="0.5"/>
      <site name="ss" euler="0 90 0"/>
    </body>
    <body name="fr" pos="-1 0 1">
      <freejoint name="fr"/>
      <geom type="box" size="0.1 0.1 0.1" mass="1"/>
    </body>
  </worldbody>
  <actuator>
    <motor joint="ball" gear="1 2 3" ctrlrange="-1 1"/>
    <general jointinparent="ball" gear="1 2 3" ctrlrange="-1 1"/>
    <general cranksite="cs" slidersite="ss" cranklength="0.35" gear="2" ctrlrange="-1 1"/>
    <general cranksite="cs" slidersite="ss" cranklength="0.6" gear="1.5" ctrlrange="-1 1"/>
    <general jointinparent="fr" gear="1 2 3 0.4 0.5 0.6" ctrlrange="-1 1"/>
  </actuator>
</mujoco>
"""


def _setup(qpos, ctrl):
    m = set_constants(compile_spec(parse_mjcf_string(XML)))
    d = make_data(m).replace(qpos=jnp.array(qpos, jnp.float32), ctrl=jnp.array(ctrl, jnp.float32))
    d = forward(m, d)
    mm = mujoco.MjModel.from_xml_string(XML)
    md = mujoco.MjData(mm)
    md.qpos[:] = qpos
    md.ctrl[:] = ctrl
    mujoco.mj_forward(mm, md)
    return m, d, mm, md


QPOS = [0.9, 0.2, -0.3, 0.25] + [0.6, 0.1] + [-1.1, 0.2, 1.4, 0.8, -0.1, 0.55, 0.2]
CTRL = [0.3, -0.7, 0.9, 0.5, -0.2]


def _norm_qpos(qpos):
    q = np.array(qpos, float)
    q[0:4] /= np.linalg.norm(q[0:4])
    q[9:13] /= np.linalg.norm(q[9:13])
    return q


def test_moment_and_length_parity():
    qpos = _norm_qpos(QPOS)
    m, d, mm, md = _setup(qpos, CTRL)
    mom_ref = np.zeros((mm.nu, mm.nv))
    mujoco.mju_sparse2dense(mom_ref, md.actuator_moment, md.moment_rownnz, md.moment_rowadr, md.moment_colind)
    mom = np.asarray(actuator_moment(m, d))
    np.testing.assert_allclose(mom, mom_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d.actuator_length), md.actuator_length, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d.qfrc_actuator), md.qfrc_actuator, atol=1e-4)


def test_slidercrank_broken_rod():
    # crank angle far from the slider axis: discriminant goes negative and
    # the length degenerates to the axis projection (oracle semantics)
    qpos = _norm_qpos(QPOS)
    qpos[4] = 2.2
    m, d, mm, md = _setup(qpos, CTRL)
    np.testing.assert_allclose(np.asarray(d.actuator_length), md.actuator_length, atol=1e-5)
    mom_ref = np.zeros((mm.nu, mm.nv))
    mujoco.mju_sparse2dense(mom_ref, md.actuator_moment, md.moment_rownnz, md.moment_rowadr, md.moment_colind)
    np.testing.assert_allclose(np.asarray(actuator_moment(m, d)), mom_ref, atol=1e-5)


def test_rollout_parity():
    qpos = _norm_qpos(QPOS)
    from ambersim_tpu.engine import step
    import jax

    m, d, mm, md = _setup(qpos, CTRL)
    stepj = jax.jit(lambda dd: step(m, dd))
    d = make_data(m).replace(qpos=jnp.array(qpos, jnp.float32), ctrl=jnp.array(CTRL, jnp.float32))
    md2 = mujoco.MjData(mm)
    md2.qpos[:] = qpos
    md2.ctrl[:] = CTRL
    for _ in range(100):
        d = stepj(d)
        mujoco.mj_step(mm, md2)
    np.testing.assert_allclose(np.asarray(d.qpos), md2.qpos, atol=2e-3)
