"""Constraint pipeline parity vs the MuJoCo C engine: efc rows, contact
forces, and contact-rich rollouts (Newton solver both sides)."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ambersim_tpu.engine import forward, make_data, step
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

BALL_PLANE = """
<mujoco><option timestep="0.002"/><worldbody>
  <geom name="floor" type="plane" size="0 0 1"/>
  <body name="ball" pos="0 0 0.095"><freejoint/>
    <geom name="s" type="sphere" size="0.1"/></body>
</worldbody></mujoco>
"""

LIMITED_PENDULUM = """
<mujoco><option timestep="0.002"/><worldbody>
  <body pos="0 0 1">
    <joint name="h" axis="0 1 0" range="-0.5 0.5" frictionloss="0.3" damping="0.1"/>
    <geom type="capsule" fromto="0 0 0 0 0 -0.4" size="0.03"/>
  </body>
</worldbody><compiler angle="radian"/></mujoco>
"""

COUPLED_JOINTS = """
<mujoco><option timestep="0.002"/><compiler angle="radian"/><worldbody>
  <body pos="0 0 1"><joint name="j1" axis="0 1 0"/>
    <geom type="capsule" fromto="0 0 0 0 0 -0.3" size="0.03"/>
    <body pos="0 0 -0.3"><joint name="j2" axis="0 1 0"/>
      <geom type="capsule" fromto="0 0 0 0 0 -0.3" size="0.03"/>
    </body>
  </body>
</worldbody>
<equality><joint joint1="j1" joint2="j2" polycoef="0 0.5 0 0 0"/></equality>
</mujoco>
"""

BOX_DROP = """
<mujoco><option timestep="0.002"/><worldbody>
  <geom name="floor" type="plane" size="0 0 1"/>
  <body name="box" pos="0 0 0.3" euler="10 5 0">
    <freejoint/><geom type="box" size="0.1 0.08 0.05"/>
  </body>
</worldbody></mujoco>
"""

CAPSULE_DROP = """
<mujoco><option timestep="0.002"/><worldbody>
  <geom name="floor" type="plane" size="0 0 1"/>
  <body name="cap" pos="0 0 0.3" euler="0 80 0">
    <freejoint/><geom type="capsule" size="0.04 0.15"/>
  </body>
</mujoco>
""".replace("</mujoco>\n", "</worldbody></mujoco>\n", 1)

SPHERE_STACK = """
<mujoco><option timestep="0.002"/><worldbody>
  <geom name="floor" type="plane" size="0 0 1"/>
  <body pos="0 0 0.1"><freejoint/><geom type="sphere" size="0.1"/></body>
  <body pos="0.02 0 0.31"><freejoint/><geom type="sphere" size="0.1"/></body>
</worldbody></mujoco>
"""


def _pair(xml):
    mj_model = mujoco.MjModel.from_xml_string(xml)
    from ambersim_tpu.engine.setconst import set_constants

    model = set_constants(compile_spec(parse_mjcf_string(xml)))
    return mj_model, model


def test_efc_rows_ball_plane():
    """Row-level parity for a single sliding contact (4 pyramidal rows)."""
    mj_model, model = _pair(BALL_PLANE)
    mj_data = mujoco.MjData(mj_model)
    mj_data.qvel[0] = 0.3
    mujoco.mj_forward(mj_model, mj_data)

    d = make_data(model)
    d = d.replace(qvel=d.qvel.at[0].set(0.3))
    d = jax.jit(forward)(model, d)

    assert mj_data.nefc == model.skel.nefc == 4
    np.testing.assert_allclose(d.contact.dist[:1], mj_data.contact.dist, atol=1e-6)
    np.testing.assert_allclose(d.contact.pos[:1], mj_data.contact.pos, atol=1e-6)
    np.testing.assert_allclose(
        d.contact.frame[:1], mj_data.contact.frame.reshape(-1, 3, 3), atol=1e-6
    )
    np.testing.assert_allclose(d.efc_J, mj_data.efc_J.reshape(4, 6), atol=1e-5)
    np.testing.assert_allclose(d.efc_pos, mj_data.efc_pos, atol=1e-6)
    np.testing.assert_allclose(d.efc_aref, mj_data.efc_aref, rtol=1e-4)
    np.testing.assert_allclose(1.0 / d.efc_D, mj_data.efc_R, rtol=1e-4)
    np.testing.assert_allclose(d.qacc, mj_data.qacc, rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(d.qfrc_constraint, mj_data.qfrc_constraint, rtol=5e-3, atol=1e-3)


def test_efc_rows_limits_friction():
    mj_model, model = _pair(LIMITED_PENDULUM)
    mj_data = mujoco.MjData(mj_model)
    mj_data.qpos[0] = 0.55  # beyond the 0.5 limit so the C engine emits the row
    mj_data.qvel[0] = 1.0
    mujoco.mj_forward(mj_model, mj_data)

    d = make_data(model)
    d = d.replace(qpos=jnp.array([0.55]), qvel=jnp.array([1.0]))
    d = jax.jit(forward)(model, d)

    assert model.skel.nefc == 2  # friction + limit
    np.testing.assert_allclose(d.efc_J, mj_data.efc_J.reshape(2, 1), atol=1e-6)
    np.testing.assert_allclose(d.efc_aref, mj_data.efc_aref, rtol=1e-4)
    np.testing.assert_allclose(1.0 / d.efc_D, mj_data.efc_R, rtol=1e-4)
    np.testing.assert_allclose(d.qacc, mj_data.qacc, rtol=5e-3, atol=1e-2)


def test_equality_joint_coupling():
    mj_model, model = _pair(COUPLED_JOINTS)
    mj_data = mujoco.MjData(mj_model)
    mj_data.qpos[:] = [0.3, 0.2]
    mj_data.qvel[:] = [0.1, -0.2]
    mujoco.mj_forward(mj_model, mj_data)

    d = make_data(model)
    d = d.replace(qpos=jnp.array([0.3, 0.2]), qvel=jnp.array([0.1, -0.2]))
    d = jax.jit(forward)(model, d)

    np.testing.assert_allclose(d.efc_J, mj_data.efc_J.reshape(1, 2), atol=1e-6)
    np.testing.assert_allclose(d.efc_aref, mj_data.efc_aref, rtol=1e-4)
    np.testing.assert_allclose(d.qacc, mj_data.qacc, rtol=5e-3, atol=1e-3)


@pytest.mark.parametrize(
    "name,xml,steps,atol",
    [
        ("ball_plane", BALL_PLANE, 300, 5e-3),
        ("box_drop", BOX_DROP, 300, 2e-2),
        ("capsule_drop", CAPSULE_DROP, 300, 2e-2),
        ("sphere_stack", SPHERE_STACK, 300, 2e-2),
        ("limited_pendulum", LIMITED_PENDULUM, 500, 2e-2),
        ("coupled_joints", COUPLED_JOINTS, 500, 1e-2),
    ],
)
@pytest.mark.slow
def test_contact_rollout_parity(name, xml, steps, atol):
    """Trajectories through impact + settling must track the C engine."""
    mj_model, model = _pair(xml)
    mj_data = mujoco.MjData(mj_model)

    d = make_data(model)
    stp = jax.jit(step)
    for _ in range(steps):
        mujoco.mj_step(mj_model, mj_data)
    for _ in range(steps):
        d = stp(model, d)

    np.testing.assert_allclose(d.qpos, mj_data.qpos, atol=atol, err_msg=f"{name} qpos")
    np.testing.assert_allclose(d.qvel, mj_data.qvel, atol=10 * atol, err_msg=f"{name} qvel")


def test_cg_solver_rollout():
    """CG solver option (reference io_utils.py:161-183 fallback) tracks
    MuJoCo's CG on a contact rollout."""
    mj_model = mujoco.MjModel.from_xml_string(BALL_PLANE)
    mj_model.opt.solver = mujoco.mjtSolver.mjSOL_CG
    mj_model.opt.iterations = 20
    mj_data = mujoco.MjData(mj_model)
    _, model = _pair(BALL_PLANE)
    from ambersim_tpu.core.types import SolverType

    model = model.replace(opt=model.opt.replace(solver=int(SolverType.CG), iterations=20))
    d = make_data(model)
    stp = jax.jit(step)
    for _ in range(300):
        mujoco.mj_step(mj_model, mj_data)
    for _ in range(300):
        d = stp(model, d)
    np.testing.assert_allclose(d.qpos, mj_data.qpos, atol=1e-2)


@pytest.mark.slow
def test_plane_cylinder_ellipsoid_drops():
    for geo, ang in (
        ('<geom type="cylinder" size="0.05 0.1"/>', "1.3 0.2 0"),
        ('<geom type="ellipsoid" size="0.05 0.08 0.12"/>', "0.7 0.2 0"),
    ):
        xml = f"""<mujoco><option timestep="0.002"/><worldbody>
        <geom type="plane" size="0 0 1"/>
        <body pos="0 0 0.3" euler="{ang}"><freejoint/>{geo}</body>
        </worldbody></mujoco>"""
        mj_model, model = _pair(xml)
        mj_data = mujoco.MjData(mj_model)
        d = make_data(model)
        stp = jax.jit(step)
        for _ in range(400):
            mujoco.mj_step(mj_model, mj_data)
        for _ in range(400):
            d = stp(model, d)
        np.testing.assert_allclose(d.qpos, mj_data.qpos, atol=2e-2)


@pytest.mark.slow
def test_box_box_stacking():
    """Box-on-box stacking (corner-contact narrowphase) tracks MuJoCo."""
    xml = """<mujoco><option timestep="0.002"/><worldbody>
    <geom type="plane" size="0 0 1"/>
    <body pos="0 0 0.05"><freejoint/><geom type="box" size="0.1 0.1 0.05"/></body>
    <body pos="0.02 0.01 0.18" euler="0 0 0.3"><freejoint/><geom type="box" size="0.06 0.06 0.04"/></body>
    </worldbody></mujoco>"""
    mj_model = mujoco.MjModel.from_xml_string(xml)
    mj_data = mujoco.MjData(mj_model)
    _, model = None, None
    from ambersim_tpu.engine.setconst import set_constants as _sc

    model = _sc(compile_spec(parse_mjcf_string(xml)))
    d = make_data(model)
    stp = jax.jit(step)
    for _ in range(500):
        mujoco.mj_step(mj_model, mj_data)
    for _ in range(500):
        d = stp(model, d)
    np.testing.assert_allclose(d.qpos, mj_data.qpos, atol=5e-3)


CONNECT_SWING = """<mujoco><compiler angle="radian"/><option timestep="0.002"/><worldbody>
<body name="b1" pos="0 0 1"><joint name="j1" axis="0 1 0"/><geom type="capsule" fromto="0 0 0 0 0 -0.4" size="0.03"/></body>
<body name="b2" pos="0 0.1 0.6"><joint name="j2" axis="1 0 0"/><geom type="capsule" fromto="0 0 0 0 0 -0.3" size="0.03"/></body>
</worldbody>
<equality><connect body1="b1" body2="b2" anchor="0 0 -0.4"/></equality></mujoco>"""

WELD_PAIR = """<mujoco><compiler angle="radian"/><option timestep="0.002"/><worldbody>
<body name="b1" pos="0.1 0.2 1.0" euler="0 0 0.5"><joint name="j1" axis="0 1 0"/><geom type="capsule" fromto="0 0 0 0 0 -0.3" size="0.03"/></body>
<body name="b2" pos="0.4 0.1 0.8" euler="0.3 0 0"><joint name="j2" axis="1 0 0"/><geom type="capsule" fromto="0 0 0 0 0 -0.3" size="0.03"/></body>
</worldbody>
<equality><weld body1="b1" body2="b2" anchor="0.1 0 -0.2"/></equality></mujoco>"""


@pytest.mark.parametrize("name,xml", [("connect", CONNECT_SWING), ("weld", WELD_PAIR)])
def test_connect_weld_equality(name, xml):
    """connect/weld compile (counterpart anchors, qpos0 relpose) and dynamics
    match MuJoCo (review finding: these were previously zero-filled)."""
    mj_model, model = _pair(xml)
    np.testing.assert_allclose(
        np.asarray(model.eq_data[0]), mj_model.eq_data[0][:11], atol=1e-5, err_msg=f"{name} eq_data"
    )
    mj_data = mujoco.MjData(mj_model)
    mj_data.qvel[:] = [1.5, -0.8]
    d = make_data(model).replace(qvel=jnp.array([1.5, -0.8]))
    stp = jax.jit(step)
    for _ in range(300):
        mujoco.mj_step(mj_model, mj_data)
    for _ in range(300):
        d = stp(model, d)
    np.testing.assert_allclose(d.qpos, mj_data.qpos, atol=2e-2, err_msg=f"{name} qpos")


FRICTION_XML = """
<mujoco><option timestep="0.002" impratio="{imp}"/><worldbody>
  <geom name="floor" type="plane" size="0 0 1" condim="{condim}"
        friction="{mu} 0.005 0.0001"/>
  <body name="ball" pos="0 0 0.095"><freejoint/>
    <geom type="sphere" size="0.1" condim="{condim}"
          friction="{mu} 0.005 0.0001"/></body>
</worldbody></mujoco>
"""


@pytest.mark.parametrize(
    "condim,mu,imp",
    [(1, 1.0, 1.0), (1, 1.0, 3.0), (3, 0.5, 1.0), (3, 2.5, 1.0), (3, 2.5, 3.0), (4, 2.5, 3.0)],
)
def test_contact_efc_R_parity(condim, mu, imp):
    """Contact-row efc_R across condim/friction/impratio (ADVICE r1: the
    diagApprox formula differs for frictionless and high-friction contacts)."""
    xml = FRICTION_XML.format(condim=condim, mu=mu, imp=imp)
    mj_model, model = _pair(xml)
    mj_data = mujoco.MjData(mj_model)
    mj_data.qvel[0] = 0.2
    mujoco.mj_forward(mj_model, mj_data)

    d = make_data(model)
    d = d.replace(qvel=d.qvel.at[0].set(0.2))
    d = jax.jit(forward)(model, d)

    nrow = 1 if condim == 1 else 2 * (condim - 1)
    assert mj_data.nefc == nrow
    np.testing.assert_allclose(1.0 / d.efc_D[:nrow], mj_data.efc_R, rtol=1e-4)
    np.testing.assert_allclose(d.qacc, mj_data.qacc, rtol=5e-3, atol=1e-3)


BALL_LIMITED = """
<mujoco><option timestep="0.002"/><worldbody><body pos="0 0 1">
  <joint name="b" type="ball" range="0 30" damping="0.05"/>
  <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03" density="700"/>
</body></worldbody></mujoco>
"""


def test_ball_joint_limit_rows():
    """Ball rotation-angle limit: dist = max(range) - |rotvec|, J = -axis
    (mj_instantiateLimit), with the averaged ball-dof invweight0."""
    mj_model, model = _pair(BALL_LIMITED)
    np.testing.assert_allclose(model.dof_invweight0, mj_model.dof_invweight0, rtol=1e-5)
    mj_data = mujoco.MjData(mj_model)
    q = np.array([0.95, 0.25, 0.15, 0.1])
    q /= np.linalg.norm(q)  # rotation angle ~0.63 rad > the 30-degree limit
    qvel = np.array([1.5, -0.5, 0.3])
    mj_data.qpos[:] = q
    mj_data.qvel[:] = qvel
    mujoco.mj_forward(mj_model, mj_data)
    d = make_data(model).replace(qpos=jnp.asarray(q, jnp.float32), qvel=jnp.asarray(qvel, jnp.float32))
    d = jax.jit(forward)(model, d)
    assert mj_data.nefc == model.skel.nefc == 1
    np.testing.assert_allclose(d.efc_J, mj_data.efc_J.reshape(1, 3), atol=1e-6)
    np.testing.assert_allclose(d.efc_pos, mj_data.efc_pos, atol=1e-6)
    np.testing.assert_allclose(1.0 / d.efc_D, mj_data.efc_R, rtol=1e-4)
    np.testing.assert_allclose(d.qacc, mj_data.qacc, rtol=5e-3, atol=1e-2)


@pytest.mark.slow
def test_ball_joint_limit_rollout():
    """400 steps of free swing repeatedly hitting the ball rotation limit."""
    mj_model, model = _pair(BALL_LIMITED)
    mj_data = mujoco.MjData(mj_model)
    mj_data.qvel[:] = [3.0, -2.0, 1.0]
    d = make_data(model).replace(qvel=jnp.array([3.0, -2.0, 1.0], jnp.float32))
    stp = jax.jit(step)
    for _ in range(400):
        mujoco.mj_step(mj_model, mj_data)
        d = stp(model, d)
    np.testing.assert_allclose(d.qpos, mj_data.qpos, atol=1e-4)
