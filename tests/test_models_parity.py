"""Cross-engine rollout parity for the packaged benchmark models
(cartpole, 3-link arm, object drop, quadruped, humanoid)."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ambersim_tpu import ROOT
from ambersim_tpu.engine import make_data, step
from ambersim_tpu.utils.io_utils import load_model_from_file

pytestmark = pytest.mark.slow


def _rollout_pair(name, steps, ctrl_fn=None, atol=2e-2):
    path = f"{ROOT}/models/{name}"
    mj_model = mujoco.MjModel.from_xml_path(path)
    mj_data = mujoco.MjData(mj_model)
    model = load_model_from_file(path)

    d = make_data(model)
    stp = jax.jit(step)
    for _ in range(steps):
        if ctrl_fn is not None:
            mj_data.ctrl[:] = ctrl_fn(mj_data.qpos, mj_data.qvel)
        mujoco.mj_step(mj_model, mj_data)
    for _ in range(steps):
        if ctrl_fn is not None:
            ctrl = ctrl_fn(np.asarray(d.qpos), np.asarray(d.qvel))
            d = d.replace(ctrl=jnp.asarray(ctrl, jnp.float32))
        d = stp(model, d)
    np.testing.assert_allclose(d.qpos, mj_data.qpos, atol=atol, err_msg=f"{name} qpos")
    return model


def test_cartpole():
    model = _rollout_pair("cartpole/cartpole.xml", 200, ctrl_fn=lambda q, v: [0.3], atol=5e-3)
    assert model.nq == 2 and model.nu == 1


def test_arm3_frictionless_contact():
    model = _rollout_pair("arm3/arm3.xml", 300, atol=2e-2)
    assert model.nu == 3
    # frictionless condim-1 pair rows: 1 per contact slot
    assert int(model.skel.pair_condim.max()) == 1


def test_drop_scene():
    """Multi-object impact chains are chaotic (sphere orientations diverge
    between any two solvers); compare body POSITIONS over the first 0.6 s."""
    path = f"{ROOT}/models/objects/drop_scene.xml"
    mj_model = mujoco.MjModel.from_xml_path(path)
    mj_data = mujoco.MjData(mj_model)
    model = load_model_from_file(path)
    assert model.nbody == 5  # world + 4 free bodies
    assert model.skel.ncon > 4  # plane + object-object candidate pairs

    d = make_data(model)
    stp = jax.jit(step)
    # 0.3 s: through the first impacts; beyond that the pile's bounce chain
    # is chaotic (any two solvers diverge)
    for _ in range(150):
        mujoco.mj_step(mj_model, mj_data)
    for _ in range(150):
        d = stp(model, d)
    np.testing.assert_allclose(np.asarray(d.qpos), mj_data.qpos, atol=3e-2, err_msg="drop qpos")


def test_humanoid_pd_hold():
    """Humanoid under joint PD: contact-rich two-engine agreement through the
    first 0.45 s (the fall makes longer horizons chaotic)."""
    path = f"{ROOT}/models/humanoid/humanoid.xml"
    mj_model = mujoco.MjModel.from_xml_path(path)
    mj_data = mujoco.MjData(mj_model)
    model = load_model_from_file(path)

    def pd(q, v):
        return np.clip(200.0 * (0.0 - q[7:]) - 10.0 * v[6:], -100, 100)

    d = make_data(model)
    stp = jax.jit(step)
    steps = 150
    for _ in range(steps):
        mj_data.ctrl[:] = pd(mj_data.qpos, mj_data.qvel)
        mujoco.mj_step(mj_model, mj_data)
    for _ in range(steps):
        d = d.replace(ctrl=jnp.asarray(pd(np.asarray(d.qpos), np.asarray(d.qvel)), jnp.float32))
        d = stp(model, d)
    np.testing.assert_allclose(d.qpos[:3], mj_data.qpos[:3], atol=3e-2, err_msg="humanoid base pos")
    np.testing.assert_allclose(d.qpos[7:], mj_data.qpos[7:], atol=5e-2, err_msg="humanoid joints")


def test_quadruped_stand():
    path = f"{ROOT}/models/quadruped/quadruped.xml"
    mj_model = mujoco.MjModel.from_xml_path(path)
    mj_data = mujoco.MjData(mj_model)
    model = load_model_from_file(path)

    def pd(q, v):
        return 60.0 * (0.0 - q[7:]) - 2.0 * v[6:]

    d = make_data(model)
    stp = jax.jit(step)
    for _ in range(250):
        mj_data.ctrl[:] = pd(mj_data.qpos, mj_data.qvel)
        mujoco.mj_step(mj_model, mj_data)
    for _ in range(250):
        d = d.replace(ctrl=jnp.asarray(pd(np.asarray(d.qpos), np.asarray(d.qvel)), jnp.float32))
        d = stp(model, d)
    np.testing.assert_allclose(d.qpos, mj_data.qpos, atol=1e-2)
    assert float(d.qpos[2]) > 0.2  # still standing


def test_hand_mimic_grasp():
    """Barrett-class hand: mimic couplings + finger-palm capsule-box contacts
    (structure of reference bh280.xml: 8 joints, 4 actuators, 4 mimics)."""
    path = f"{ROOT}/models/hand/hand.xml"
    mj_model = mujoco.MjModel.from_xml_path(path)
    mj_data = mujoco.MjData(mj_model)
    model = load_model_from_file(path)
    assert model.njnt == 8 and model.nu == 4 and model.neq == 4

    mj_data.ctrl[:] = [0.3, 0.8, 0.8, 0.8]
    d = make_data(model).replace(ctrl=jnp.array([0.3, 0.8, 0.8, 0.8]))
    stp = jax.jit(step)
    for _ in range(400):
        mujoco.mj_step(mj_model, mj_data)
    for _ in range(400):
        d = stp(model, d)
    np.testing.assert_allclose(d.qpos, mj_data.qpos, atol=2e-3)
    # mimic ratio holds through contact
    q = np.asarray(d.qpos)
    names = list(model.skel.jnt_names)
    ratio = q[names.index("f1_dist")] / q[names.index("f1_prox")]
    np.testing.assert_allclose(ratio, 0.344, atol=5e-3)


def test_hand_predictive_sampling_smoke():
    """Jitted predictive sampling on the hand with contacts disabled, Newton
    solver, 1 iteration (mirrors reference tests/trajopt/
    test_predictive_sampler.py:17-57 on the Barrett hand)."""
    from ambersim_tpu.core.types import DisableBit
    from ambersim_tpu.trajopt import (
        StaticGoalQuadraticCost,
        VanillaPredictiveSampler,
        VanillaPredictiveSamplerParams,
    )

    model = load_model_from_file(f"{ROOT}/models/hand/hand.xml", solver="newton", iterations=1, ls_iterations=4)
    model = model.replace(opt=model.opt.replace(disableflags=model.opt.disableflags | DisableBit.CONTACT))
    nx = model.nq + model.nv
    cost = StaticGoalQuadraticCost(
        Q=0.1 * jnp.eye(nx), Qf=10.0 * jnp.eye(nx), R=0.001 * jnp.eye(model.nu),
        xg=jnp.zeros(nx).at[1].set(1.0),
    )
    ps = VanillaPredictiveSampler(model=model, cost_function=cost, nsamples=16, stdev=0.2)
    params = VanillaPredictiveSamplerParams(
        x0=jnp.zeros(nx), us_guess=jnp.zeros((10, model.nu)), rng=jax.random.PRNGKey(0)
    )
    xs, us = jax.jit(ps.optimize)(params)
    assert xs.shape == (11, nx) and np.isfinite(np.asarray(xs)).all()


def test_mesh_hand_grasp_parity():
    """Mesh-collision hand (convex-decomposed parts, VERDICT r1 #4): fingers
    close around a free mesh object; rollout parity vs the C engine through
    sustained mesh-mesh contact, mimic ratio held."""
    path = f"{ROOT}/models/hand/grasp_scene.xml"
    mj_model = mujoco.MjModel.from_xml_path(path)
    mj_data = mujoco.MjData(mj_model)
    model = load_model_from_file(path)
    assert model.njnt == 9 and model.nu == 4 and model.neq == 4
    assert model.skel.nmesh == 7  # 6 decomposed hand parts + object

    ctrl = np.array([0.0, 1.2, 1.2, 1.2])
    mj_data.ctrl[:] = ctrl
    d = make_data(model).replace(ctrl=jnp.asarray(ctrl))
    stp = jax.jit(step)
    for _ in range(300):
        mujoco.mj_step(mj_model, mj_data)
    for _ in range(300):
        d = stp(model, d)
    q = np.asarray(d.qpos)
    np.testing.assert_allclose(q[:8], mj_data.qpos[:8], atol=2e-2)  # hand joints
    np.testing.assert_allclose(q[8:11], mj_data.qpos[8:11], atol=2e-2)  # object pos
    # object held in the palm channel, not expelled
    assert 0.08 < float(q[10]) < 0.15
    # the soft mimic deviates from 0.344 under grasp load — but it must
    # deviate the same way the C oracle does
    names = list(model.skel.jnt_names)
    jid = lambda n: names.index(n)  # noqa: E731
    ratio = q[jid("f1_dist")] / q[jid("f1_prox")]
    ratio_c = mj_data.qpos[jid("f1_dist")] / mj_data.qpos[jid("f1_prox")]
    np.testing.assert_allclose(ratio, ratio_c, atol=5e-3)


def test_mesh_hand_predictive_sampling_smoke():
    """Predictive sampling on the mesh hand WITH mesh contacts enabled —
    the reference smoke test runs the Barrett hand with contacts disabled;
    the SAT narrowphase lets us keep them on."""
    from ambersim_tpu.trajopt import (
        StaticGoalQuadraticCost,
        VanillaPredictiveSampler,
        VanillaPredictiveSamplerParams,
    )

    model = load_model_from_file(
        f"{ROOT}/models/hand/hand_mesh.xml", solver="newton", iterations=1, ls_iterations=4
    )
    nx = model.nq + model.nv
    cost = StaticGoalQuadraticCost(
        Q=0.1 * jnp.eye(nx), Qf=10.0 * jnp.eye(nx), R=0.001 * jnp.eye(model.nu),
        xg=jnp.zeros(nx).at[1].set(1.0),
    )
    ps = VanillaPredictiveSampler(model=model, cost_function=cost, nsamples=8, stdev=0.2)
    params = VanillaPredictiveSamplerParams(
        x0=jnp.zeros(nx), us_guess=jnp.zeros((8, model.nu)), rng=jax.random.PRNGKey(0)
    )
    xs, us = jax.jit(ps.optimize)(params)
    assert xs.shape == (9, nx) and np.isfinite(np.asarray(xs)).all()
