"""Randomized-model fuzz parity vs the MuJoCo C oracle.

Random kinematic chains (hinge/slide/ball/free joints; sphere/capsule/box
geoms; random inertias, damping, springs, joint limits, motors; optional
floor) are compiled by BOTH engines and compared: forward dynamics at the
initial state, then a rollout through gentle floor impacts. Mirrors the
reference's cross-engine oracle discipline (SURVEY.md §4) at the breadth a
hand-written scene list can't reach.

Free-based scenes are dropped with ~2 cm clearance above the floor
(interpenetrated inits produce physically-correct but chaotic trajectories
whose engine-to-engine error says nothing about correctness; both engines
agree per-step to fp32 there).
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


def random_model_xml(seed, base_z=1.0, cone=None, condim=None, impratio=None):
    """Random kinematic chain: 2-4 bodies, mixed joint types, mixed geoms,
    optional floor + free base, random inertial/actuation parameters.

    `cone`/`condim`/`impratio` pin the friction-cone configuration (elliptic
    sweeps); condim is applied uniformly so elliptic models compile to the
    single-condim contiguous tail the fused kernel dispatches on."""
    rng = np.random.default_rng(seed)
    nbody = int(rng.integers(2, 5))
    floor = bool(rng.random() < 0.5)
    if cone is not None:
        floor = True  # cone sweeps need contacts to exercise anything
    free_base = floor and bool(rng.random() < 0.5)
    # elliptic sweeps run both engines at higher solver effort: at 8/10 the
    # C oracle's own improvement test can stop after ONE iteration on impact
    # states (observed solver_niter=1 with its cost 40x above the shared
    # optimum — verified via mj_constraintUpdate), and comparing a converged
    # solve against an under-converged one measures tolerance artifacts,
    # not correctness
    it, ls = (8, 10) if cone is None else (20, 15)
    opt = f'<option timestep="0.002" iterations="{it}" ls_iterations="{ls}"'
    if cone is not None:
        opt += f' cone="{cone}"'
    if impratio is not None:
        opt += f' impratio="{impratio}"'
    lines = [
        "<mujoco>" + opt + "/>",
        '<compiler angle="radian"/>',
        "<worldbody>",
    ]
    def contact_attrs():
        """Random contact-parameter mixing inputs (margin/gap/priority/solmix/
        friction/solref) — the axes where mj_contactParam semantics live
        (margins ADD in MuJoCo 3.10, gap is inert, priority overrides mixing)."""
        a = ""
        if rng.random() < 0.4:
            margin = rng.uniform(0.0, 0.008)
            a += f' margin="{margin:.4f}"'
            if rng.random() < 0.5:
                a += f' gap="{rng.uniform(0.0, margin):.4f}"'
        if rng.random() < 0.3:
            a += f' priority="{int(rng.integers(0, 2))}"'
        if rng.random() < 0.3:
            a += f' solmix="{rng.uniform(0.2, 4.0):.2f}"'
        if rng.random() < 0.4:
            f3 = rng.uniform([0.3, 0.001, 0.0], [1.5, 0.01, 0.0003])
            a += f' friction="{f3[0]:.3f} {f3[1]:.4f} {f3[2]:.5f}"'
        if rng.random() < 0.3:
            a += f' solref="{rng.uniform(0.015, 0.04):.4f} {rng.uniform(0.9, 1.1):.2f}"'
        if condim is not None:
            a += f' condim="{condim}"'
            if condim >= 4 and "friction=" not in a:
                # make torsional (and rolling, condim 6) friction bite
                a += f' friction="1.0 {rng.uniform(0.002, 0.02):.4f} {rng.uniform(0.0001, 0.001):.5f}"'
        return a

    if floor:
        lines.append(f'<geom name="floor" type="plane" size="0 0 1"{contact_attrs()}/>')
    actuators = []
    depth = 0
    for b in range(nbody):
        pos = rng.uniform(-0.05, 0.05, 3)
        if b == 0:
            pos = np.array([0.0, 0.0, base_z if floor else 0.0])
        else:
            pos[2] = -rng.uniform(0.15, 0.3)
        lines.append(f'<body name="b{b}" pos="{pos[0]:.3f} {pos[1]:.3f} {pos[2]:.3f}">')
        depth += 1
        if b == 0 and free_base:
            lines.append("<freejoint/>")
        else:
            jt = rng.choice(["hinge", "slide", "ball"], p=[0.6, 0.25, 0.15])
            axis = rng.standard_normal(3)
            axis /= np.linalg.norm(axis)
            damping = rng.uniform(0.0, 0.4)
            stiffness = rng.uniform(0.0, 2.0) if rng.random() < 0.4 else 0.0
            if jt == "ball":
                lines.append(f'<joint name="j{b}" type="ball" damping="{damping:.3f}"/>')
            else:
                rngstr = ""
                if rng.random() < 0.4:
                    lo, hi = sorted(rng.uniform(-1.0, 1.0, 2))
                    rngstr = f' range="{lo:.3f} {hi:.3f}" limited="true"'
                lines.append(
                    f'<joint name="j{b}" type="{jt}" axis="{axis[0]:.3f} {axis[1]:.3f} {axis[2]:.3f}"'
                    f' damping="{damping:.3f}" stiffness="{stiffness:.3f}"{rngstr}/>'
                )
                if rng.random() < 0.7:
                    actuators.append(f'<motor joint="j{b}" gear="{rng.uniform(0.5, 2.0):.2f}"/>')
        gt = rng.choice(["sphere", "capsule", "box"])
        size = rng.uniform(0.04, 0.12)
        if gt == "sphere":
            g = f'<geom type="sphere" size="{size:.3f}"'
        elif gt == "capsule":
            g = f'<geom type="capsule" fromto="0 0 0 0 0 {-rng.uniform(0.1, 0.25):.3f}" size="{size:.3f}"'
        else:
            s2 = rng.uniform(0.04, 0.1, 3)
            g = f'<geom type="box" size="{s2[0]:.3f} {s2[1]:.3f} {s2[2]:.3f}"'
        g += f' density="{rng.uniform(300, 2000):.0f}"{contact_attrs()}/>'
        lines.append(g)
    lines.extend(["</body>"] * depth)
    lines.append("</worldbody>")
    if actuators:
        lines.append("<actuator>" + "".join(actuators) + "</actuator>")
    lines.append("</mujoco>")
    return "\n".join(lines)


def _build_pair(seed, **kw):
    """Compile the seed's model in both engines, floor clearance ~2 cm."""
    xml = random_model_xml(seed, **kw)
    mj_model = mujoco.MjModel.from_xml_string(xml)
    if mj_model.ngeom and mj_model.nv and int(mj_model.geom_type[0]) == int(mujoco.mjtGeom.mjGEOM_PLANE):
        # measure the chain's lowest bounding point at qpos0, re-generate
        # with the base shifted to leave ~2 cm of clearance
        mj_data = mujoco.MjData(mj_model)
        mujoco.mj_forward(mj_model, mj_data)
        low = (mj_data.geom_xpos[1:, 2] - mj_model.geom_rbound[1:]).min()
        xml = random_model_xml(seed, base_z=1.0 - low + 0.02, **kw)
        mj_model = mujoco.MjModel.from_xml_string(xml)
    m = set_constants(compile_spec(parse_mjcf_string(xml)))
    return mj_model, m


def _run_case(seed, nsteps, **kw):
    mj_model, m = _build_pair(seed, **kw)
    rng = np.random.default_rng(seed + 1000)
    ctrl = rng.uniform(-0.5, 0.5, mj_model.nu)
    qvel0 = 0.2 * rng.standard_normal(mj_model.nv)

    mj_data = mujoco.MjData(mj_model)
    mj_data.qvel[:] = qvel0
    mj_data.ctrl[:] = ctrl
    d = make_data(m).replace(qvel=jnp.asarray(qvel0, jnp.float32), ctrl=jnp.asarray(ctrl, jnp.float32))

    # forward-dynamics parity at the initial state (scale-relative: springs +
    # motors can make qacc O(10))
    mujoco.mj_forward(mj_model, mj_data)
    df = jax.jit(lambda d: forward(m, d))(d)
    scale = max(1.0, float(np.abs(mj_data.qacc).max()))
    np.testing.assert_allclose(
        np.asarray(df.qacc), mj_data.qacc, atol=2e-3 * scale, err_msg=f"seed {seed} qacc"
    )
    # constraint-force parity, row-order-free: qfrc_constraint = J^T @ efc_force
    fscale = max(1.0, float(np.abs(mj_data.qfrc_constraint).max()))
    np.testing.assert_allclose(
        np.asarray(df.qfrc_constraint),
        mj_data.qfrc_constraint,
        atol=5e-3 * fscale,
        err_msg=f"seed {seed} qfrc_constraint",
    )

    # trajectory parity through gentle impacts
    ref = []
    for _ in range(nsteps):
        mujoco.mj_step(mj_model, mj_data)
        ref.append(mj_data.qpos.copy())
    ref = np.stack(ref)

    @jax.jit
    def roll(d):
        def f(d, _):
            d = step(m, d)
            return d, d.qpos

        return jax.lax.scan(f, d, None, length=nsteps)[1]

    qs = np.asarray(roll(d))
    err = np.abs(qs - ref).max()
    # elliptic tolerates 2x the pyramidal drift: on warmstarted impact
    # states the C oracle's improvement-based termination stops after ONE
    # Newton iteration while this solver keeps iterating — evaluating the
    # oracle's OWN cost (mj_constraintUpdate + smooth term) at both
    # solutions shows ours strictly lower (e.g. 843.6 vs 947.4 at the worst
    # fuzz state), so the gap is oracle early-termination, not our physics.
    # The per-state force law matches the oracle exactly (probed over
    # condim 3/4/6 x impratio 1/4 slide/spin/mixed states).
    tol = 1e-2 if kw.get("cone") == "elliptic" else 5e-3
    assert err < tol, f"seed {seed}: rollout err {err:.2e}\n{random_model_xml(seed, **kw)}"


# 4 seeds in the default suite (~25 s compile each on 1 CPU); the wide sweep
# is behind the slow marker
@pytest.mark.parametrize("seed", [1, 2, 3, 10])
def test_fuzz_parity(seed):
    _run_case(seed, nsteps=50)


@pytest.mark.slow
@pytest.mark.parametrize("seed", list(range(24)))
def test_fuzz_parity_wide(seed):
    _run_case(seed, nsteps=100)


# ---- elliptic-cone sweep (the recommended fast path deserves the same
# randomized oracle coverage as pyramidal; condim 1/3/4/6 x impratio) ----


@pytest.mark.parametrize("seed,condim,impratio", [(1, 3, 1.0), (3, 4, 4.0)])
def test_fuzz_parity_elliptic(seed, condim, impratio):
    _run_case(seed, nsteps=50, cone="elliptic", condim=condim, impratio=impratio)


@pytest.mark.slow
@pytest.mark.parametrize("impratio", [1.0, 4.0])
@pytest.mark.parametrize("condim", [1, 3, 4, 6])
@pytest.mark.parametrize("seed", [0, 1, 2, 3, 5, 7])
def test_fuzz_parity_elliptic_wide(seed, condim, impratio):
    _run_case(seed, nsteps=100, cone="elliptic", condim=condim, impratio=impratio)


@pytest.mark.slow
def test_fuzz_elliptic_fused_kernel_interpret():
    """Route a fuzz-generated elliptic model through the fused elliptic Pallas
    kernel in interpret mode (contiguous single-condim tail), pinning the
    kernel against the jnp elliptic primal on random states."""
    from test_newton_pallas import _run_elliptic_parity

    _, m = _build_pair(1, cone="elliptic", condim=3, impratio=1.0)
    _run_elliptic_parity(m)
