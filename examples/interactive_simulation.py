"""Host-side interactive simulation with an energy-shaping + PD swingup
controller (reference: examples/interactive_simulation.py:15-77).

Physics runs in the native C++ host stepper (the role MuJoCo's C engine plays
for the reference). With --headless (or no display) the viewer is skipped and
the trajectory is printed; with mujoco + a display available, the passive
viewer is used for rendering only.
"""


# Allow running from a source checkout without pip install.
import os as _os, sys as _sys

_d = _os.path.dirname(_os.path.abspath(__file__))
while _d != "/" and not _os.path.isdir(_os.path.join(_d, "ambersim_tpu")):
    _d = _os.path.dirname(_d)
_sys.path.insert(0, _d)
import argparse
import time

import numpy as np

from ambersim_tpu.native import HostStepper
from ambersim_tpu.utils.io_utils import load_model_from_file

# pendulum physical constants (match models/pendulum/pendulum.xml)
MASS, LENGTH, GRAVITY = 1.0, 0.5, 9.81
INERTIA = 0.087959 + MASS * LENGTH**2


def swingup_controller(theta: float, theta_dot: float) -> float:
    """Energy shaping far from upright, PD capture near upright
    (reference interactive_simulation.py:15-45)."""
    err = np.mod(theta - np.pi, 2 * np.pi)
    err = err - 2 * np.pi if err > np.pi else err
    if abs(err) < 0.4:
        return float(np.clip(-8.0 * err - 1.5 * theta_dot, -2, 2))
    if abs(theta_dot) < 1e-3:
        return 2.0  # kick off the stable equilibrium
    energy = 0.5 * INERTIA * theta_dot**2 - MASS * GRAVITY * LENGTH * (1 + np.cos(theta))
    u = -1.5 * energy * theta_dot  # energy deficit -> torque along motion
    return float(np.clip(u, -2, 2))


def run_pendulum(headless: bool, duration: float) -> bool:
    model = load_model_from_file("models/pendulum/pendulum.xml")
    stepper = HostStepper(model)
    dt = float(model.opt.timestep)
    nsteps = int(duration / dt)

    t_start = time.time()
    for i in range(nsteps):
        qpos, qvel = stepper.get_state()
        u = swingup_controller(qpos[0], qvel[0])
        stepper.set_ctrl(np.array([u]))
        stepper.step(1)
        if not headless:
            # real-time pacing (reference interactive_simulation.py:74-76)
            lag = (i + 1) * dt - (time.time() - t_start)
            if lag > 0:
                time.sleep(lag)
        if i % int(0.5 / dt) == 0:
            print(f"t={i * dt:5.2f}s  theta={qpos[0]:+.3f}  theta_dot={qvel[0]:+.3f}  u={u:+.2f}")
    qpos, qvel = stepper.get_state()
    err = np.mod(qpos[0] - np.pi, 2 * np.pi)
    err = err - 2 * np.pi if err > np.pi else err
    print(f"final: theta error from upright = {err:+.4f} rad, theta_dot = {qvel[0]:+.4f}")
    ok = abs(err) < 0.1 and abs(qvel[0]) < 0.5
    print("swingup", "SUCCEEDED" if ok else "DID NOT CONVERGE")
    return ok


def run_model(path: str, headless: bool, duration: float) -> bool:
    """Interactively step any packaged model in the native host stepper with
    a PD hold toward qpos0 — the reference's interactive sim drives arbitrary
    contact-rich models the same way (reference
    interactive_simulation.py:57-71, mj_step)."""
    model = load_model_from_file(path)
    stepper = HostStepper(model)
    dt = float(model.opt.timestep)
    nsteps = int(duration / dt)
    qpos0 = np.asarray(model.qpos0, np.float64)
    has_free = model.nv == model.nu + 6  # free base + one actuator per dof
    kp, kd = 60.0, 2.0
    # Per-dof PD toward qpos0, mapped joint-by-joint: hinge/slide dofs pair
    # 1:1 with a qpos entry; free/ball rotational dofs have quaternion qpos
    # (nq != nv), so they get damping only (a proper attitude PD needs a
    # quaternion log map, which the hold-in-place demo doesn't need).
    skel = model.skel
    hs_dof = []  # (dofadr, qposadr) for hinge/slide joints
    damp_dof = []  # dofadr ranges for free/ball joints
    for t, qa, da in zip(skel.jnt_type, skel.jnt_qposadr, skel.jnt_dofadr):
        if t in (2, 3):  # SLIDE, HINGE
            hs_dof.append((int(da), int(qa)))
        else:  # FREE: 6 dofs, BALL: 3 dofs
            damp_dof.extend(range(int(da), int(da) + (6 if t == 0 else 3)))
    hs_d = np.array([d for d, _ in hs_dof], dtype=int)
    hs_q = np.array([q for _, q in hs_dof], dtype=int)

    def pd_ctrl(qpos, qvel):
        err = np.zeros(model.nv)
        if hs_d.size:
            err[hs_d] = qpos0[hs_q] - qpos[hs_q]
        u = kp * err - kd * qvel
        if damp_dof:
            u[damp_dof] = -kd * qvel[damp_dof]
        return u

    t_start = time.time()
    for i in range(nsteps):
        qpos, qvel = stepper.get_state()
        if has_free:
            u = kp * (qpos0[7:] - qpos[7:]) - kd * qvel[6:]
        else:
            u = pd_ctrl(qpos, qvel)
        stepper.set_ctrl(u[: model.nu])
        stepper.step(1)
        if not headless:
            lag = (i + 1) * dt - (time.time() - t_start)
            if lag > 0:
                time.sleep(lag)
        if i % max(int(0.5 / dt), 1) == 0:
            h = qpos[2] if has_free else 0.0
            print(f"t={i * dt:5.2f}s  base height={h:+.3f}  |qvel|={np.linalg.norm(qvel):.3f}")
    wall = time.time() - t_start
    qpos, qvel = stepper.get_state()
    print(
        f"final: base height={qpos[2] if has_free else 0.0:+.3f}, "
        f"|qvel|={np.linalg.norm(qvel):.3f}  ({nsteps / wall:,.0f} steps/s host)"
    )
    return bool(np.isfinite(qpos).all())


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--headless", action="store_true", default=True)
    p.add_argument("--duration", type=float, default=10.0)
    p.add_argument(
        "--model",
        default="models/quadruped/quadruped.xml",
        help="model path, or 'pendulum' for the energy-shaping swingup demo",
    )
    args = p.parse_args()
    if args.model == "pendulum":
        ok = run_pendulum(args.headless, args.duration)
    else:
        ok = run_model(args.model, args.headless, args.duration)
    raise SystemExit(0 if ok else 1)
