"""Native host-side components (C++ via ctypes).

`HostStepper` is the C++ reference stepper — the role MuJoCo's C engine plays
for the reference repo (interactive host simulation + an independent parity
oracle; SURVEY.md D2). Built on demand with g++; no pybind11 required.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "stepper.cpp")

_lib: Optional[ctypes.CDLL] = None


def _lib_path() -> str:
    """Artifact path keyed by source content hash: binaries are never
    committed (gitignored) and a stale or foreign .so can never load."""
    import hashlib

    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(os.path.dirname(__file__), f"_stepper-{digest}.so")


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    path = _lib_path()
    if not os.path.exists(path):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", path],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(path)
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)
    lib.ambersim_create.restype = ctypes.c_int
    lib.ambersim_create.argtypes = (
        [ctypes.c_int, ctypes.c_int, ctypes.c_double]
        + [dp, ip]
        + [dp] * 6  # body_pos, body_quat, body_ipos, body_iquat, mass, inertia
        + [ip]  # jnt_type
        + [dp] * 7  # jnt_pos, jnt_axis, stiffness, springref, damping, armature, qpos0
        + [ip]  # act_joint
        + [dp] * 2  # gear, ctrlrange
    )
    lib.ambersim_set_state.argtypes = [dp, dp]
    lib.ambersim_set_ctrl.argtypes = [dp]
    lib.ambersim_step.argtypes = [ctypes.c_int]
    lib.ambersim_get_state.argtypes = [dp, dp]
    _lib = lib
    return lib


def _dp(a: np.ndarray):
    return np.ascontiguousarray(a, dtype=np.float64).ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _ip(a: np.ndarray):
    return np.ascontiguousarray(a, dtype=np.int32).ctypes.data_as(ctypes.POINTER(ctypes.c_int))


from ambersim_tpu.mjcf.parser import _np_mul_quat, _np_quat_to_mat  # noqa: E402


class _ChainModel:
    """Host-side reduction of a Model to a 1-dof-joint-per-body chain:
    jointless bodies are welded into their parents (mass properties combined
    via parallel-axis), matching the dynamics exactly."""

    def __init__(self, model):
        s = model.skel
        if any(int(t) not in (2, 3) for t in s.jnt_type):
            raise NotImplementedError("HostStepper supports hinge/slide joints only")
        for b in range(1, s.nbody):
            if int(s.body_jntnum[b]) > 1:
                raise NotImplementedError("HostStepper requires at most one joint per body")

        f64 = lambda x: np.asarray(x, dtype=np.float64)  # noqa: E731
        parent = list(s.body_parentid)
        pos = [f64(model.body_pos[b]) for b in range(s.nbody)]
        quat = [f64(model.body_quat[b]) for b in range(s.nbody)]
        mass = [float(model.body_mass[b]) for b in range(s.nbody)]
        ipos = [f64(model.body_ipos[b]) for b in range(s.nbody)]
        iquat = [f64(model.body_iquat[b]) for b in range(s.nbody)]
        idiag = [f64(model.body_inertia[b]) for b in range(s.nbody)]
        jnt_of = [
            int(s.body_jntadr[b]) if int(s.body_jntnum[b]) == 1 else -1 for b in range(s.nbody)
        ]
        alive = [True] * s.nbody

        def inertia_mat(b):
            r = _np_quat_to_mat(iquat[b])
            return r @ np.diag(idiag[b]) @ r.T

        # weld jointless bodies into parents, deepest first (DFS order => reverse)
        for b in range(s.nbody - 1, 0, -1):
            if jnt_of[b] >= 0:
                continue
            p = parent[b]
            rp = _np_quat_to_mat(quat[b])
            # child com and inertia in parent frame
            com_c = pos[b] + rp @ ipos[b]
            inr_c = rp @ inertia_mat(b) @ rp.T
            m_c, m_p = mass[b], mass[p]
            m_new = m_c + m_p
            com_p = ipos[p]
            com_new = (m_c * com_c + m_p * com_p) / max(m_new, 1e-12)

            def shifted(inr, m, c):
                r = c - com_new
                return inr + m * (np.dot(r, r) * np.eye(3) - np.outer(r, r))

            inr_new = shifted(inertia_mat(p), m_p, com_p) + shifted(inr_c, m_c, com_c)
            w, v = np.linalg.eigh(inr_new)
            order = np.argsort(w)[::-1]
            w, v = w[order], v[:, order]
            if np.linalg.det(v) < 0:
                v[:, 2] *= -1
            mass[p] = m_new
            ipos[p] = com_new
            idiag[p] = w
            # iquat from rotation matrix
            from ambersim_tpu.mjcf.parser import _np_mat_to_quat

            iquat[p] = _np_mat_to_quat(v)
            # reparent children of b to p with composed frames
            for c in range(s.nbody):
                if alive[c] and parent[c] == b:
                    pos[c] = pos[b] + rp @ pos[c]
                    quat[c] = _np_mul_quat(quat[b], quat[c])
                    parent[c] = p
            alive[b] = False

        # reindex surviving bodies
        newid = {}
        self.parent, self.pos, self.quat, self.mass = [], [], [], []
        self.ipos, self.iquat, self.idiag, self.jnt = [], [], [], []
        for b in range(s.nbody):
            if not alive[b]:
                continue
            newid[b] = len(self.parent)
            self.parent.append(newid[parent[b]] if b > 0 else -1)
            self.pos.append(pos[b])
            self.quat.append(quat[b])
            self.mass.append(mass[b])
            self.ipos.append(ipos[b])
            self.iquat.append(iquat[b])
            self.idiag.append(idiag[b])
            self.jnt.append(jnt_of[b])
        self.parent[0] = 0
        # joint j of reduced body i must be joint i-1 in reduced ordering
        self.jnt_ids = [j for j in self.jnt[1:]]
        self.nbody = len(self.parent)


class HostStepper:
    """C++ smooth-dynamics stepper for hinge/slide kinematic chains.

    Built from an ambersim_tpu Model; jointless bodies are welded into their
    parents first, so pendulum/cartpole/arm class models (with static base or
    tip bodies) work directly."""

    def __init__(self, model):
        s = model.skel
        chain = _ChainModel(model)
        lib = _load()
        f64 = lambda x: np.asarray(x, dtype=np.float64)  # noqa: E731

        jids = chain.jnt_ids  # original joint id per reduced dof
        nv = len(jids)
        jnt_type = np.asarray([int(s.jnt_type[j]) for j in jids], np.int32)
        jnt_pos = np.stack([f64(model.jnt_pos[j]) for j in jids]) if nv else np.zeros((0, 3))
        jnt_axis = np.stack([f64(model.jnt_axis[j]) for j in jids]) if nv else np.zeros((0, 3))
        jnt_stiffness = np.asarray([float(model.jnt_stiffness[j]) for j in jids])
        jnt_springref = np.asarray([float(model.qpos_spring[int(s.jnt_qposadr[j])]) for j in jids])
        damping = np.asarray([float(model.dof_damping[int(s.jnt_dofadr[j])]) for j in jids])
        armature = np.asarray([float(model.dof_armature[int(s.jnt_dofadr[j])]) for j in jids])
        qpos0 = np.asarray([float(model.qpos0[int(s.jnt_qposadr[j])]) for j in jids])
        self._dof_of_jnt = {j: i for i, j in enumerate(jids)}

        act_joint = np.asarray(
            [self._dof_of_jnt[int(s.actuator_trnid[u])] for u in range(s.nu)], np.int32
        )
        gear = f64(model.actuator_gear[:, 0]) if s.nu else np.zeros(0)
        ctrlrange = np.zeros((s.nu, 2))
        for u in range(s.nu):
            if bool(s.actuator_ctrllimited[u]):
                ctrlrange[u] = np.asarray(model.actuator_ctrlrange[u])
            else:
                ctrlrange[u] = (1.0, -1.0)  # lo > hi disables clamping

        self.nv = lib.ambersim_create(
            int(chain.nbody),
            int(s.nu),
            float(model.opt.timestep),
            _dp(f64(model.opt.gravity)),
            _ip(np.asarray(chain.parent, np.int32)),
            _dp(np.stack(chain.pos)),
            _dp(np.stack(chain.quat)),
            _dp(np.stack(chain.ipos)),
            _dp(np.stack(chain.iquat)),
            _dp(np.asarray(chain.mass)),
            _dp(np.stack(chain.idiag)),
            _ip(jnt_type),
            _dp(jnt_pos),
            _dp(jnt_axis),
            _dp(jnt_stiffness),
            _dp(jnt_springref),
            _dp(damping),
            _dp(armature),
            _dp(qpos0),
            _ip(act_joint),
            _dp(gear),
            _dp(ctrlrange),
        )
        self._lib = lib
        self.nu = int(s.nu)

    def set_state(self, qpos: np.ndarray, qvel: np.ndarray) -> None:
        self._lib.ambersim_set_state(_dp(np.asarray(qpos)), _dp(np.asarray(qvel)))

    def set_ctrl(self, ctrl: np.ndarray) -> None:
        self._lib.ambersim_set_ctrl(_dp(np.asarray(ctrl)))

    def step(self, nsteps: int = 1) -> None:
        self._lib.ambersim_step(int(nsteps))

    def get_state(self):
        qpos = np.zeros(self.nv)
        qvel = np.zeros(self.nv)
        self._lib.ambersim_get_state(_dp(qpos), _dp(qvel))
        return qpos, qvel
