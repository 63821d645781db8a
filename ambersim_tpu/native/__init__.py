"""Native host-side components (C++ via ctypes).

`HostStepper` is the C++ reference stepper — the role MuJoCo's C engine plays
for the reference repo (interactive host simulation + an independent parity
oracle; SURVEY.md D2). Built on demand with g++; no pybind11 required.

Scope (stepper.cpp): trees of free/ball/hinge/slide joints with any number of
joints per moving body (jointless bodies are welded in here), joint limits
(incl. ball rotation limits), dof friction loss, and plane-vs-
sphere/capsule/box contacts with MuJoCo's soft constraint model, solved by
the same primal Newton iteration as the JAX engine — so contact-rich
flagship models (quadruped, humanoid) can be cross-checked against both the
JAX engine and MuJoCo C.
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
    lib.ambersim_create3.restype = ctypes.c_int
    lib.ambersim_create3.argtypes = (
        [ctypes.c_int] * 7
        + [dp, ip, dp]  # opt, body_int, body_real
        + [ip, dp]  # jnt_int, jnt_real
        + [dp, dp, dp]  # dof_real, qpos0, qpos_spring
        + [ip, dp]  # geom_int, geom_real
        + [ip, dp]  # pair_int, pair_real
        + [ip, dp]  # act_int, act_real
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

_SUPPORTED_JNT = (0, 1, 2, 3)  # free, ball, slide, hinge
_PLANE, _SPHERE, _CAPSULE, _BOX = 0, 2, 3, 6


def _jnt_widths(jt: int):
    """(qpos width, dof width) per joint type."""
    return {0: (7, 6), 1: (4, 3), 2: (1, 1), 3: (1, 1)}[jt]


class _ChainModel:
    """Host-side reduction of a Model to a tree of jointed bodies: jointless
    bodies are welded into their parents (mass properties combined via
    parallel-axis, geoms re-expressed in the parent frame), matching the
    dynamics exactly. Bodies may carry multiple joints (stacked hinges,
    free/ball roots)."""

    def __init__(self, model):
        s = model.skel
        if any(int(t) not in _SUPPORTED_JNT for t in s.jnt_type):
            raise NotImplementedError("HostStepper supports free/ball/hinge/slide joints only")
        if getattr(s, "ntendon", 0):
            raise NotImplementedError("HostStepper does not support tendons")
        if s.nu and (np.asarray(s.actuator_trntype) != 0).any():
            raise NotImplementedError("HostStepper supports joint transmissions only")

        f64 = lambda x: np.asarray(x, dtype=np.float64)  # noqa: E731
        parent = list(s.body_parentid)
        pos = [f64(model.body_pos[b]) for b in range(s.nbody)]
        quat = [f64(model.body_quat[b]) for b in range(s.nbody)]
        mass = [float(model.body_mass[b]) for b in range(s.nbody)]
        ipos = [f64(model.body_ipos[b]) for b in range(s.nbody)]
        iquat = [f64(model.body_iquat[b]) for b in range(s.nbody)]
        idiag = [f64(model.body_inertia[b]) for b in range(s.nbody)]
        jnts_of = [
            list(range(int(s.body_jntadr[b]), int(s.body_jntadr[b]) + int(s.body_jntnum[b])))
            if int(s.body_jntnum[b]) > 0
            else []
            for b in range(s.nbody)
        ]
        alive = [True] * s.nbody
        # geoms ride along through welds
        geom_body = list(s.geom_bodyid)
        geom_pos = [f64(model.geom_pos[g]) for g in range(s.ngeom)]
        geom_quat = [f64(model.geom_quat[g]) for g in range(s.ngeom)]

        def inertia_mat(b):
            r = _np_quat_to_mat(iquat[b])
            return r @ np.diag(idiag[b]) @ r.T

        # weld jointless bodies into parents, deepest first (DFS order => reverse)
        for b in range(s.nbody - 1, 0, -1):
            if jnts_of[b]:
                continue
            p = parent[b]
            rp = _np_quat_to_mat(quat[b])
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
            from ambersim_tpu.mjcf.parser import _np_mat_to_quat

            iquat[p] = _np_mat_to_quat(v)
            # reparent children of b to p with composed frames
            for c in range(s.nbody):
                if alive[c] and parent[c] == b:
                    pos[c] = pos[b] + rp @ pos[c]
                    quat[c] = _np_mul_quat(quat[b], quat[c])
                    parent[c] = p
            # geoms of b move to p, re-expressed in p's frame
            for g in range(s.ngeom):
                if geom_body[g] == b:
                    geom_pos[g] = pos[b] + rp @ geom_pos[g]
                    geom_quat[g] = _np_mul_quat(quat[b], geom_quat[g])
                    geom_body[g] = p
            alive[b] = False

        # reindex surviving bodies; flatten joints in reduced-body order
        newid = {}
        self.parent, self.pos, self.quat, self.mass = [], [], [], []
        self.ipos, self.iquat, self.idiag = [], [], []
        self.body_jntadr, self.body_jntnum = [], []
        self.jnt_ids, self.jnt_body = [], []  # original joint id, reduced body id
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
            self.body_jntadr.append(len(self.jnt_ids))
            self.body_jntnum.append(len(jnts_of[b]))
            for j in jnts_of[b]:
                self.jnt_ids.append(j)
                self.jnt_body.append(newid[b])
        self.parent[0] = 0
        self.nbody = len(self.parent)
        self.geom_body = [newid[b] for b in geom_body]
        self.geom_pos = geom_pos
        self.geom_quat = geom_quat


class HostStepper:
    """C++ full-pipeline stepper for free/ball/hinge/slide trees with plane
    contacts (sphere/capsule/box), dof friction loss, and joint limits.

    Built from an ambersim_tpu Model; set_state/get_state use the *original*
    model's qpos/qvel layout, so results compare directly against the JAX
    engine and MuJoCo C."""

    def __init__(self, model):
        s = model.skel
        chain = _ChainModel(model)
        lib = _load()
        f64 = lambda x: np.asarray(x, dtype=np.float64)  # noqa: E731

        jids = chain.jnt_ids  # original joint id per reduced joint
        njnt = len(jids)
        widths = [_jnt_widths(int(s.jnt_type[j])) for j in jids]
        qposadr, dofadr = [], []
        nq = nv = 0
        for wq, wv in widths:
            qposadr.append(nq)
            dofadr.append(nv)
            nq += wq
            nv += wv
        self.nq, self.nv = nq, nv

        # original-layout <-> reduced-layout index maps
        self._q_src = np.concatenate(
            [np.arange(int(s.jnt_qposadr[j]), int(s.jnt_qposadr[j]) + wq) for j, (wq, _) in zip(jids, widths)]
        ).astype(np.int64) if njnt else np.zeros(0, np.int64)
        self._v_src = np.concatenate(
            [np.arange(int(s.jnt_dofadr[j]), int(s.jnt_dofadr[j]) + wv) for j, (_, wv) in zip(jids, widths)]
        ).astype(np.int64) if njnt else np.zeros(0, np.int64)
        self.nq_orig = int(s.nq)
        self.nv_orig = int(s.nv)

        jnt_int = np.zeros((njnt, 5), np.int32)
        jnt_real = np.zeros((njnt, 17))
        dof_real = np.zeros((nv, 11))
        qpos0 = np.zeros(nq)
        qpos_spring = np.zeros(nq)
        for r, j in enumerate(jids):
            jt = int(s.jnt_type[j])
            jnt_int[r] = (
                jt,
                chain.jnt_body[r],
                qposadr[r],
                dofadr[r],
                int(s.jnt_limited[j]) if jt != 0 else 0,
            )
            jnt_real[r, 0:3] = f64(model.jnt_pos[j])
            jnt_real[r, 3:6] = f64(model.jnt_axis[j])
            jnt_real[r, 6] = float(model.jnt_stiffness[j])
            if jt != 0:
                jnt_real[r, 7:9] = f64(model.jnt_range[j])
            jnt_real[r, 9] = float(model.jnt_margin[j])
            jnt_real[r, 10:12] = f64(model.jnt_solref[j])
            jnt_real[r, 12:17] = f64(model.jnt_solimp[j])
            wv = widths[r][1]
            src = int(s.jnt_dofadr[j])
            for k in range(wv):
                dof_real[dofadr[r] + k, 0] = float(model.dof_damping[src + k])
                dof_real[dofadr[r] + k, 1] = float(model.dof_armature[src + k])
                dof_real[dofadr[r] + k, 2] = float(model.dof_invweight0[src + k])
                dof_real[dofadr[r] + k, 3] = float(model.dof_frictionloss[src + k])
                dof_real[dofadr[r] + k, 4:6] = f64(model.dof_solref[src + k])
                dof_real[dofadr[r] + k, 6:11] = f64(model.dof_solimp[src + k])
            wq = widths[r][0]
            src_q = int(s.jnt_qposadr[j])
            qpos0[qposadr[r] : qposadr[r] + wq] = np.asarray(model.qpos0)[src_q : src_q + wq]
            qpos_spring[qposadr[r] : qposadr[r] + wq] = np.asarray(model.qpos_spring)[
                src_q : src_q + wq
            ]

        # geoms (reduced body ids, weld-composed transforms)
        geom_int = np.zeros((s.ngeom, 2), np.int32)
        geom_real = np.zeros((s.ngeom, 10))
        for g in range(s.ngeom):
            geom_int[g] = (int(s.geom_type[g]), chain.geom_body[g])
            geom_real[g, 0:3] = chain.geom_pos[g]
            geom_real[g, 3:7] = chain.geom_quat[g]
            geom_real[g, 7:10] = f64(model.geom_size[g])

        # contact pairs: plane vs sphere/box from the compiled candidate list
        from ambersim_tpu.engine.collision import _mix_params

        pair_rows_int, pair_rows_real = [], []
        for p in range(s.npair):
            g1, g2 = int(s.pair_geom1[p]), int(s.pair_geom2[p])
            t1, t2 = int(s.geom_type[g1]), int(s.geom_type[g2])
            if t1 != _PLANE or t2 not in (_SPHERE, _CAPSULE, _BOX):
                raise NotImplementedError(
                    f"HostStepper contact support is plane-vs-sphere/capsule/box; model "
                    f"has a type-({t1},{t2}) pair"
                )
            exp = int(s.pair_explicit[p])
            if exp >= 0:
                friction = np.asarray(model.pair_friction[exp], np.float64)
                solref = np.asarray(model.pair_solref[exp], np.float64)
                solimp = np.asarray(model.pair_solimp[exp], np.float64)
                margin = float(model.pair_margin[exp])
                gap = float(model.pair_gap[exp])
            else:
                fr, srf, sim, mg, gp = _mix_params(model, np.array([g1]), np.array([g2]))
                friction = np.asarray(fr[0], np.float64)
                solref = np.asarray(srf[0], np.float64)
                solimp = np.asarray(sim[0], np.float64)
                margin = float(mg[0])
                gap = float(gp[0])
            b1, b2 = int(s.geom_bodyid[g1]), int(s.geom_bodyid[g2])
            invweight = float(model.body_invweight0[b1, 0]) + float(model.body_invweight0[b2, 0])
            pair_rows_int.append((g1, g2, int(s.pair_condim[p])))
            # includemargin is the mixed/explicit margin; gap is dynamically
            # inert (MuJoCo 3.10 semantics, matching engine/collision.py)
            pair_rows_real.append(
                np.concatenate([friction, solref, solimp, [margin, invweight]])
            )
        npair = len(pair_rows_int)
        pair_int = np.asarray(pair_rows_int, np.int32).reshape(npair, 3)
        pair_real = (
            np.stack(pair_rows_real) if npair else np.zeros((0, 14))
        )

        dof_of_jnt = {j: dofadr[r] for r, j in enumerate(jids)}
        act_int = np.asarray(
            [dof_of_jnt[int(s.actuator_trnid[u])] for u in range(s.nu)], np.int32
        )
        act_real = np.zeros((s.nu, 3))
        for u in range(s.nu):
            act_real[u, 0] = float(model.actuator_gear[u, 0])
            if bool(s.actuator_ctrllimited[u]):
                act_real[u, 1:3] = np.asarray(model.actuator_ctrlrange[u])
            else:
                act_real[u, 1:3] = (1.0, -1.0)  # lo > hi disables clamping

        opt = np.array(
            [
                float(model.opt.timestep),
                *[float(x) for x in np.asarray(model.opt.gravity)],
                float(model.opt.impratio),
                float(model.opt.tolerance),
                float(int(model.opt.iterations)),
                float(int(model.opt.ls_iterations)),
                float(np.sum(np.asarray(model.body_mass))),
            ]
        )

        body_int = np.stack(
            [
                np.asarray(chain.parent, np.int32),
                np.asarray(chain.body_jntadr, np.int32),
                np.asarray(chain.body_jntnum, np.int32),
            ],
            axis=1,
        )
        got_nv = lib.ambersim_create3(
            int(chain.nbody),
            int(njnt),
            int(nq),
            int(nv),
            int(s.nu),
            int(s.ngeom),
            int(npair),
            _dp(opt),
            _ip(body_int),
            _dp(
                np.concatenate(
                    [
                        np.stack(chain.pos),
                        np.stack(chain.quat),
                        np.stack(chain.ipos),
                        np.stack(chain.iquat),
                        np.asarray(chain.mass)[:, None],
                        np.stack(chain.idiag),
                    ],
                    axis=1,
                )
            ),
            _ip(jnt_int),
            _dp(jnt_real),
            _dp(dof_real),
            _dp(qpos0),
            _dp(qpos_spring),
            _ip(geom_int),
            _dp(geom_real),
            _ip(pair_int),
            _dp(pair_real),
            _ip(act_int),
            _dp(act_real),
        )
        assert got_nv == nv
        self._lib = lib
        self.nu = int(s.nu)

    def set_state(self, qpos: np.ndarray, qvel: np.ndarray) -> None:
        """qpos/qvel in the ORIGINAL model layout."""
        q = np.asarray(qpos, np.float64)[self._q_src]
        v = np.asarray(qvel, np.float64)[self._v_src]
        self._lib.ambersim_set_state(_dp(q), _dp(v))

    def set_ctrl(self, ctrl: np.ndarray) -> None:
        self._lib.ambersim_set_ctrl(_dp(np.asarray(ctrl)))

    def step(self, nsteps: int = 1) -> None:
        self._lib.ambersim_step(int(nsteps))

    def get_state(self):
        """Returns (qpos, qvel) in the ORIGINAL model layout."""
        q = np.zeros(self.nq)
        v = np.zeros(self.nv)
        self._lib.ambersim_get_state(_dp(q), _dp(v))
        qpos = np.zeros(self.nq_orig)
        qvel = np.zeros(self.nv_orig)
        qpos[self._q_src] = q
        qvel[self._v_src] = v
        return qpos, qvel
