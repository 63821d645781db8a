"""Constraint assembly: equality, dof friction, joint limits, contacts
-> dense efc rows (J, D, aref, pos, active).

Replaces MJX's make_constraint in the reference's pipeline (SURVEY.md §3.4
"constraint assembly: contacts (pyramidal cone), joint limits, equality").
Conventions were extracted from the MuJoCo C oracle and are parity-tested
row-by-row (tests/test_constraint_parity.py):

  * impedance: solimp=(d0,dmax,width,mid,power) sigmoid on |pos-margin|/width
  * aref = -b*(J qvel) - k*imp*(pos - margin), b = 2/(dmax*tc),
    k = 1/(dmax^2*tc^2*dr^2) for standard solref (tc, dr); direct for <=0
  * R = max(eps, (1-imp)/imp * diagApprox), D = 1/R
  * pyramidal contact rows: J = Jn +- mu_i * Jt_i,
    diagApprox = 2*mu0^2*(1+mu0^2)*invweight/impratio;
    frictionless (condim=1) rows: diagApprox = invweight (no impratio)
  * limits: one row per limited joint, J=+1 near lower bound / -1 near upper

Everything is fixed-shape: rows exist for every potential constraint and are
gated by efc_active (TPU-friendly masking instead of dynamic row counts).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ambersim_tpu.core import math as am
from ambersim_tpu.core.types import Data, DisableBit, EqType, JointType, Model

_MINVAL = 1e-10
_MINIMP = 0.0001
_MAXIMP = 0.9999


def _impedance(solimp: jax.Array, pos: jax.Array) -> jax.Array:
    """MuJoCo impedance sigmoid. solimp (..., 5), pos (...,)."""
    d0, dmax, width, mid, power = (solimp[..., i] for i in range(5))
    x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, _MINVAL), 0.0, 1.0)
    mid = jnp.clip(mid, _MINIMP, _MAXIMP)
    power = jnp.maximum(power, 1.0)
    a = 1.0 / jnp.power(mid, power - 1.0)
    b = 1.0 / jnp.power(1.0 - mid, power - 1.0)
    y = jnp.where(x < mid, a * jnp.power(x, power), 1.0 - b * jnp.power(1.0 - x, power))
    return jnp.clip(d0 + y * (dmax - d0), _MINIMP, _MAXIMP)


def _kbi(m: Model, solref: jax.Array, solimp: jax.Array, pos: jax.Array):
    """Stiffness/damping/impedance per row. solref (...,2)."""
    imp = _impedance(solimp, pos)
    tc, dr = solref[..., 0], solref[..., 1]
    if not (m.opt.disableflags & DisableBit.REFSAFE):
        tc = jnp.maximum(tc, 2.0 * m.opt.timestep)
    dmax = jnp.clip(solimp[..., 1], _MINIMP, _MAXIMP)
    b_std = 2.0 / (dmax * jnp.maximum(tc, _MINVAL))
    k_std = 1.0 / jnp.maximum(dmax * dmax * tc * tc * dr * dr, _MINVAL)
    # direct convention: solref <= 0 means (-k, -b)
    direct = (solref[..., 0] <= 0) & (solref[..., 1] <= 0)
    k = jnp.where(direct, -solref[..., 0] / jnp.maximum(dmax * dmax, _MINVAL), k_std)
    b = jnp.where(direct, -solref[..., 1] / jnp.maximum(dmax, _MINVAL), b_std)
    return k, b, imp


_CACHE: dict = {}


class PyramidStructure(NamedTuple):
    """Static factored layout of the pyramidal efc rows (consumed by the
    structured Newton kernel in ops/newton_pallas.py).

    Row families, classified by replaying make_constraint's static row walk:
      * dense rows  — no exploitable structure (equality, tendon friction,
        ball/tendon limits, frictionless condim-1 contact rows)
      * one-hot rows — J = s * e_dof with a static dof and dynamic sign
        (dof friction, scalar joint limits): diagonal Hessian updates
      * condim-3 pyramid blocks — rows [N+U1, N-U1, N+U2, N-U2] with
        U_k = mu_k * T_k, so the basis [N, U1, U2] is recoverable from the
        assembled rows by half sums/differences; the Gram contribution is
        B^T S B with a 5-coefficient S per contact (3 basis rows instead of
        4 dense rows, and no J*h buffer)

    `perm` maps kernel row order [dense | one-hot | N+U1* | N-U1* | N+U2* |
    N-U2*] (contact rows grouped by pyramid direction so the kernel slices
    contiguously) to MuJoCo row order; `is_fric`/`one_sided` are the row-type
    masks in kernel order."""

    nd: int
    ndiag: int
    ncon3: int
    # family-segment boundaries in kernel order (rows are contiguous by
    # construction: eq | tendon-friction | dense one-sided | one-hot friction
    # | one-hot limits | contacts) — the kernel rebuilds row-type masks from
    # iota with these, since Pallas kernels cannot close over array constants
    nd_eq: int  # dense equality rows (two-sided quadratic)
    nd_ft: int  # dense tendon-friction rows (Huber)
    nfd: int  # one-hot dof-friction rows (Huber); remaining one-hot = limits
    dense_rows: np.ndarray  # (nd,) MuJoCo row ids
    diag_rows: np.ndarray  # (ndiag,)
    diag_dofs: np.ndarray  # (ndiag,)
    adr3: np.ndarray  # (ncon3,) first MuJoCo row of each condim-3 block
    perm: np.ndarray  # (nefc,) kernel row -> MuJoCo row
    inv_perm: np.ndarray  # (nefc,) MuJoCo row -> kernel row
    is_fric: np.ndarray  # (nefc, 1) float32, kernel order (Huber rows)
    one_sided: np.ndarray  # (nefc, 1) float32, kernel order


def _row_families(s):
    """(family, dof) per non-contact MuJoCo efc row, mirroring
    make_constraint's assembly order exactly."""
    rows = []
    eq_rows = {EqType.JOINT: 1, EqType.TENDON: 1, EqType.CONNECT: 3, EqType.WELD: 6}
    for e in range(s.neq):
        rows += [("eq", -1)] * eq_rows[EqType(int(s.eq_type[e]))]
    for dof in s.friction_dofid:
        rows.append(("fric_dof", int(dof)))
    for _ in getattr(s, "friction_tenid", ()):
        rows.append(("fric_ten", -1))
    for j in s.limit_jntid:
        if int(s.jnt_type[j]) == int(JointType.BALL):
            rows.append(("lim_dense", -1))
        else:
            rows.append(("lim_dof", int(s.jnt_dofadr[j])))
    for _ in getattr(s, "limit_tenid", ()):
        rows.append(("lim_dense", -1))
    return rows


def _pyramid_structure(s) -> "PyramidStructure | None":
    """Static factored row layout, or None when the model doesn't qualify
    (elliptic handled elsewhere; condim 4/6 pyramid blocks keep the dense
    kernel)."""
    key = (s, "pyr_struct")
    if key in _CACHE:
        return _CACHE[key]

    def build():
        if s.nefc == 0 or s.ncon == 0:
            return None
        con_dim = np.asarray(s.con_dim)
        if not np.all(np.isin(con_dim, (1, 3))) or not np.any(con_dim == 3):
            return None
        fams = _row_families(s)
        # the skeleton's efc layout must actually be the pyramidal one
        # (1 row for condim 1, 2*(cdim-1) otherwise): elliptic-compiled
        # skeletons lay out condim-3 contacts as 3 rows and do not factor
        rows_per = np.where(con_dim == 1, 1, 2 * (con_dim - 1))
        expected_adr = len(fams) + np.concatenate([[0], np.cumsum(rows_per[:-1])])
        if s.nefc != len(fams) + int(rows_per.sum()) or not np.array_equal(
            np.asarray(s.con_efcadr), expected_adr
        ):
            return None
        dense, dense_fam, diag_rows, diag_dofs, diag_fam = [], [], [], [], []
        for i, (fam, dof) in enumerate(fams):
            if fam in ("fric_dof", "lim_dof"):
                diag_rows.append(i)
                diag_dofs.append(dof)
                diag_fam.append(fam)
            else:
                dense.append(i)
                dense_fam.append(fam)
        adr = np.asarray(s.con_efcadr)
        for c in np.nonzero(con_dim == 1)[0]:
            dense.append(int(adr[c]))
            dense_fam.append("con1")
        adr3 = adr[np.nonzero(con_dim == 3)[0]]
        ncon3 = len(adr3)
        perm = np.concatenate(
            [
                np.asarray(dense, np.int64),
                np.asarray(diag_rows, np.int64),
                adr3 + 0,
                adr3 + 1,
                adr3 + 2,
                adr3 + 3,
            ]
        ).astype(np.int64)
        assert perm.shape == (s.nefc,) and np.array_equal(np.sort(perm), np.arange(s.nefc))
        inv_perm = np.argsort(perm)
        fam_k = dense_fam + diag_fam + ["con"] * (4 * ncon3)
        is_fric = np.asarray(
            [f in ("fric_dof", "fric_ten") for f in fam_k], np.float32
        )[:, None]
        one_sided = np.asarray(
            [f in ("lim_dof", "lim_dense", "con1", "con") for f in fam_k], np.float32
        )[:, None]
        # family segments must be contiguous in kernel order (the kernel
        # rebuilds the masks from these boundaries)
        nd_eq = dense_fam.count("eq")
        nd_ft = dense_fam.count("fric_ten")
        nfd = diag_fam.count("fric_dof")
        assert dense_fam == ["eq"] * nd_eq + ["fric_ten"] * nd_ft + dense_fam[nd_eq + nd_ft :]
        assert all(f in ("lim_dense", "con1") for f in dense_fam[nd_eq + nd_ft :])
        assert diag_fam == ["fric_dof"] * nfd + ["lim_dof"] * (len(diag_fam) - nfd)
        return PyramidStructure(
            nd=len(dense),
            ndiag=len(diag_rows),
            ncon3=ncon3,
            nd_eq=nd_eq,
            nd_ft=nd_ft,
            nfd=nfd,
            dense_rows=np.asarray(dense, np.int64),
            diag_rows=np.asarray(diag_rows, np.int64),
            diag_dofs=np.asarray(diag_dofs, np.int64),
            adr3=adr3.astype(np.int64),
            perm=perm,
            inv_perm=inv_perm,
            is_fric=is_fric,
            one_sided=one_sided,
        )

    st = build()
    _CACHE[key] = st
    return st




def _geom_support(s) -> np.ndarray:
    """(ngeom, nv) static dof-support table per geom's body.

    Contact rows gather from it by the *traced* contact geom ids
    (Contact.geom1/geom2), so broadphase-capped slots whose pair is chosen at
    runtime get the right Jacobian structure through plain gathers."""
    key = (s, "geom_support")
    if key not in _CACHE:
        from ambersim_tpu.engine.smooth import _body_dof_support

        sup = _body_dof_support(s).astype(np.float32)  # (nbody, nv)
        _CACHE[key] = sup[s.geom_bodyid]
    return _CACHE[key]


def _point_jac_rows(m: Model, d: Data, pos: jax.Array, signed_support: jax.Array):
    """Translational jacobian of relative velocity at world points.

    pos: (n, 3) points; signed_support: (n, nv). Returns a list of three
    (n, nv) arrays, one per world axis. Component form on purpose: a trailing
    length-3 axis under the big env vmap makes XLA tile the 3 onto the lane
    dim and pay relayout copies around every op (profiled at ~0.4 ms/step on
    the quadruped bench); (n, nv) arrays stay in one layout throughout."""
    s = m.skel
    origin = d.subtree_com[s.body_rootid[s.dof_bodyid]]  # (nv, 3)
    ax, ay, az = d.cdof[:, 0], d.cdof[:, 1], d.cdof[:, 2]  # (nv,) each
    rx = pos[:, 0:1] - origin[:, 0][None]  # (n, nv)
    ry = pos[:, 1:2] - origin[:, 1][None]
    rz = pos[:, 2:3] - origin[:, 2][None]
    jx = d.cdof[:, 3][None] + ay[None] * rz - az[None] * ry
    jy = d.cdof[:, 4][None] + az[None] * rx - ax[None] * rz
    jz = d.cdof[:, 5][None] + ax[None] * ry - ay[None] * rx
    return [jx * signed_support, jy * signed_support, jz * signed_support]


def _frame_rows(frame: jax.Array, jac_rows):
    """Project world-axis jacobian components onto a contact frame.

    frame: (n, 3, 3) rows = [normal, tangent1, tangent2]; jac_rows: list of
    three (n, nv). Returns a list of three (n, nv): J rows in frame coords
    (same component-form rationale as _point_jac_rows)."""
    return [
        frame[:, i, 0:1] * jac_rows[0]
        + frame[:, i, 1:2] * jac_rows[1]
        + frame[:, i, 2:3] * jac_rows[2]
        for i in range(3)
    ]


def _set_rows(arr: jax.Array, row_idx: np.ndarray, block: jax.Array) -> jax.Array:
    """Write a block of rows at static indices. Contiguous index ranges (the
    common case: per-family row blocks) lower to a dynamic-update-slice
    instead of a scatter — a full-buffer (B, nefc, nv) scatter under the env
    vmap costs ~100 us/step on the quadruped bench."""
    row_idx = np.asarray(row_idx)
    if row_idx.size and np.all(np.diff(row_idx) == 1):
        r0 = int(row_idx[0])
        return arr.at[r0 : r0 + row_idx.size].set(block)
    return arr.at[row_idx].set(block)


def make_constraint(m: Model, d: Data) -> Data:
    s = m.skel
    dtype = d.qpos.dtype
    nv, nefc = s.nv, s.nefc
    if nefc == 0:
        return d

    efc_J = jnp.zeros((nefc, nv), dtype)
    efc_bJ = jnp.zeros(d.efc_bJ.shape, dtype)
    efc_dsc = jnp.zeros(d.efc_dsc.shape, dtype)
    ndiag = efc_dsc.shape[0]  # > 0 iff the rows factor (PyramidStructure)
    efc_pos = jnp.zeros((nefc,), dtype)
    efc_margin = jnp.zeros((nefc,), dtype)
    efc_D = jnp.zeros((nefc,), dtype)
    efc_aref = jnp.zeros((nefc,), dtype)
    efc_fl = jnp.zeros((nefc,), dtype)
    efc_active = jnp.zeros((nefc,), bool)

    row = 0

    # ---------------- equality ----------------
    eq_enabled = not (m.opt.disableflags & DisableBit.EQUALITY)
    for e in range(s.neq):
        etype = EqType(int(s.eq_type[e]))
        active = bool(s.eq_active0[e]) and eq_enabled
        if etype == EqType.JOINT:
            j1, j2 = int(s.eq_obj1id[e]), int(s.eq_obj2id[e])
            qa1, da1 = int(s.jnt_qposadr[j1]), int(s.jnt_dofadr[j1])
            c = m.eq_data[e, :5]
            if j2 >= 0:
                qa2, da2 = int(s.jnt_qposadr[j2]), int(s.jnt_dofadr[j2])
                z = d.qpos[qa2] - m.qpos0[qa2]
                poly = c[0] + z * (c[1] + z * (c[2] + z * (c[3] + z * c[4])))
                dpoly = c[1] + z * (2 * c[2] + z * (3 * c[3] + z * 4 * c[4]))
                pos = (d.qpos[qa1] - m.qpos0[qa1]) - poly
                Jrow = jnp.zeros(nv, dtype).at[da1].set(1.0).at[da2].set(-dpoly)
                diag = m.dof_invweight0[da1] + m.dof_invweight0[da2]
            else:
                pos = d.qpos[qa1] - m.qpos0[qa1] - c[0]
                Jrow = jnp.zeros(nv, dtype).at[da1].set(1.0)
                diag = m.dof_invweight0[da1]
            k, b, imp = _kbi(m, m.eq_solref[e], m.eq_solimp[e], pos)
            jqvel = Jrow @ d.qvel
            efc_J = efc_J.at[row].set(Jrow)
            efc_pos = efc_pos.at[row].set(pos)
            efc_aref = efc_aref.at[row].set(-b * jqvel - k * imp * pos)
            efc_D = efc_D.at[row].set(imp / jnp.maximum((1 - imp) * diag, _MINVAL))
            efc_active = efc_active.at[row].set(active)
            row += 1
        elif etype == EqType.TENDON:
            t1, t2 = int(s.eq_obj1id[e]), int(s.eq_obj2id[e])
            c = m.eq_data[e, :5]
            dif1 = d.ten_length[t1] - m.tendon_length0[t1]
            if t2 >= 0:
                z = d.ten_length[t2] - m.tendon_length0[t2]
                poly = c[0] + z * (c[1] + z * (c[2] + z * (c[3] + z * c[4])))
                dpoly = c[1] + z * (2 * c[2] + z * (3 * c[3] + z * 4 * c[4]))
                pos = dif1 - poly
                Jrow = d.ten_J[t1] - dpoly * d.ten_J[t2]
                diag = m.tendon_invweight0[t1] + m.tendon_invweight0[t2]
            else:
                pos = dif1 - c[0]
                Jrow = d.ten_J[t1]
                diag = m.tendon_invweight0[t1]
            k, b, imp = _kbi(m, m.eq_solref[e], m.eq_solimp[e], pos)
            jqvel = Jrow @ d.qvel
            efc_J = efc_J.at[row].set(Jrow.astype(dtype))
            efc_pos = efc_pos.at[row].set(pos)
            efc_aref = efc_aref.at[row].set(-b * jqvel - k * imp * pos)
            efc_D = efc_D.at[row].set(imp / jnp.maximum((1 - imp) * diag, _MINVAL))
            efc_active = efc_active.at[row].set(active)
            row += 1
        elif etype in (EqType.CONNECT, EqType.WELD):
            b1, b2 = int(s.eq_obj1id[e]), int(s.eq_obj2id[e])
            if etype == EqType.CONNECT:
                anchor1, anchor2 = m.eq_data[e, :3], m.eq_data[e, 3:6]
            else:
                anchor1, anchor2 = m.eq_data[e, 3:6], m.eq_data[e, :3]
            p1 = d.xpos[b1] + am.rotate(anchor1, d.xquat[b1])
            p2 = d.xpos[b2] + am.rotate(anchor2, d.xquat[b2])
            pos3 = p1 - p2
            from ambersim_tpu.engine.smooth import _body_dof_support

            sup = _body_dof_support(s).astype(np.float32)
            ssup = jnp.asarray((sup[b1] - sup[b2])[None, :], dtype)  # J of (v1 - v2)
            # jacobian evaluated at the midpoint for symmetry (MuJoCo uses each
            # body's own anchor; midpoint matches to first order and is stable)
            jr1 = _point_jac_rows(m, d, p1[None], jnp.asarray(sup[b1])[None])
            jr2 = _point_jac_rows(m, d, p2[None], jnp.asarray(sup[b2])[None])
            jdiff = jnp.stack([a[0] - b_[0] for a, b_ in zip(jr1, jr2)])  # (3, nv)
            diag_t = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
            nrow = 3 if etype == EqType.CONNECT else 6
            if etype == EqType.WELD:
                relq = m.eq_data[e, 6:10]  # q1^-1 q2 at qpos0
                q2_target = am.mul_quat(d.xquat[b1], relq)
                rotres = am.quat_sub(d.xquat[b2], q2_target)
                jacr = (d.cdof[:, :3] * ssup[0][:, None]).T  # (3, nv)
                torquescale = jnp.where(m.eq_data[e, 10] > 0, m.eq_data[e, 10], 1.0)
                res = jnp.concatenate([pos3, rotres * torquescale])
                Jblock = jnp.concatenate([jdiff, jacr * torquescale], axis=0)
                diag_r = m.body_invweight0[b1, 1] + m.body_invweight0[b2, 1]
                diag = jnp.concatenate([jnp.full(3, diag_t), jnp.full(3, diag_r)])
            else:
                res = pos3
                Jblock = jdiff
                diag = jnp.full(3, diag_t)
            k, b_, imp = _kbi(
                m,
                jnp.broadcast_to(m.eq_solref[e], (nrow, 2)),
                jnp.broadcast_to(m.eq_solimp[e], (nrow, 5)),
                res,
            )
            jqvel = Jblock @ d.qvel
            sl = slice(row, row + nrow)
            efc_J = efc_J.at[sl].set(Jblock)
            efc_pos = efc_pos.at[sl].set(res)
            efc_aref = efc_aref.at[sl].set(-b_ * jqvel - k * imp * res)
            efc_D = efc_D.at[sl].set(imp / jnp.maximum((1 - imp) * diag, _MINVAL))
            efc_active = efc_active.at[sl].set(active)
            row += nrow

    # -------- friction loss: dof rows, then tendon rows (MuJoCo order) --------
    fl_enabled = not (m.opt.disableflags & DisableBit.FRICTIONLOSS)
    nfd = len(s.friction_dofid)
    if nfd:
        dofs = s.friction_dofid  # static (nfd,)
        rows = np.arange(row, row + nfd)
        k, b, imp = _kbi(m, m.dof_solref[dofs], m.dof_solimp[dofs], jnp.zeros((nfd,), dtype))
        efc_J = efc_J.at[rows, dofs].set(1.0)
        if ndiag:
            # one-hot values for the structured solver: dof-friction rows are
            # the first nfd entries of the diag section (PyramidStructure)
            efc_dsc = efc_dsc.at[:nfd].set(1.0)
        efc_aref = efc_aref.at[rows].set(-b * d.qvel[dofs])
        efc_D = efc_D.at[rows].set(imp / jnp.maximum((1 - imp) * m.dof_invweight0[dofs], _MINVAL))
        efc_fl = efc_fl.at[rows].set(m.dof_frictionloss[dofs])
        efc_active = efc_active.at[rows].set(fl_enabled)
        row += nfd
    nft = len(getattr(s, "friction_tenid", ()))
    if nft:
        tens = s.friction_tenid  # static (nft,)
        rows = np.arange(row, row + nft)
        k, b, imp = _kbi(
            m, m.tendon_solref_fri[tens], m.tendon_solimp_fri[tens], jnp.zeros((nft,), dtype)
        )
        efc_J = efc_J.at[rows].set(d.ten_J[tens].astype(dtype))
        efc_aref = efc_aref.at[rows].set(-b * d.ten_velocity[tens])
        efc_D = efc_D.at[rows].set(
            imp / jnp.maximum((1 - imp) * m.tendon_invweight0[tens], _MINVAL)
        )
        efc_fl = efc_fl.at[rows].set(m.tendon_frictionloss[tens])
        efc_active = efc_active.at[rows].set(fl_enabled)
        row += nft

    # -------- limits: joint rows (scalar + ball, id order), then tendons ----
    lim_enabled = not (m.opt.disableflags & DisableBit.LIMIT)
    nlj = len(s.limit_jntid)
    if nlj:
        lim_types = np.asarray([int(s.jnt_type[j]) for j in s.limit_jntid])
        scalar_sel = np.nonzero(lim_types != int(JointType.BALL))[0]
        ball_sel = np.nonzero(lim_types == int(JointType.BALL))[0]
        base_rows = np.arange(row, row + nlj)
        if len(scalar_sel):
            jids = s.limit_jntid[scalar_sel]  # static
            qas = s.jnt_qposadr[jids]
            das = s.jnt_dofadr[jids]
            rows = base_rows[scalar_sel]
            lo, hi = m.jnt_range[jids, 0], m.jnt_range[jids, 1]
            q = d.qpos[qas]
            dist_lo, dist_hi = q - lo, hi - q
            lower = dist_lo < dist_hi
            dist = jnp.where(lower, dist_lo, dist_hi)
            sign = jnp.where(lower, 1.0, -1.0)
            margin = m.jnt_margin[jids]
            pos = dist - margin
            k, b, imp = _kbi(m, m.jnt_solref[jids], m.jnt_solimp[jids], pos)
            jqvel = sign * d.qvel[das]
            # static one-hot dof columns x dynamic sign: a (nl, nv) block
            # written with a slice update, not a (B, nefc, nv) scatter
            onehot = np.zeros((len(rows), nv), np.float64)
            onehot[np.arange(len(rows)), das] = 1.0
            efc_J = _set_rows(efc_J, rows, sign[:, None] * jnp.asarray(onehot, dtype))
            if ndiag:
                # scalar-limit signs fill the diag section after the nfd
                # dof-friction entries (PyramidStructure.diag_rows order)
                efc_dsc = efc_dsc.at[nfd : nfd + len(rows)].set(sign.astype(dtype))
            efc_pos = _set_rows(efc_pos, rows, pos)
            efc_margin = _set_rows(efc_margin, rows, margin.astype(dtype))
            efc_aref = _set_rows(efc_aref, rows, -b * jqvel - k * imp * pos)
            efc_D = _set_rows(
                efc_D, rows, imp / jnp.maximum((1 - imp) * m.dof_invweight0[das], _MINVAL)
            )
            efc_active = _set_rows(efc_active, rows, lim_enabled & (dist < margin))
        for kk in ball_sel:
            # ball limit: one row on the total rotation angle (mj_instantiateLimit:
            # dist = max(range) - |rotvec|, J = -axis)
            j = int(s.limit_jntid[kk])
            qa, da = int(s.jnt_qposadr[j]), int(s.jnt_dofadr[j])
            rowi = int(base_rows[kk])
            q = d.qpos[qa : qa + 4]
            sin_half = jnp.linalg.norm(q[1:4])
            angle = 2.0 * jnp.arctan2(sin_half, q[0])
            angle = jnp.where(angle > jnp.pi, angle - 2.0 * jnp.pi, angle)
            axis = q[1:4] / jnp.maximum(sin_half, _MINVAL) * jnp.sign(angle)
            maxangle = jnp.maximum(m.jnt_range[j, 0], m.jnt_range[j, 1])
            dist = maxangle - jnp.abs(angle)
            margin = m.jnt_margin[j]
            pos = dist - margin
            k, b, imp = _kbi(m, m.jnt_solref[j], m.jnt_solimp[j], pos)
            Jrow = jnp.zeros(nv, dtype).at[da : da + 3].set(-axis)
            jqvel = Jrow @ d.qvel
            efc_J = efc_J.at[rowi].set(Jrow)
            efc_pos = efc_pos.at[rowi].set(pos)
            efc_margin = efc_margin.at[rowi].set(margin)
            efc_aref = efc_aref.at[rowi].set(-b * jqvel - k * imp * pos)
            efc_D = efc_D.at[rowi].set(
                imp / jnp.maximum((1 - imp) * m.dof_invweight0[da], _MINVAL)
            )
            efc_active = efc_active.at[rowi].set(lim_enabled & (dist < margin))
        row += nlj
    nlt = len(getattr(s, "limit_tenid", ()))
    if nlt:
        tens = s.limit_tenid  # static (nlt,)
        rows = np.arange(row, row + nlt)
        lo, hi = m.tendon_range[tens, 0], m.tendon_range[tens, 1]
        L = d.ten_length[tens]
        dist_lo, dist_hi = L - lo, hi - L
        lower = dist_lo < dist_hi
        dist = jnp.where(lower, dist_lo, dist_hi)
        sign = jnp.where(lower, 1.0, -1.0)
        margin = m.tendon_margin[tens]
        pos = dist - margin
        k, b, imp = _kbi(m, m.tendon_solref_lim[tens], m.tendon_solimp_lim[tens], pos)
        rows_J = sign[:, None] * d.ten_J[tens].astype(dtype)
        jqvel = rows_J @ d.qvel
        efc_J = efc_J.at[rows].set(rows_J)
        efc_pos = efc_pos.at[rows].set(pos)
        efc_margin = efc_margin.at[rows].set(margin)
        efc_aref = efc_aref.at[rows].set(-b * jqvel - k * imp * pos)
        efc_D = efc_D.at[rows].set(
            imp / jnp.maximum((1 - imp) * m.tendon_invweight0[tens], _MINVAL)
        )
        efc_active = efc_active.at[rows].set(lim_enabled & (dist < margin))
        row += nlt

    # ---------------- contacts (pyramidal, vectorized per condim group) -----
    con_enabled = not (m.opt.disableflags & DisableBit.CONTACT)
    if s.ncon and con_enabled:
        c = d.contact
        gsup_np = _geom_support(s)  # (ngeom, nv) static table
        if len(s.bpg_adr) == 0 and s.ncon == s.ncand:
            # all contact slots have compile-time geom pairs: bake the support
            # as a constant and gather invweight with static indices (model
            # leaves may be traced jit arguments — no host conversion here)
            signed_sup = jnp.asarray(gsup_np[s.con_geom2] - gsup_np[s.con_geom1], dtype)
            b1 = s.geom_bodyid[s.con_geom1]
            b2 = s.geom_bodyid[s.con_geom2]
            invweight = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
        else:
            # broadphase-capped groups choose pairs at runtime: select by the
            # traced contact geom ids. One-hot contraction, not gsup[ids]:
            # per-env row gathers under the env vmap run row-at-a-time on TPU
            # (2 x 365 us/step on the clutter rowcap profile); the difference
            # one-hot (+1 on geom2, -1 on geom1) does both selections and the
            # subtraction in ONE (ncon, ngeom) @ (ngeom, nv) MXU matmul.
            gsup = jnp.asarray(gsup_np, dtype)
            geom_iota = jnp.arange(gsup.shape[0], dtype=c.geom1.dtype)
            sel1 = (c.geom1[:, None] == geom_iota).astype(dtype)
            sel2 = (c.geom2[:, None] == geom_iota).astype(dtype)
            # precision=HIGHEST: TPU f32 dots default to bf16 operands; the
            # selected support/invweight values feed Jacobian assembly and
            # must keep full f32 mantissas (the one-hot operand is tiny, so
            # exact precision costs nothing).
            signed_sup = jnp.matmul(
                sel2 - sel1, gsup, precision=jax.lax.Precision.HIGHEST
            )  # (ncon, nv)
            # per-geom invweight table (static geom->body map, traced values);
            # the same one-hots select it
            biw_geom = jnp.asarray(m.body_invweight0)[np.asarray(s.geom_bodyid), 0]
            invweight = jnp.matmul(
                sel1 + sel2, biw_geom.astype(dtype), precision=jax.lax.Precision.HIGHEST
            )  # (ncon,)
        jframe = _frame_rows(c.frame, _point_jac_rows(m, d, c.pos, signed_sup))  # 3 x (ncon, nv)
        pos_c = c.dist - c.includemargin
        k, b, imp = _kbi(m, c.solref, c.solimp, pos_c)
        # diagApprox (verified vs the C oracle's efc_R): frictionless rows use
        # plain invweight (no impratio); pyramidal rows use
        # 2*mu0^2*(1+mu0^2)*invweight/impratio with mu0=friction[0].
        mu0 = c.friction[:, 0]
        diag = jnp.where(
            jnp.asarray(s.con_dim == 1),
            invweight,
            2.0 * mu0 * mu0 * (1.0 + mu0 * mu0) * invweight / m.opt.impratio,
        )
        D_c = imp / jnp.maximum((1 - imp) * diag, _MINVAL)
        active_c = c.dist < c.includemargin

        need_rot = bool((s.con_dim > 3).any())
        jframe_rot = _frame_rows(c.frame, _rot_jac_rows(m, d, signed_sup)) if need_rot else None

        from ambersim_tpu.core.types import ConeType

        elliptic = m.opt.cone == int(ConeType.ELLIPTIC)

        # group slots by condim: one fully-batched row construction per group
        for cdim in sorted(set(int(x) for x in s.con_dim)):
            slots = np.nonzero(s.con_dim == cdim)[0]
            if elliptic and cdim > 1:
                # elliptic rows: [normal, friction dims] (cf. the C oracle:
                # friction J is the raw tangent/rotation frame rows, aref has
                # no position term, D_i = D_n*impratio*(mu_i/mu0)^2)
                nrow = cdim
                row_idx = (s.con_efcadr[slots][:, None] + np.arange(nrow)[None, :]).reshape(-1)
                jt_cols = [jframe[0][slots]]
                for f in range(1, cdim):
                    jt_cols.append(jframe[f][slots] if f < 3 else jframe_rot[f - 3][slots])
                rows_J = jnp.stack(jt_cols, axis=1)  # (S, cdim, nv)
                jqvel = jnp.einsum("srv,v->sr", rows_J, d.qvel)
                aref_n = -b[slots] * jqvel[:, 0] - k[slots] * imp[slots] * pos_c[slots]
                aref_f = -b[slots][:, None] * jqvel[:, 1:]
                aref_rows = jnp.concatenate([aref_n[:, None], aref_f], axis=1)
                mu = c.friction[slots][:, : cdim - 1]  # (S, cdim-1)
                mu0s = c.friction[slots][:, 0]
                # elliptic normal row: diagApprox = plain invweight (no
                # pyramidal 2*mu^2*(1+mu^2) factor, no impratio — oracle-pinned)
                D_n = imp[slots] / jnp.maximum((1 - imp[slots]) * invweight[slots], _MINVAL)
                D_f = D_n[:, None] * m.opt.impratio * (mu / jnp.maximum(mu0s[:, None], 1e-12)) ** 2
                D_rows = jnp.concatenate([D_n[:, None], D_f], axis=1)
                pos_rows = jnp.concatenate(
                    [c.dist[slots][:, None], jnp.zeros_like(aref_f)], axis=1
                )
                margin_rows = jnp.concatenate(
                    [c.includemargin[slots][:, None], jnp.zeros_like(aref_f)], axis=1
                )
                efc_J = _set_rows(efc_J, row_idx, rows_J.reshape(-1, nv))
                efc_pos = _set_rows(efc_pos, row_idx, pos_rows.reshape(-1))
                efc_margin = _set_rows(efc_margin, row_idx, margin_rows.reshape(-1))
                efc_aref = _set_rows(efc_aref, row_idx, aref_rows.reshape(-1))
                efc_D = _set_rows(efc_D, row_idx, D_rows.reshape(-1))
                efc_active = _set_rows(
                    efc_active,
                    row_idx,
                    jnp.repeat(active_c[slots][:, None], nrow, axis=1).reshape(-1),
                )
                continue
            nrow = 1 if cdim == 1 else 2 * (cdim - 1)
            # static efc row indices (nrow per slot)
            row_idx = (s.con_efcadr[slots][:, None] + np.arange(nrow)[None, :]).reshape(-1)
            jn = jframe[0][slots]  # (S, nv)
            # component form over the pyramid rows: materializing
            # (S, nrow, nv) adds two trailing tiny dims under the env vmap
            # (~280 us/step of relayout copies on the quadruped bench); per-row
            # (S, nv) arrays stay layout-clean and the J.qvel products reuse
            # each tangent row's dot once for its +/- pyramid pair.
            jnq = jnp.sum(jn * d.qvel, axis=-1)  # (S,)
            if cdim == 1:
                row_Js = [jn]
                jq_rows = [jnq]
            else:
                row_Js, jq_rows, mbs = [], [], []
                for f in range(1, cdim):
                    base = jframe[f][slots] if f < 3 else jframe_rot[f - 3][slots]
                    mu_f = c.friction[slots][:, f - 1]  # (S,)
                    mb = mu_f[:, None] * base
                    mbs.append(mb)
                    bq = mu_f * jnp.sum(base * d.qvel, axis=-1)
                    row_Js += [jn + mb, jn - mb]
                    jq_rows += [jnq + bq, jnq - bq]
                if cdim == 3 and not elliptic and efc_bJ.shape[0] == 3 * len(slots):
                    # factored basis [N | mu1*T1 | mu2*T2] for the structured
                    # Newton kernel (Data.efc_bJ); slot order matches
                    # PyramidStructure.adr3 (both iterate con_dim == 3). The
                    # shape check skips skeletons that don't qualify for the
                    # structured layout (efc_bJ is (0, nv) there).
                    efc_bJ = jnp.concatenate([jn, mbs[0], mbs[1]], axis=0)
            kip = k[slots] * imp[slots] * pos_c[slots]
            aref_rows = [-b[slots] * jq - kip for jq in jq_rows]
            Jblk = jnp.stack(row_Js, axis=1).reshape(-1, nv)  # (S*nrow, nv)
            rep = lambda x: jnp.repeat(x[slots][:, None], nrow, axis=1).reshape(-1)  # noqa: E731
            efc_J = _set_rows(efc_J, row_idx, Jblk)
            efc_pos = _set_rows(efc_pos, row_idx, rep(c.dist))
            efc_margin = _set_rows(efc_margin, row_idx, rep(c.includemargin))
            efc_aref = _set_rows(efc_aref, row_idx, jnp.stack(aref_rows, axis=1).reshape(-1))
            efc_D = _set_rows(efc_D, row_idx, rep(D_c))
            efc_active = _set_rows(
                efc_active, row_idx, jnp.repeat(active_c[slots][:, None], nrow, axis=1).reshape(-1)
            )

    return d.replace(
        efc_J=efc_J,
        efc_bJ=efc_bJ,
        efc_dsc=efc_dsc,
        efc_pos=efc_pos,
        efc_margin=efc_margin,
        efc_D=efc_D,
        efc_aref=efc_aref,
        efc_frictionloss=efc_fl,
        efc_active=efc_active,
    )


def _rot_jac_rows(m: Model, d: Data, signed_sup: jax.Array):
    """Rotational jacobian (condim>3 torsional/rolling rows) as a list of
    three (ncon, nv) world-axis components."""
    return [d.cdof[:, i][None] * signed_sup for i in range(3)]
