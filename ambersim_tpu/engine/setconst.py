"""Compile-time derived constants: invweight0 (mirrors mj_setConst).

Runs entirely on the host CPU backend (single jitted dispatch) — computing
these eagerly on a tunneled TPU costs minutes in per-op transfers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ambersim_tpu.core.types import Model
from ambersim_tpu.engine import smooth
from ambersim_tpu.engine.init import make_data


def set_constants(model: Model) -> Model:
    s = model.skel
    if s.nv == 0:
        return model
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        d = make_data(model)
        d = jax.jit(smooth.fwd_position_smooth)(model, d)
        qm = np.asarray(d.qM)
        moment0 = (
            np.asarray(jax.jit(smooth.actuator_moment)(model, d), np.float64)
            if s.nu
            else None
        )
    minv_np = np.linalg.inv(qm)
    dof_invweight0 = np.diag(minv_np).copy()
    # mj_setConst averages invweight over a ball joint's 3 dofs and a free
    # joint's translational / rotational triples (oracle-pinned)
    from ambersim_tpu.core.types import JointType

    for j in range(s.njnt):
        jtype = int(s.jnt_type[j])
        da = int(s.jnt_dofadr[j])
        if jtype == int(JointType.BALL):
            dof_invweight0[da : da + 3] = dof_invweight0[da : da + 3].mean()
        elif jtype == int(JointType.FREE):
            dof_invweight0[da : da + 3] = dof_invweight0[da : da + 3].mean()
            dof_invweight0[da + 3 : da + 6] = dof_invweight0[da + 3 : da + 6].mean()

    # body invweight0: mean diagonal of J M^-1 J^T for com translation/rotation
    supports = smooth._body_dof_support(s)  # (nbody, nv)
    cdof = np.asarray(d.cdof)
    xipos = np.asarray(d.xipos)
    origin_np = np.asarray(d.subtree_com)[s.body_rootid]
    body_inv = np.zeros((s.nbody, 2), dtype=np.float32)
    for b in range(1, s.nbody):
        jac = np.zeros((6, s.nv))
        offset = xipos[b] - origin_np[b]
        for v in range(s.nv):
            if not supports[b, v]:
                continue
            ang = cdof[v, :3]
            lin = cdof[v, 3:] + np.cross(ang, offset)
            jac[:3, v] = ang
            jac[3:, v] = lin
        a = jac @ minv_np @ jac.T
        body_inv[b, 0] = (a[3, 3] + a[4, 4] + a[5, 5]) / 3.0  # translation
        body_inv[b, 1] = (a[0, 0] + a[1, 1] + a[2, 2]) / 3.0  # rotation
    updates = dict(
        dof_invweight0=np.asarray(dof_invweight0, np.float32),
        body_invweight0=body_inv,
    )
    if s.ntendon:
        # runtime jacobian at qpos0 covers both fixed (constant) and spatial
        # (site/wrap geometry) rows
        tj = np.asarray(d.ten_J, np.float64)  # (ntendon, nv)
        updates["tendon_invweight0"] = np.asarray(
            np.einsum("ti,ij,tj->t", tj, minv_np, tj), np.float32
        )
        length0 = np.asarray(d.ten_length, np.float32)
        updates["tendon_length0"] = length0
        ls = np.array(model.tendon_lengthspring, np.float32)
        nan_rows = np.isnan(ls).any(axis=1)  # spatial default springlength
        if nan_rows.any():
            ls[nan_rows] = length0[nan_rows, None]
            updates["tendon_lengthspring"] = ls
    if s.nu:
        # acc0 = |M^-1 moment| at qpos0 (muscle force auto-scaling, mj_setConst)
        updates["actuator_acc0"] = np.asarray(
            np.linalg.norm(moment0 @ minv_np, axis=1), np.float32
        )
    return model.replace(**updates)
