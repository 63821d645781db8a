"""Smooth (unconstrained) dynamics: FK, COM quantities, CRBA, RNEA,
passive forces, actuation.

Reimplements the pipeline stages of mjx.forward that the reference's hot loop
runs (reference: ambersim/rl/base.py:93 `mjx.step`; stage list documented in
SURVEY.md §3.4), with MuJoCo-compatible semantics verified against the host
oracle per stage.

TPU-first structure: tree propagation is LEVEL-VECTORIZED over a static
schedule (engine/schedule.py) — op count scales with tree depth, not body
count; order-free quantities (cdof, springs, position integration) are
vectorized per joint-type group; the mass matrix is two einsums + a static
ancestor mask. Everything batches with vmap.

All functions take (Model, Data) for a SINGLE env and return updated Data.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ambersim_tpu.core import math as am
from ambersim_tpu.core.types import (
    BiasType,
    Data,
    DisableBit,
    DynType,
    GainType,
    JointType,
    Model,
    TrnType,
)
from ambersim_tpu.engine.schedule import tree_schedule


def _take(x: jax.Array, base: np.ndarray, width: int) -> jax.Array:
    """Gather x[base + 0..width-1] -> (len(base), width) with static indices."""
    return x[base[:, None] + np.arange(width)[None, :]]


def kinematics(m: Model, d: Data) -> Data:
    """Forward kinematics: joint -> cartesian body/geom/joint frames."""
    s = m.skel
    sched = tree_schedule(s)
    dtype = d.qpos.dtype

    xpos = jnp.zeros((s.nbody, 3), dtype)
    xquat = jnp.tile(jnp.array([1.0, 0, 0, 0], dtype), (s.nbody, 1))
    xanchor = jnp.zeros((s.njnt, 3), dtype)
    xaxis = jnp.zeros((s.njnt, 3), dtype)

    # mocap bodies: static world children whose frame comes from d.mocap_pos/
    # mocap_quat instead of the compiled body_pos/quat (mjData.mocap_* role)
    body_pos, body_quat = m.body_pos, m.body_quat
    if s.nmocap:
        mid = s.mocap_bodyid
        body_pos = jnp.asarray(body_pos, dtype).at[mid].set(d.mocap_pos)
        body_quat = jnp.asarray(body_quat, dtype).at[mid].set(am.normalize_quat(d.mocap_quat))

    for level in sched.levels:
        for sig, ids, parents, jnt_slots in level:
            pos = xpos[parents] + am.rotate(body_pos[ids], xquat[parents])
            quat = am.mul_quat(xquat[parents], body_quat[ids])
            for slot, jtype_int in enumerate(sig):
                jids = jnt_slots[slot]
                jtype = JointType(jtype_int)
                qa = s.jnt_qposadr[jids]
                if jtype == JointType.FREE:
                    pos = _take(d.qpos, qa, 3)
                    quat = am.normalize_quat(_take(d.qpos, qa + 3, 4))
                    xanchor = xanchor.at[jids].set(pos)
                    xaxis = xaxis.at[jids].set(am.rotate(m.jnt_axis[jids], quat))
                elif jtype == JointType.BALL:
                    qloc = am.normalize_quat(_take(d.qpos, qa, 4))
                    anchor = pos + am.rotate(m.jnt_pos[jids], quat)
                    quat = am.mul_quat(quat, qloc)
                    pos = anchor - am.rotate(m.jnt_pos[jids], quat)
                    xanchor = xanchor.at[jids].set(anchor)
                    xaxis = xaxis.at[jids].set(am.rotate(m.jnt_axis[jids], quat))
                elif jtype == JointType.HINGE:
                    angle = d.qpos[qa] - m.qpos0[qa]
                    anchor = pos + am.rotate(m.jnt_pos[jids], quat)
                    qloc = am.axis_angle_to_quat(m.jnt_axis[jids], angle)
                    quat = am.mul_quat(quat, qloc)
                    pos = anchor - am.rotate(m.jnt_pos[jids], quat)
                    xanchor = xanchor.at[jids].set(anchor)
                    xaxis = xaxis.at[jids].set(am.rotate(m.jnt_axis[jids], quat))
                else:  # SLIDE
                    ax = am.rotate(m.jnt_axis[jids], quat)
                    pos = pos + ax * (d.qpos[qa] - m.qpos0[qa])[:, None]
                    xanchor = xanchor.at[jids].set(pos + am.rotate(m.jnt_pos[jids], quat))
                    xaxis = xaxis.at[jids].set(ax)
            xpos = xpos.at[ids].set(pos)
            xquat = xquat.at[ids].set(am.normalize_quat(quat))

    # inertial and geom frames (batched over bodies/geoms)
    xipos = xpos + am.rotate(m.body_ipos, xquat)
    ximat = am.quat_to_mat(am.mul_quat(xquat, m.body_iquat))
    bid = s.geom_bodyid
    geom_xpos = xpos[bid] + am.rotate(m.geom_pos, xquat[bid])
    geom_xmat = am.quat_to_mat(am.mul_quat(xquat[bid], m.geom_quat))
    sbid = s.site_bodyid
    site_xpos = xpos[sbid] + am.rotate(m.site_pos, xquat[sbid])
    site_xmat = am.quat_to_mat(am.mul_quat(xquat[sbid], m.site_quat))

    return d.replace(
        xpos=xpos,
        xquat=xquat,
        xanchor=xanchor,
        xaxis=xaxis,
        xipos=xipos,
        ximat=ximat,
        geom_xpos=geom_xpos,
        geom_xmat=geom_xmat,
        site_xpos=site_xpos,
        site_xmat=site_xmat,
    )


def com_pos(m: Model, d: Data) -> Data:
    """Subtree COM, com-frame spatial inertias (cinert) and dof axes (cdof)."""
    s = m.skel
    sched = tree_schedule(s)
    dtype = d.qpos.dtype

    # subtree com: bottom-up level accumulation
    mass_acc = m.body_mass * jnp.ones((), dtype)
    mpos_acc = m.body_mass[:, None] * d.xipos
    for child_ids, parent_ids in sched.reverse_levels:
        mass_acc = mass_acc.at[parent_ids].add(mass_acc[child_ids])
        mpos_acc = mpos_acc.at[parent_ids].add(mpos_acc[child_ids])
    subtree_com = mpos_acc / jnp.maximum(mass_acc, 1e-12)[:, None]

    origin = subtree_com[s.body_rootid]  # (nbody, 3)

    # cinert = spatial inertia about the subtree-com origin, assembled in
    # component form with ONE final stack. The obvious spelling
    # (quat_to_mat -> R @ diag(I) @ R^T -> skew products -> concats) costs
    # ~0.7 ms/step at batch 4096 on the quadruped bench in pure relayout
    # ("data formatting") ops around every (…, 3, 3) intermediate; component
    # arithmetic on (nbody,) slices fuses into one elementwise block.
    xiquat = am.mul_quat(d.xquat, jnp.asarray(m.body_iquat, dtype))
    qw, qx, qy, qz = xiquat[..., 0], xiquat[..., 1], xiquat[..., 2], xiquat[..., 3]
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    # rows of R (world <- inertial): R[a][k]
    R = [
        [1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
        [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
        [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)],
    ]
    I0 = jnp.asarray(m.body_inertia[:, 0], dtype)
    I1 = jnp.asarray(m.body_inertia[:, 1], dtype)
    I2 = jnp.asarray(m.body_inertia[:, 2], dtype)
    mass = jnp.asarray(m.body_mass, dtype)
    coff = d.xipos - origin
    cx, cy, cz = coff[..., 0], coff[..., 1], coff[..., 2]
    cc = [cx, cy, cz]
    c2 = cx * cx + cy * cy + cz * cz
    # top-left: W + m ((c.c) E - c c^T) with W = R diag(I) R^T (about com)
    def tl(a, b):
        w_ab = I0 * R[a][0] * R[b][0] + I1 * R[a][1] * R[b][1] + I2 * R[a][2] * R[b][2]
        return w_ab + mass * ((c2 if a == b else 0.0) - cc[a] * cc[b])

    zero = jnp.zeros_like(cx)
    mcx, mcy, mcz = mass * cx, mass * cy, mass * cz
    # m S(c) (top-right); bottom-left is its transpose (= -m S(c)); m E
    tr = [[zero, -mcz, mcy], [mcz, zero, -mcx], [-mcy, mcx, zero]]
    comps = []
    for a in range(3):
        comps += [tl(a, 0), tl(a, 1), tl(a, 2)] + tr[a]
    for a in range(3):
        comps += [tr[0][a], tr[1][a], tr[2][a]]
        comps += [mass if b_ == a else zero for b_ in range(3)]
    cinert = jnp.stack(comps, axis=-1).reshape(d.xipos.shape[:-1] + (6, 6))

    # cdof: order-free, vectorized per joint type
    cdof = jnp.zeros((s.nv, 6), dtype)
    for jtype_int, jids in sched.jnt_by_type.items():
        jtype = JointType(jtype_int)
        b = s.jnt_bodyid[jids]
        da = s.jnt_dofadr[jids]
        o = origin[b]
        if jtype == JointType.HINGE:
            ax = d.xaxis[jids]
            cdof = cdof.at[da].set(jnp.concatenate([ax, jnp.cross(ax, o - d.xanchor[jids])], axis=-1))
        elif jtype == JointType.SLIDE:
            z = jnp.zeros_like(d.xaxis[jids])
            cdof = cdof.at[da].set(jnp.concatenate([z, d.xaxis[jids]], axis=-1))
        else:
            xmat = am.quat_to_mat(d.xquat[b])  # (G, 3, 3)
            anchors = d.xanchor[jids]
            if jtype == JointType.FREE:
                eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), xmat.shape)
                z = jnp.zeros_like(eye)
                trans = jnp.concatenate([z, eye], axis=-1)  # (G, 3(dof), 6)
                idx = da[:, None] + np.arange(3)[None, :]
                cdof = cdof.at[idx].set(trans)
                da = da + 3
            # rotational dofs: body-frame axes anchored at the joint anchor
            axes = jnp.swapaxes(xmat, -1, -2)  # rows = body axes (G, 3(dof), 3)
            lin = jnp.cross(axes, (o - anchors)[:, None, :])
            rot = jnp.concatenate([axes, lin], axis=-1)
            idx = da[:, None] + np.arange(3)[None, :]
            cdof = cdof.at[idx].set(rot)

    return d.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


def camlight(m: Model, d: Data) -> Data:
    """Camera/light kinematics (mj_camlight parity, verified vs the oracle in
    tests/test_camlight.py). Modes: FIXED rides the body frame; TRACK keeps a
    constant world offset from the body (orientation frozen at qpos0);
    TRACKCOM the same relative to the body's subtree com; TARGETBODY(COM)
    rides the body but re-aims so camera -z looks at the target body
    (z = normalize(campos - target), x = normalize(z_world x z), y = z x x)
    / the light direction points at the target."""
    from ambersim_tpu.core.types import CamLightMode as CM

    s = m.skel
    dtype = d.qpos.dtype
    cam_xpos, cam_xmat = d.cam_xpos, d.cam_xmat
    for i in range(s.ncam):
        b, mode, tgt = int(s.cam_bodyid[i]), int(s.cam_mode[i]), int(s.cam_targetbodyid[i])
        R = am.quat_to_mat(d.xquat[b])
        if mode == int(CM.TRACK):
            pos = d.xpos[b] + jnp.asarray(m.cam_pos0[i], dtype)
            mat = jnp.asarray(m.cam_mat0[i], dtype)
        elif mode == int(CM.TRACKCOM):
            pos = d.subtree_com[b] + jnp.asarray(m.cam_poscom0[i], dtype)
            mat = jnp.asarray(m.cam_mat0[i], dtype)
        else:  # FIXED / TARGETBODY / TARGETBODYCOM: ride the body frame
            pos = d.xpos[b] + R @ m.cam_pos[i]
            mat = R @ am.quat_to_mat(m.cam_quat[i])
            if mode in (int(CM.TARGETBODY), int(CM.TARGETBODYCOM)):
                target = d.subtree_com[tgt] if mode == int(CM.TARGETBODYCOM) else d.xpos[tgt]
                z = pos - target
                z = z / jnp.maximum(jnp.linalg.norm(z), 1e-15)
                x = jnp.cross(jnp.array([0.0, 0, 1], dtype), z)
                x = x / jnp.maximum(jnp.linalg.norm(x), 1e-15)
                mat = jnp.stack([x, jnp.cross(z, x), z], axis=1)
        cam_xpos = cam_xpos.at[i].set(pos)
        cam_xmat = cam_xmat.at[i].set(mat)
    light_xpos, light_xdir = d.light_xpos, d.light_xdir
    for i in range(s.nlight):
        b, mode, tgt = int(s.light_bodyid[i]), int(s.light_mode[i]), int(s.light_targetbodyid[i])
        R = am.quat_to_mat(d.xquat[b])
        if mode == int(CM.TRACK):
            pos = d.xpos[b] + jnp.asarray(m.light_pos0[i], dtype)
            xdir = jnp.asarray(m.light_dir0[i], dtype)
        elif mode == int(CM.TRACKCOM):
            pos = d.subtree_com[b] + jnp.asarray(m.light_poscom0[i], dtype)
            xdir = jnp.asarray(m.light_dir0[i], dtype)
        else:
            pos = d.xpos[b] + R @ m.light_pos[i]
            xdir = R @ m.light_dir[i]
            if mode in (int(CM.TARGETBODY), int(CM.TARGETBODYCOM)):
                target = d.subtree_com[tgt] if mode == int(CM.TARGETBODYCOM) else d.xpos[tgt]
                xdir = target - pos
            xdir = xdir / jnp.maximum(jnp.linalg.norm(xdir), 1e-15)
        light_xpos = light_xpos.at[i].set(pos)
        light_xdir = light_xdir.at[i].set(xdir)
    return d.replace(cam_xpos=cam_xpos, cam_xmat=cam_xmat, light_xpos=light_xpos, light_xdir=light_xdir)


def com_vel(m: Model, d: Data) -> Data:
    """Body spatial velocities and cdof time-derivatives (mirrors mj_comVel).

    cdof_dot[j] = cvel_running x cdof[j], where cvel_running accumulates the
    parent and preceding joints only; a free joint's world-fixed translation
    axes have zero derivative and join the running velocity before its
    rotation axes are differentiated. Level-vectorized.
    """
    s = m.skel
    sched = tree_schedule(s)
    dtype = d.qpos.dtype
    cvel = jnp.zeros((s.nbody, 6), dtype)
    cdof_dot = jnp.zeros((s.nv, 6), dtype)

    for level in sched.levels:
        for sig, ids, parents, jnt_slots in level:
            v = cvel[parents]  # (G, 6)
            for slot, jtype_int in enumerate(sig):
                jtype = JointType(jtype_int)
                jids = jnt_slots[slot]
                da = s.jnt_dofadr[jids]
                if jtype == JointType.FREE:
                    idx_t = da[:, None] + np.arange(3)[None, :]
                    v = v + jnp.einsum("gwi,gw->gi", d.cdof[idx_t], d.qvel[idx_t])
                    idx_r = da[:, None] + (3 + np.arange(3))[None, :]
                    dot = am.motion_cross(v[:, None, :], d.cdof[idx_r])
                    cdof_dot = cdof_dot.at[idx_r].set(dot)
                    v = v + jnp.einsum("gwi,gw->gi", d.cdof[idx_r], d.qvel[idx_r])
                else:
                    w = jtype.dof_width
                    idx = da[:, None] + np.arange(w)[None, :]
                    dot = am.motion_cross(v[:, None, :], d.cdof[idx])
                    cdof_dot = cdof_dot.at[idx].set(dot)
                    v = v + jnp.einsum("gwi,gw->gi", d.cdof[idx], d.qvel[idx])
            cvel = cvel.at[ids].set(v)
    return d.replace(cvel=cvel, cdof_dot=cdof_dot)


def crb(m: Model, d: Data) -> Data:
    """Composite-rigid-body mass matrix, dense, via component-form products.

    The obvious einsum('vij,vj->vi') + f @ cdof.T leaves (6, 6)/(6,) trailing
    dims under the env vmap (~130 us/step of relayout copies on the quadruped
    bench); slicing cinert/cdof into per-component (nv,) arrays keeps every
    product layout-clean, and qM accumulates from six rank-1 outer products."""
    s = m.skel
    sched = tree_schedule(s)
    crb_flat = d.cinert.reshape(d.cinert.shape[:-2] + (36,))  # row-major, free
    for child_ids, parent_ids in sched.reverse_levels:
        keep = parent_ids > 0
        if keep.any():
            crb_flat = crb_flat.at[parent_ids[keep]].add(crb_flat[child_ids[keep]])

    if s.nv == 0:
        return d.replace(qM=jnp.zeros((0, 0), d.qpos.dtype))

    cm = crb_flat[s.dof_bodyid]  # (nv, 36) static gather
    cd = [d.cdof[:, j] for j in range(6)]  # 6 x (nv,)
    f = [sum(cm[:, 6 * i + j] * cd[j] for j in range(6)) for i in range(6)]
    m_full = sum(f[i][:, None] * cd[i][None, :] for i in range(6))  # (nv, nv)
    mask = jnp.asarray(s.ancestor_mask)
    half = jnp.where(mask, m_full, 0.0)
    qM = half + half.T - jnp.diag(jnp.diag(half))
    qM = qM + jnp.diag(m.dof_armature)
    return d.replace(qM=qM)


def factor_m(m: Model, d: Data) -> Data:
    """Dense Cholesky of qM (unrolled batch-friendly factorization)."""
    from ambersim_tpu.engine import linalg

    return d.replace(qLD=linalg.cholesky(d.qM))


def solve_m(m: Model, d: Data, x: jax.Array) -> jax.Array:
    """qM^{-1} x via the cached Cholesky factor."""
    from ambersim_tpu.engine import linalg

    return linalg.cho_solve(d.qLD, x)


def rne(m: Model, d: Data) -> Data:
    """Recursive Newton-Euler: bias forces C(q,v)v + g(q), level-vectorized."""
    s = m.skel
    sched = tree_schedule(s)
    dtype = d.qpos.dtype
    gravity = jnp.where(m.opt.disableflags & DisableBit.GRAVITY, 0.0, 1.0) * m.opt.gravity

    acc = jnp.zeros((s.nbody, 6), dtype)
    acc = acc.at[0].set(jnp.concatenate([jnp.zeros(3, dtype), -jnp.asarray(gravity, dtype)]))

    # forward: spatial accelerations (qacc = 0)
    for level in sched.levels:
        for sig, ids, parents, jnt_slots in level:
            a = acc[parents]
            for slot, jtype_int in enumerate(sig):
                jids = jnt_slots[slot]
                w = JointType(jtype_int).dof_width
                idx = s.jnt_dofadr[jids][:, None] + np.arange(w)[None, :]
                a = a + jnp.einsum("gwi,gw->gi", d.cdof_dot[idx], d.qvel[idx])
            acc = acc.at[ids].set(a)

    iv = jnp.einsum("bij,bj->bi", d.cinert, d.cvel)
    frc = jnp.einsum("bij,bj->bi", d.cinert, acc) + am.force_cross(d.cvel, iv)
    frc = frc.at[0].set(0.0)

    # backward: accumulate forces to parents
    for child_ids, parent_ids in sched.reverse_levels:
        keep = parent_ids > 0
        if keep.any():
            frc = frc.at[parent_ids[keep]].add(frc[child_ids[keep]])

    qfrc_bias = (
        jnp.einsum("vi,vi->v", d.cdof, frc[s.dof_bodyid]) if s.nv else jnp.zeros(0, dtype)
    )
    return d.replace(qfrc_bias=qfrc_bias)


def passive(m: Model, d: Data) -> Data:
    """Spring/damper passive forces (mirrors mj_passive), joint-type vectorized."""
    s = m.skel
    sched = tree_schedule(s)
    dtype = d.qpos.dtype
    if s.nv == 0:
        return d
    spring = jnp.zeros(s.nv, dtype)
    for jtype_int, jids in sched.jnt_by_type.items():
        jtype = JointType(jtype_int)
        qa = s.jnt_qposadr[jids]
        da = s.jnt_dofadr[jids]
        k = m.jnt_stiffness[jids]
        if jtype in (JointType.HINGE, JointType.SLIDE):
            spring = spring.at[da].add(-k * (d.qpos[qa] - m.qpos_spring[qa]))
        elif jtype == JointType.BALL:
            dif = am.quat_sub(_take(d.qpos, qa, 4), _take(m.qpos_spring, qa, 4))
            idx = da[:, None] + np.arange(3)[None, :]
            spring = spring.at[idx].add(-k[:, None] * dif)
        else:  # FREE
            idx_t = da[:, None] + np.arange(3)[None, :]
            spring = spring.at[idx_t].add(
                -k[:, None] * (_take(d.qpos, qa, 3) - _take(m.qpos_spring, qa, 3))
            )
            dif = am.quat_sub(_take(d.qpos, qa + 3, 4), _take(m.qpos_spring, qa + 3, 4))
            idx_r = da[:, None] + (3 + np.arange(3))[None, :]
            spring = spring.at[idx_r].add(-k[:, None] * dif)
    damper = -m.dof_damping * d.qvel
    if s.ntendon:
        # deadband spring (MuJoCo 3 springlength range semantics) + damper
        lo, hi = m.tendon_lengthspring[:, 0], m.tendon_lengthspring[:, 1]
        dif = jnp.where(d.ten_length < lo, d.ten_length - lo, 0.0) + jnp.where(
            d.ten_length > hi, d.ten_length - hi, 0.0
        )
        ten_frc = -m.tendon_stiffness * dif
        spring = spring + d.ten_J.T @ ten_frc
        damper = damper + d.ten_J.T @ (-m.tendon_damping * d.ten_velocity)
    # mjDSBL_SPRING / mjDSBL_DAMPER zero their own term independently; when
    # BOTH are set mj_passive returns early, so fluid drag and gravity
    # compensation are skipped too (oracle-verified semantics). Static
    # branches: XLA dead-code-eliminates the skipped computations.
    df = m.opt.disableflags
    if df & DisableBit.SPRING:
        spring = jnp.zeros_like(spring)
    if df & DisableBit.DAMPER:
        damper = jnp.zeros_like(damper)
    qfrc_passive = spring + damper
    all_passive_off = (df & int(DisableBit.PASSIVE)) == int(DisableBit.PASSIVE)
    if getattr(s, "has_fluid", False) and not all_passive_off:
        qfrc_passive = qfrc_passive + _fluid_force(m, d)
    if getattr(s, "has_gravcomp", False) and not all_passive_off:
        # gravity compensation: antigravity force gravcomp * m * (-g) at each
        # body's COM (mj_passive semantics, oracle-pinned); vanishes with
        # gravity disabled since it compensates a force that isn't applied
        gvec = jnp.where(df & DisableBit.GRAVITY, 0.0, 1.0) * m.opt.gravity
        fw = -(m.body_gravcomp * m.body_mass)[:, None] * gvec[None].astype(dtype)
        root = d.subtree_com[s.body_rootid]
        ang_t = jnp.cross(d.xipos - root, fw)
        fspatial = jnp.concatenate([ang_t, fw], axis=-1)
        sup = jnp.asarray(_body_dof_support(s), dtype)
        qfrc_passive = qfrc_passive + jnp.einsum("bv,vi,bi->v", sup, d.cdof, fspatial)
    return d.replace(qfrc_spring=spring, qfrc_damper=damper, qfrc_passive=qfrc_passive)


def energy_pos(m: Model, d: Data) -> jax.Array:
    """Potential energy (mj_energyPos): gravity part (gated by mjDSBL_GRAVITY)
    plus spring energy of joints and deadband tendons (gated by mjDSBL_SPRING).
    Requires kinematics + tendon stages. Formulas oracle-verified (ball/free
    rotational springs use the 0.5*k*|subQuat|^2 form matching passive())."""
    s = m.skel
    dtype = d.qpos.dtype
    e = jnp.zeros((), dtype)
    if not (m.opt.disableflags & DisableBit.GRAVITY):
        g = jnp.asarray(m.opt.gravity, dtype)
        e = e - jnp.sum(m.body_mass[:, None] * d.xipos * g[None])
    if m.opt.disableflags & DisableBit.SPRING:
        return e
    sched = tree_schedule(s)
    for jtype_int, jids in sched.jnt_by_type.items():
        jtype = JointType(jtype_int)
        qa = s.jnt_qposadr[jids]
        k = m.jnt_stiffness[jids]
        if jtype in (JointType.HINGE, JointType.SLIDE):
            e = e + jnp.sum(0.5 * k * (d.qpos[qa] - m.qpos_spring[qa]) ** 2)
        elif jtype == JointType.BALL:
            dif = am.quat_sub(_take(d.qpos, qa, 4), _take(m.qpos_spring, qa, 4))
            e = e + jnp.sum(0.5 * k * jnp.sum(dif**2, axis=-1))
        else:  # FREE: translational + rotational parts
            dt3 = _take(d.qpos, qa, 3) - _take(m.qpos_spring, qa, 3)
            e = e + jnp.sum(0.5 * k * jnp.sum(dt3**2, axis=-1))
            dif = am.quat_sub(_take(d.qpos, qa + 3, 4), _take(m.qpos_spring, qa + 3, 4))
            e = e + jnp.sum(0.5 * k * jnp.sum(dif**2, axis=-1))
    if s.ntendon:
        lo, hi = m.tendon_lengthspring[:, 0], m.tendon_lengthspring[:, 1]
        dif = jnp.where(d.ten_length < lo, d.ten_length - lo, 0.0) + jnp.where(
            d.ten_length > hi, d.ten_length - hi, 0.0
        )
        e = e + jnp.sum(0.5 * m.tendon_stiffness * dif**2)
    return e


def energy_vel(m: Model, d: Data) -> jax.Array:
    """Kinetic energy 0.5 * qvel' M qvel (mj_energyVel). Requires CRBA."""
    if m.skel.nv == 0:
        return jnp.zeros((), d.qpos.dtype)
    return 0.5 * d.qvel @ (d.qM @ d.qvel)


def _fluid_force(m: Model, d: Data) -> jax.Array:
    """Inertia-box fluid model (mj_passive: viscous + quadratic-density drag
    and wind, oracle-pinned formula-for-formula).

    Each body is an equivalent inertia box with half-sizes
    sqrt((I_j + I_k - I_i) * 3 / (2 m)); drag acts on the body's local 6D
    velocity (linear part relative to opt.wind) in the inertial frame and is
    applied as a world wrench at xipos."""
    s = m.skel
    dtype = d.qpos.dtype
    I = m.body_inertia  # (nbody, 3)
    mass = m.body_mass
    msafe = jnp.maximum(mass, 1e-12)
    Ij = jnp.roll(I, -1, axis=1)
    Ik = jnp.roll(I, -2, axis=1)
    box = jnp.sqrt(jnp.maximum((Ij + Ik - I) * 3.0 / (2.0 * msafe[:, None]), 1e-12))

    root = d.subtree_com[s.body_rootid]
    ang = d.cvel[:, :3]
    lin = d.cvel[:, 3:] + jnp.cross(ang, d.xipos - root)
    Ri = d.ximat  # (nbody, 3, 3) world <- inertial
    lang = jnp.einsum("bij,bi->bj", Ri, ang)
    llin = jnp.einsum("bij,bi->bj", Ri, lin - m.opt.wind[None].astype(dtype))

    rho = m.opt.density
    beta = m.opt.viscosity
    diam = 2.0 * box.mean(axis=1)  # equivalent sphere diameter
    torque = -jnp.pi * diam[:, None] ** 3 * beta * lang
    force = -3.0 * jnp.pi * diam[:, None] * beta * llin
    B = 2.0 * box  # full box sides
    Bj = jnp.roll(B, -1, axis=1)
    Bk = jnp.roll(B, -2, axis=1)
    force = force - 0.5 * rho * Bj * Bk * jnp.abs(llin) * llin
    torque = torque - rho * B * (Bj**4 + Bk**4) * jnp.abs(lang) * lang / 64.0

    live = (mass > 1e-9)[:, None]
    fw = jnp.einsum("bij,bj->bi", Ri, jnp.where(live, force, 0.0))
    tw = jnp.einsum("bij,bj->bi", Ri, jnp.where(live, torque, 0.0))
    ang_t = tw + jnp.cross(d.xipos - root, fw)
    fspatial = jnp.concatenate([ang_t, fw], axis=-1)  # (nbody, 6)
    supports = _body_dof_support(s)
    return jnp.einsum("bv,vi,bi->v", jnp.asarray(supports, dtype), d.cdof, fspatial)


_MOMENT_CACHE: dict = {}


def _joint_trn_arrays(s):
    """Static helpers for actuator transmissions: (act ids on hinge/slide
    joints, their dof addrs, qpos addrs, other-joint act ids, tendon act ids,
    their tendon ids)."""
    key = (s, "trn")
    if key not in _MOMENT_CACHE:
        scalar_u, scalar_dof, scalar_qa = [], [], []
        other_u = []
        tendon_u, tendon_id = [], []
        site_u, site_id = [], []
        refsite_u, refsite_id, refsite_ref = [], [], []
        body_u, body_id = [], []
        inparent_u = []
        crank_u, crank_slider, crank_site = [], [], []
        refids = getattr(s, "actuator_refid", None)
        for u in range(s.nu):
            if int(s.actuator_trntype[u]) == int(TrnType.TENDON):
                tendon_u.append(u)
                tendon_id.append(int(s.actuator_trnid[u]))
                continue
            if int(s.actuator_trntype[u]) == int(TrnType.BODY):
                body_u.append(u)
                body_id.append(int(s.actuator_trnid[u]))
                continue
            if int(s.actuator_trntype[u]) == int(TrnType.SLIDERCRANK):
                crank_u.append(u)
                crank_slider.append(int(s.actuator_trnid[u]))
                crank_site.append(int(refids[u]))
                continue
            if int(s.actuator_trntype[u]) == int(TrnType.SITE):
                rid = int(refids[u]) if refids is not None else -1
                if rid >= 0:
                    refsite_u.append(u)
                    refsite_id.append(int(s.actuator_trnid[u]))
                    refsite_ref.append(rid)
                else:
                    site_u.append(u)
                    site_id.append(int(s.actuator_trnid[u]))
                continue
            j = int(s.actuator_trnid[u])
            jtype = JointType(int(s.jnt_type[j]))
            if jtype in (JointType.HINGE, JointType.SLIDE):
                # JOINT and JOINTINPARENT coincide for scalar joints
                scalar_u.append(u)
                scalar_dof.append(int(s.jnt_dofadr[j]))
                scalar_qa.append(int(s.jnt_qposadr[j]))
            elif int(s.actuator_trntype[u]) == int(TrnType.JOINTINPARENT):
                inparent_u.append(u)
            else:
                other_u.append(u)
        _MOMENT_CACHE[key] = (
            np.asarray(scalar_u, dtype=np.int32),
            np.asarray(scalar_dof, dtype=np.int32),
            np.asarray(scalar_qa, dtype=np.int32),
            np.asarray(other_u, dtype=np.int32),
            np.asarray(tendon_u, dtype=np.int32),
            np.asarray(tendon_id, dtype=np.int32),
            np.asarray(site_u, dtype=np.int32),
            np.asarray(site_id, dtype=np.int32),
            tuple(zip(refsite_u, refsite_id, refsite_ref)),
            tuple(zip(body_u, body_id)),
            tuple(inparent_u),
            tuple(zip(crank_u, crank_slider, crank_site)),
        )
    return _MOMENT_CACHE[key]


def actuator_moment(m: Model, d: Data) -> jax.Array:
    """(nu, nv) transmission moment matrix (joint/tendon/site transmissions)."""
    s = m.skel
    moment = jnp.zeros((s.nu, s.nv), d.qpos.dtype)
    (
        scalar_u,
        scalar_dof,
        _,
        other_u,
        tendon_u,
        tendon_id,
        site_u,
        site_id,
        refsites,
        bodies,
        inparent,
        cranks,
    ) = _joint_trn_arrays(s)
    if len(scalar_u):
        moment = moment.at[scalar_u, scalar_dof].set(m.actuator_gear[scalar_u, 0])
    for u in other_u:  # free/ball transmissions (rare): gear vector on the joint dofs
        j = int(s.actuator_trnid[u])
        da = int(s.jnt_dofadr[j])
        jtype = JointType(int(s.jnt_type[j]))
        width = jtype.dof_width if jtype == JointType.FREE else 3
        moment = moment.at[u, da : da + width].set(m.actuator_gear[u, :width])
    if len(tendon_u):  # tendon moment = gear0 * d(length)/d(qvel)
        moment = moment.at[tendon_u].set(
            m.actuator_gear[tendon_u, 0, None] * d.ten_J[tendon_id].astype(moment.dtype)
        )
    for u, sid in zip(site_u, site_id):
        # site transmission: a wrench gear[:3] (force) / gear[3:] (torque) in
        # the site frame, applied at the site (mj_transmission SITE, no refsite)
        u, sid = int(u), int(sid)
        b = int(s.site_bodyid[sid])
        Rs = d.site_xmat[sid]
        fdir = Rs @ m.actuator_gear[u, :3].astype(moment.dtype)
        tdir = Rs @ m.actuator_gear[u, 3:].astype(moment.dtype)
        jacp = _site_point_jac(m, d, d.site_xpos[sid], b)  # (nv, 3)
        sup = jnp.asarray(_body_dof_support(s)[b], moment.dtype)
        jacr = d.cdof[:, :3] * sup[:, None]
        moment = moment.at[u].set(jacp @ fdir + jacr @ tdir)
    for u in inparent:
        # JOINTINPARENT on ball/free rotations: gear given in the PARENT
        # frame, rotated into the joint (child) frame the dofs live in
        # (oracle-pinned: moment = R(q)^T @ gear)
        j = int(s.actuator_trnid[u])
        jtype = JointType(int(s.jnt_type[j]))
        da, qa = int(s.jnt_dofadr[j]), int(s.jnt_qposadr[j])
        g = m.actuator_gear[u].astype(moment.dtype)
        if jtype == JointType.BALL:
            R = am.quat_to_mat(am.normalize_quat(d.qpos[qa : qa + 4]))
            moment = moment.at[u, da : da + 3].set(R.T @ g[:3])
        else:  # FREE: translation already world-aligned; rotation dofs are child-frame
            R = am.quat_to_mat(am.normalize_quat(d.qpos[qa + 3 : qa + 7]))
            moment = moment.at[u, da : da + 3].set(g[:3])
            moment = moment.at[u, da + 3 : da + 6].set(R.T @ g[3:])
    for u, sid, cid in cranks:
        _, dlen = _slidercrank(m, d, u, sid, cid)
        moment = moment.at[u].set(m.actuator_gear[u, 0] * dlen)
    for u, sid, rid in refsites:
        # refsite transmission (mj_transmission SITE+refsite): Cartesian
        # pose-difference actuator. moment = gear-projected difference of the
        # two site Jacobians, rotated into the refsite frame.
        bs, br = int(s.site_bodyid[sid]), int(s.site_bodyid[rid])
        Rref = d.site_xmat[rid]  # world <- refsite
        jacp_s = _site_point_jac(m, d, d.site_xpos[sid], bs)  # (nv, 3)
        jacp_r = _site_point_jac(m, d, d.site_xpos[rid], br)
        sup_s = jnp.asarray(_body_dof_support(s)[bs], moment.dtype)
        sup_r = jnp.asarray(_body_dof_support(s)[br], moment.dtype)
        jacr_s = d.cdof[:, :3] * sup_s[:, None]
        jacr_r = d.cdof[:, :3] * sup_r[:, None]
        # rows are world 3-vectors; row @ Rref = Rref^T v (world -> refsite)
        jacdifp = (jacp_s - jacp_r) @ Rref
        jacdifr = (jacr_s - jacr_r) @ Rref
        g = m.actuator_gear[u].astype(moment.dtype)
        moment = moment.at[u].set(jacdifp @ g[:3] + jacdifr @ g[3:])
    if bodies:
        # adhesion (BODY) transmission: moment = -mean of the contact-normal
        # Jacobian rows over contacts involving the body, counting contacts
        # within includemargin (the full margin reach: MuJoCo 3.10 no longer
        # subtracts gap, so adhesion-at-a-distance rides margin alone).
        from ambersim_tpu.engine import constraint as _con

        c = d.contact
        gsup_np = _con._geom_support(s)  # (ngeom, nv)
        static_slots = len(s.bpg_adr) == 0 and s.ncon == s.ncand
        if static_slots:
            signed_sup = jnp.asarray(
                gsup_np[s.con_geom2] - gsup_np[s.con_geom1], moment.dtype
            )
            gb1 = s.geom_bodyid[s.con_geom1]  # numpy, static
            gb2 = s.geom_bodyid[s.con_geom2]
        else:
            gsup = jnp.asarray(gsup_np, moment.dtype)
            signed_sup = gsup[c.geom2] - gsup[c.geom1]
            gbody = jnp.asarray(s.geom_bodyid)
            gb1, gb2 = gbody[c.geom1], gbody[c.geom2]
        jn = _con._frame_rows(c.frame, _con._point_jac_rows(m, d, c.pos, signed_sup))[0]
        within = c.dist < c.includemargin
        for u, b in bodies:
            bmask = (gb1 == b) | (gb2 == b)
            mask = within & (jnp.asarray(bmask) if static_slots else bmask)
            cnt = jnp.sum(mask.astype(moment.dtype))
            row = -jnp.where(mask[:, None], jn, 0.0).sum(axis=0) / jnp.maximum(cnt, 1.0)
            moment = moment.at[u].set(row)
    return moment


def _quat2vel(q: jax.Array) -> jax.Array:
    """mju_quat2Vel(q, dt=1): expmap 3-vector of a quaternion, without the
    shortest-arc sign flip (ball-joint transmission lengths use the raw
    qpos quat)."""
    s2 = jnp.sum(q[1:] * q[1:])
    good = s2 > 1e-24
    sin_half = jnp.sqrt(jnp.where(good, s2, 1.0))
    angle = 2.0 * jnp.arctan2(sin_half, q[0])
    return jnp.where(good, q[1:] / sin_half * angle, 2.0 * q[1:])


def _slidercrank(m: Model, d: Data, u: int, sid: int, cid: int):
    """Slider-crank transmission (mj_transmission SLIDERCRANK): a rod of
    length r connects the crank site to a piston sliding along the slider
    site's z axis. length = a.v - sqrt((a.v)^2 - v.v + r^2) with v the
    slider->crank vector; when the discriminant goes non-positive the rod is
    'broken' and the sqrt term (and its gradient) drops out (oracle-pinned).
    Returns (length, d(length)/d(qvel)) WITHOUT the gear scaling."""
    s = m.skel
    dtype = d.qpos.dtype
    bs, bc = int(s.site_bodyid[sid]), int(s.site_bodyid[cid])
    a = d.site_xmat[sid][:, 2]
    v = d.site_xpos[cid] - d.site_xpos[sid]
    jac_c = _site_point_jac(m, d, d.site_xpos[cid], bc)  # (nv, 3)
    jac_s = _site_point_jac(m, d, d.site_xpos[sid], bs)
    sup_s = jnp.asarray(_body_dof_support(s)[bs], dtype)
    jacr_s = d.cdof[:, :3] * sup_s[:, None]
    dv = jac_c - jac_s  # (nv, 3)
    da = jnp.cross(jacr_s, a[None, :])  # (nv, 3): d(a)/dqvel_k = w_k x a
    av = a @ v
    dav = dv @ a + da @ v  # (nv,)
    r = m.actuator_cranklength[u]
    sdet = av * av - v @ v + r * r
    ok = sdet > 1e-12
    sq = jnp.sqrt(jnp.where(ok, sdet, 1.0))
    length = av - jnp.where(ok, sq, 0.0)
    dlen = dav - jnp.where(ok, (av * dav - dv @ v) / sq, 0.0)
    return length, dlen


def refsite_length(m: Model, d: Data, length: jax.Array) -> jax.Array:
    """Transmission lengths of refsite actuators: gear-projected 6D pose
    difference of site relative to refsite, expressed in the refsite frame
    (translation in meters, rotation as the expmap 3-vector)."""
    s = m.skel
    refsites = _joint_trn_arrays(s)[8]
    for u, sid, rid in refsites:
        bs, br = int(s.site_bodyid[sid]), int(s.site_bodyid[rid])
        Rref = d.site_xmat[rid]
        vec = Rref.T @ (d.site_xpos[sid] - d.site_xpos[rid])
        # MuJoCo composes the site/refsite quats for this length as
        # site_quat_local * body_xquat (local quat on the LEFT) — verified
        # numerically against mj_forward on randomized models; using the
        # world site rotation (body * local) disagrees whenever the site has
        # a local orientation offset.
        qs = am.mul_quat(m.site_quat[sid], d.xquat[bs])
        qr = am.mul_quat(m.site_quat[rid], d.xquat[br])
        rot = am.quat_sub(qs, qr)
        g = m.actuator_gear[u].astype(length.dtype)
        length = length.at[u].set(g[:3] @ vec + g[3:] @ rot)
    return length


def clamped_ctrl(m: Model, d: Data) -> jax.Array:
    """ctrl with ctrlrange clamping applied (unless CLAMPCTRL disabled)."""
    ctrl = d.ctrl
    if not (m.opt.disableflags & DisableBit.CLAMPCTRL):
        limited = jnp.asarray(m.skel.actuator_ctrllimited)
        lo, hi = m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1]
        ctrl = jnp.where(limited, jnp.clip(ctrl, lo, hi), ctrl)
    return ctrl


def act_input(m: Model, d: Data) -> jax.Array:
    """Per-actuator force input: clamped ctrl, with activation state substituted
    for actuators that have dynamics (dyntype != none)."""
    s = m.skel
    inp = clamped_ctrl(m, d)
    if s.na:
        dyn_u = np.nonzero(s.actuator_dyntype != int(DynType.NONE))[0]
        inp = inp.at[dyn_u].set(d.act)
    return inp


_EPS_MUSCLE = 1e-10


def muscle_gain_bias(m: Model, length: jax.Array, velocity: jax.Array):
    """Vectorized FLV muscle curves (mju_muscleGain / mju_muscleBias).

    Formulas oracle-pinned against mujoco.mju_muscleGain/Bias over a
    length/velocity grid (tests/test_muscle.py). Returns (gain, bias) rows for
    every actuator; callers select the MUSCLE-typed ones."""
    prm = m.actuator_gainprm  # (nu, 9); biasprm == gainprm for muscles
    LR = m.actuator_lengthrange
    r0, r1, force, scale, lmin, lmax, vmax, fpmax, fvmax = (prm[:, i] for i in range(9))
    force = jnp.where(force < 0, scale / jnp.maximum(m.actuator_acc0, _EPS_MUSCLE), force)
    L0 = (LR[:, 1] - LR[:, 0]) / jnp.maximum(r1 - r0, _EPS_MUSCLE)
    L = r0 + (length - LR[:, 0]) / jnp.maximum(L0, _EPS_MUSCLE)
    V = velocity / jnp.maximum(L0 * vmax, _EPS_MUSCLE)

    # active force-length: piecewise-quadratic bump over [lmin, 1, lmax]
    left = 0.5 * (lmin + 1.0)
    right = 0.5 * (1.0 + lmax)
    sq = lambda x: x * x  # noqa: E731
    FL = jnp.where(
        (L <= lmin) | (L >= lmax),
        0.0,
        jnp.where(
            L < left,
            0.5 * sq((L - lmin) / jnp.maximum(left - lmin, _EPS_MUSCLE)),
            jnp.where(
                L < 1.0,
                1.0 - 0.5 * sq((1.0 - L) / jnp.maximum(1.0 - left, _EPS_MUSCLE)),
                jnp.where(
                    L < right,
                    1.0 - 0.5 * sq((L - 1.0) / jnp.maximum(right - 1.0, _EPS_MUSCLE)),
                    0.5 * sq((lmax - L) / jnp.maximum(lmax - right, _EPS_MUSCLE)),
                ),
            ),
        ),
    )
    # force-velocity: parabolic in [-1, 0], saturating at fvmax
    y = fvmax - 1.0
    FV = jnp.where(
        V <= -1.0,
        0.0,
        jnp.where(
            V <= 0.0,
            sq(V + 1.0),
            jnp.where(V <= y, fvmax - sq(y - V) / jnp.maximum(y, _EPS_MUSCLE), fvmax),
        ),
    )
    # passive force-length: quadratic ramp to fpmax/2 at b, linear beyond
    b = 0.5 * (1.0 + lmax)
    xb = jnp.maximum(b - 1.0, _EPS_MUSCLE)
    FP = jnp.where(
        L <= 1.0,
        0.0,
        jnp.where(L <= b, 0.5 * fpmax * sq((L - 1.0) / xb), fpmax * (0.5 + (L - b) / xb)),
    )
    return -force * FL * FV, -force * FP


def muscle_dynamics(m: Model, ctrl: jax.Array, act: jax.Array, dyn_u) -> jax.Array:
    """Vectorized mju_muscleDynamics (activation ODE with optional quintic
    smoothstep time-constant blending). ctrl/act are the dyn_u slices."""
    prm = m.actuator_dynprm[dyn_u]
    tau_act, tau_deact, tsmooth = prm[:, 0], prm[:, 1], prm[:, 2]
    c = jnp.clip(ctrl, 0.0, 1.0)
    dctrl = c - act
    t1 = tau_act * (0.5 + 1.5 * act)
    t2 = tau_deact / (0.5 + 1.5 * act)
    xs = jnp.clip(dctrl / jnp.maximum(tsmooth, _EPS_MUSCLE) + 0.5, 0.0, 1.0)
    sig = xs * xs * xs * (xs * (6.0 * xs - 15.0) + 10.0)
    tau = jnp.where(tsmooth > 0, t2 + (t1 - t2) * sig, jnp.where(dctrl > 0, t1, t2))
    return dctrl / jnp.maximum(tau, _EPS_MUSCLE)


def fwd_actuation(m: Model, d: Data) -> Data:
    """ctrl -> generalized actuator force (fixed gain + affine bias)."""
    s = m.skel
    dtype = d.qpos.dtype
    if s.nu == 0:
        return d.replace(qfrc_actuator=jnp.zeros(s.nv, dtype))

    ctrl = clamped_ctrl(m, d)

    (
        scalar_u,
        scalar_dof,
        scalar_qa,
        other_u,
        tendon_u,
        tendon_id,
        _,
        _,
        refsites,
        _,
        inparent,
        cranks,
    ) = _joint_trn_arrays(s)
    length = jnp.zeros(s.nu, dtype)
    if len(scalar_u):
        length = length.at[scalar_u].set(d.qpos[scalar_qa] * m.actuator_gear[scalar_u, 0])
    if len(tendon_u):
        length = length.at[tendon_u].set(d.ten_length[tendon_id] * m.actuator_gear[tendon_u, 0])
    for u in list(other_u) + list(inparent):
        # ball-joint transmission length = gear . expmap(joint quat); the
        # rotation vector is frame-invariant under the joint's own rotation,
        # so JOINT and JOINTINPARENT lengths coincide (free joints read 0)
        j = int(s.actuator_trnid[u])
        if JointType(int(s.jnt_type[j])) != JointType.BALL:
            continue
        qa = int(s.jnt_qposadr[j])
        g = m.actuator_gear[u].astype(dtype)
        length = length.at[u].set(g[:3] @ _quat2vel(am.normalize_quat(d.qpos[qa : qa + 4])))
    if refsites:
        length = refsite_length(m, d, length)
    for u, sid, cid in cranks:
        sc_len, _ = _slidercrank(m, d, u, sid, cid)
        length = length.at[u].set(m.actuator_gear[u, 0] * sc_len)
    moment = actuator_moment(m, d)
    velocity = moment @ d.qvel

    gaintype = jnp.asarray(s.actuator_gaintype)
    biastype = jnp.asarray(s.actuator_biastype)
    gain = jnp.where(
        gaintype == int(GainType.FIXED),
        m.actuator_gainprm[:, 0],
        m.actuator_gainprm[:, 0] + m.actuator_gainprm[:, 1] * length + m.actuator_gainprm[:, 2] * velocity,
    )
    bias = jnp.where(
        biastype == int(BiasType.AFFINE),
        m.actuator_biasprm[:, 0] + m.actuator_biasprm[:, 1] * length + m.actuator_biasprm[:, 2] * velocity,
        0.0,
    )
    if bool((s.actuator_gaintype == int(GainType.MUSCLE)).any()):
        mgain, mbias = muscle_gain_bias(m, length, velocity)
        gain = jnp.where(gaintype == int(GainType.MUSCLE), mgain, gain)
        bias = jnp.where(biastype == int(BiasType.MUSCLE), mbias, bias)

    # activation dynamics: dyntype FILTER (act_dot = (ctrl-act)/tau),
    # INTEGRATOR (act_dot = ctrl), MUSCLE (FLV activation ODE); actuators
    # with dynamics drive force via act
    act_dot = d.act_dot
    act_input = ctrl
    if s.na:
        dyn_u = np.nonzero(s.actuator_dyntype != int(DynType.NONE))[0]
        is_filter = jnp.asarray(
            (s.actuator_dyntype[dyn_u] == int(DynType.FILTER))
            | (s.actuator_dyntype[dyn_u] == int(DynType.FILTEREXACT))
        )
        tau = jnp.maximum(m.actuator_dynprm[dyn_u, 0], 1e-8)
        act_dot = jnp.where(is_filter, (ctrl[dyn_u] - d.act) / tau, ctrl[dyn_u])
        if bool((s.actuator_dyntype == int(DynType.MUSCLE)).any()):
            is_muscle = jnp.asarray(s.actuator_dyntype[dyn_u] == int(DynType.MUSCLE))
            act_dot = jnp.where(
                is_muscle, muscle_dynamics(m, ctrl[dyn_u], d.act, dyn_u), act_dot
            )
        act_input = act_input.at[dyn_u].set(d.act)
    force = gain * act_input + bias

    limited_f = jnp.asarray(s.actuator_forcelimited)
    force = jnp.where(
        limited_f, jnp.clip(force, m.actuator_forcerange[:, 0], m.actuator_forcerange[:, 1]), force
    )
    if m.opt.disableactuator:
        # <option actuatorgroupdisable>: zero force for actuators in disabled
        # groups (static mask). Lengths/velocities and activation dynamics
        # still run, matching mj_fwdActuation (oracle-pinned: a disabled
        # filter actuator keeps integrating act).
        disabled = np.asarray(
            (m.opt.disableactuator >> np.clip(s.actuator_group, 0, 30)) & 1, bool
        ) & (np.asarray(s.actuator_group) >= 0)
        force = jnp.where(jnp.asarray(disabled), 0.0, force)
    qfrc = moment.T @ force
    if np.asarray(s.jnt_actfrclimited).any():
        # joint-level actuatorfrcrange: clamp total actuator force per dof
        # (mj_fwdActuation's qfrc_actuator clamp)
        dof_jnt = np.asarray(s.dof_jntid)
        lim = np.asarray(s.jnt_actfrclimited)[dof_jnt]  # (nv,) static
        # index the (possibly numpy) model leaf with the static numpy map —
        # numpy_leaf[jnp_index] breaks under trace (tracer __array__)
        rng = jnp.asarray(m.jnt_actfrcrange)[dof_jnt]
        qfrc = jnp.where(jnp.asarray(lim), jnp.clip(qfrc, rng[:, 0], rng[:, 1]), qfrc)
    if m.opt.disableflags & DisableBit.ACTUATION:
        force = jnp.zeros_like(force)
        qfrc = jnp.zeros_like(qfrc)
    return d.replace(
        actuator_length=length,
        actuator_velocity=velocity,
        actuator_force=force,
        act_dot=act_dot,
        qfrc_actuator=qfrc,
        ctrl=d.ctrl,
    )


def xfrc_accumulate(m: Model, d: Data) -> jax.Array:
    """Map xfrc_applied (force/torque at body com, world frame; MuJoCo layout)
    to qfrc."""
    s = m.skel
    if s.nv == 0 or s.nbody <= 1:
        return jnp.zeros(s.nv, d.qpos.dtype)
    origin = d.subtree_com[s.body_rootid]  # (nbody, 3)
    force = d.xfrc_applied[:, :3]
    torque = d.xfrc_applied[:, 3:]
    ang = torque + jnp.cross(d.xipos - origin, force)
    fspatial = jnp.concatenate([ang, force], axis=-1)  # (nbody, 6)
    supports = _body_dof_support(s)  # (nbody, nv) static
    return jnp.einsum("bv,vi,bi->v", jnp.asarray(supports, d.qpos.dtype), d.cdof, fspatial)


_SUPPORT_CACHE: dict = {}


def _body_dof_support(s):
    key = (s, "support")
    if key not in _SUPPORT_CACHE:
        sup = np.zeros((s.nbody, s.nv), dtype=bool)
        for b in range(s.nbody):
            bb = b
            while bb > 0:
                da, dn = int(s.body_dofadr[bb]), int(s.body_dofnum[bb])
                if dn:
                    sup[b, da : da + dn] = True
                bb = int(s.body_parentid[bb])
        _SUPPORT_CACHE[key] = sup
    return _SUPPORT_CACHE[key]


def _site_point_jac(m: Model, d: Data, p: jax.Array, bodyid: int) -> jax.Array:
    """(nv, 3) translational jacobian of world point p attached to body bodyid."""
    s = m.skel
    sup = _body_dof_support(s)[bodyid]  # (nv,) static
    origin = d.subtree_com[s.body_rootid[s.dof_bodyid]]  # (nv, 3)
    ang, lin = d.cdof[:, :3], d.cdof[:, 3:]
    return (lin + jnp.cross(ang, p[None] - origin)) * jnp.asarray(sup, d.qpos.dtype)[:, None]


def _straight_seg(m: Model, d: Data, p1, b1, p2, b2):
    """Length + (nv,) jacobian row of a straight tendon segment."""
    v = p2 - p1
    ln = jnp.linalg.norm(v)
    u = v / jnp.maximum(ln, 1e-12)
    djac = _site_point_jac(m, d, p2, b2) - _site_point_jac(m, d, p1, b1)
    return ln, djac @ u


def _wrap_seg(m: Model, d: Data, p1, b1, p2, b2, gid: int, side_sid: int):
    """Tendon segment wrapping a sphere/cylinder geom (cf. mju_wrap).

    Branchless: computes both the wrapped (tangent-arc-tangent) and straight
    paths and selects by the wrap condition. Tangent points are material
    points on the wrap geom's body; by the taut-string envelope argument the
    jacobian is the two straight end segments' only (the arc contributes no
    independent term)."""
    from ambersim_tpu.core.types import GeomType

    s = m.skel
    dtype = d.qpos.dtype
    R = d.geom_xmat[gid]  # world <- local
    c = d.geom_xpos[gid]
    bg = int(s.geom_bodyid[gid])
    r = m.geom_size[gid, 0]
    a = R.T @ (p1 - c)
    b = R.T @ (p2 - c)
    is_cyl = int(s.geom_type[gid]) == int(GeomType.CYLINDER)

    eps = jnp.asarray(1e-12, dtype)
    if is_cyl:
        # 2D circle problem in the plane perpendicular to the cylinder axis
        A3, B3 = a.at[2].set(0.0), b.at[2].set(0.0)
        e1 = A3 / jnp.maximum(jnp.linalg.norm(A3), eps)
        axis = jnp.asarray([0.0, 0.0, 1.0], dtype)
        perp = jnp.cross(axis, e1)
        sigma = jnp.where(B3 @ perp >= 0, 1.0, -1.0)
        e2 = sigma * perp  # so B has nonnegative e2 component
        A2 = jnp.array([A3 @ e1, 0.0])
        B2 = jnp.array([B3 @ e1, B3 @ e2])
    else:
        # sphere: 2D problem in the plane through a, b and the center
        e1 = a / jnp.maximum(jnp.linalg.norm(a), eps)
        borth = b - (b @ e1) * e1
        e2 = borth / jnp.maximum(jnp.linalg.norm(borth), eps)
        A2 = jnp.array([a @ e1, 0.0])
        B2 = jnp.array([b @ e1, b @ e2])

    la = jnp.maximum(jnp.linalg.norm(A2), eps)
    lb = jnp.maximum(jnp.linalg.norm(B2), eps)
    phi = jnp.arccos(jnp.clip((A2 @ B2) / (la * lb), -1.0, 1.0))  # [0, pi]

    # wrap side: the taut path must pass the circle on the sidesite's side of
    # the center. The short-way tangent path lies on the same side of the
    # center as the chord itself, so a sidesite across the chord from the
    # center forces the long way around (oracle-pinned vs mju_wrap wrap_xpos).
    # A sidesite INSIDE the geom switches to interior wrapping below.
    side_inside = jnp.asarray(False)
    if side_sid >= 0:
        ss = R.T @ (d.site_xpos[side_sid] - c)
        ss_p = ss.at[2].set(0.0) if is_cyl else ss
        S2 = jnp.array([ss_p @ e1, ss_p @ e2])
        side_inside = jnp.linalg.norm(S2) < r
        chord = B2 - A2
        nvec = jnp.array([-chord[1], chord[0]])
        nvec = nvec / jnp.maximum(jnp.linalg.norm(nvec), eps)
        h_line = nvec @ A2  # chord offset from the center
        h_side = nvec @ S2  # sidesite offset from the center
        sgn = jnp.where(h_line * h_side >= 0, 1.0, -1.0)
    else:
        sgn = jnp.asarray(1.0, dtype)
    big_phi = jnp.where(sgn > 0, phi, 2.0 * jnp.pi - phi)

    alpha_a = jnp.arccos(jnp.clip(r / la, -1.0, 1.0))
    alpha_b = jnp.arccos(jnp.clip(r / lb, -1.0, 1.0))
    # wrap iff the tangent construction on the chosen side has a nonnegative
    # arc: without a sidesite (big_phi = phi) that is exactly "the straight
    # chord crosses the circle"; a sidesite on the far side of the chord
    # forces big_phi = 2*pi - phi, wrapping the long way around (mju_wrap
    # semantics, pinned by the oracle's wrap_xpos path)
    wrapped = (big_phi > alpha_a + alpha_b) & (la > r) & (lb > r)
    arc_ang = jnp.maximum(big_phi - alpha_a - alpha_b, 0.0)

    t1_ang = sgn * alpha_a
    t2_ang = phi - sgn * alpha_b
    if is_cyl:
        T1_2d = r * jnp.array([jnp.cos(t1_ang), jnp.sin(t1_ang)])
        T2_2d = r * jnp.array([jnp.cos(t2_ang), jnp.sin(t2_ang)])
        len_a2 = jnp.sqrt(jnp.maximum(la * la - r * r, eps))
        len_b2 = jnp.sqrt(jnp.maximum(lb * lb - r * r, eps))
        arc2 = r * arc_ang
        tot2 = jnp.maximum(len_a2 + arc2 + len_b2, eps)
        z1 = a[2] + (b[2] - a[2]) * len_a2 / tot2
        z2 = a[2] + (b[2] - a[2]) * (len_a2 + arc2) / tot2
        T1 = T1_2d[0] * e1 + T1_2d[1] * e2 + z1 * jnp.array([0.0, 0.0, 1.0], dtype=dtype)
        T2 = T2_2d[0] * e1 + T2_2d[1] * e2 + z2 * jnp.array([0.0, 0.0, 1.0], dtype=dtype)
        arc_len = jnp.sqrt(arc2 * arc2 + (z2 - z1) ** 2)
        L_wrap = (
            jnp.sqrt(len_a2 * len_a2 + (z1 - a[2]) ** 2)
            + arc_len
            + jnp.sqrt(len_b2 * len_b2 + (b[2] - z2) ** 2)
        )
    else:
        T1 = r * (jnp.cos(t1_ang) * e1 + jnp.sin(t1_ang) * e2)
        T2 = r * (jnp.cos(t2_ang) * e1 + jnp.sin(t2_ang) * e2)
        L_wrap = (
            jnp.sqrt(jnp.maximum(la * la - r * r, eps))
            + r * arc_ang
            + jnp.sqrt(jnp.maximum(lb * lb - r * r, eps))
        )

    T1w = c + R @ T1
    T2w = c + R @ T2
    l1, j1 = _straight_seg(m, d, p1, b1, T1w, bg)
    l2, j2 = _straight_seg(m, d, T2w, bg, p2, b2)
    del l1, l2  # wrapped length uses the closed-form L_wrap above

    L_str, J_str = _straight_seg(m, d, p1, b1, p2, b2)

    if side_sid >= 0:
        # interior wrap (sidesite inside the geom, mju_wrap 'wrap_inside'):
        # if the straight segment misses the disk, the tendon bends at the
        # single circle point minimizing total length — solved by bisection on
        # the reflection condition T'(theta) . (u1 + u2) = 0, theta in [0, phi].
        # Only traced when a sidesite exists statically (the mask side_inside
        # is runtime, but tendons without sidesites can never take this path).
        A2v = jnp.array([la, 0.0])
        B2v = jnp.array([lb * jnp.cos(phi), lb * jnp.sin(phi)])

        def _h(theta):
            T = r * jnp.array([jnp.cos(theta), jnp.sin(theta)])
            u1 = (T - A2v) / jnp.maximum(jnp.linalg.norm(T - A2v), eps)
            u2 = (T - B2v) / jnp.maximum(jnp.linalg.norm(T - B2v), eps)
            Tp = jnp.array([-jnp.sin(theta), jnp.cos(theta)])
            return Tp @ (u1 + u2)

        lo_t, hi_t = jnp.zeros(()), phi
        h_lo = _h(lo_t)
        for _ in range(30):
            mid_t = 0.5 * (lo_t + hi_t)
            h_mid = _h(mid_t)
            same = h_mid * h_lo > 0
            lo_t = jnp.where(same, mid_t, lo_t)
            h_lo = jnp.where(same, h_mid, h_lo)
            hi_t = jnp.where(same, hi_t, mid_t)
        theta_b = 0.5 * (lo_t + hi_t)
        Tb2 = r * jnp.array([jnp.cos(theta_b), jnp.sin(theta_b)])
        lenA2 = jnp.linalg.norm(Tb2 - A2v)
        lenB2 = jnp.linalg.norm(Tb2 - B2v)
        if is_cyl:
            z_b = a[2] + (b[2] - a[2]) * lenA2 / jnp.maximum(lenA2 + lenB2, eps)
            Tb = Tb2[0] * e1 + Tb2[1] * e2 + z_b * jnp.array([0.0, 0.0, 1.0], dtype=dtype)
        else:
            Tb = Tb2[0] * e1 + Tb2[1] * e2
        Tbw = c + R @ Tb
        lb1, jb1 = _straight_seg(m, d, p1, b1, Tbw, bg)
        lb2, jb2 = _straight_seg(m, d, Tbw, bg, p2, b2)
        bend = side_inside & (phi <= alpha_a + alpha_b) & (la > r) & (lb > r)
        wrapped = wrapped & (~side_inside)
        L = jnp.where(wrapped, L_wrap, jnp.where(bend, lb1 + lb2, L_str))
        J = jnp.where(wrapped, j1 + j2, jnp.where(bend, jb1 + jb2, J_str))
        return L, J

    L = jnp.where(wrapped, L_wrap, L_str)
    J = jnp.where(wrapped, j1 + j2, J_str)
    return L, J


def _spatial_tendon(m: Model, d: Data, path):
    """Length + (nv,) jacobian of one spatial tendon (static path unroll)."""
    s = m.skel
    dtype = d.qpos.dtype
    L = jnp.zeros((), dtype)
    J = jnp.zeros((s.nv,), dtype)
    div = 1.0
    prev = None  # (world point, bodyid)
    pending_geom = None
    for el in path:
        if el[0] == "pulley":
            div = el[1]
            prev = None
            pending_geom = None
        elif el[0] == "geom":
            pending_geom = (el[1], el[2])
        else:  # site
            sid = el[1]
            p = d.site_xpos[sid]
            b = int(s.site_bodyid[sid])
            if prev is not None:
                if pending_geom is None:
                    dL, dJ = _straight_seg(m, d, prev[0], prev[1], p, b)
                else:
                    dL, dJ = _wrap_seg(m, d, prev[0], prev[1], p, b, *pending_geom)
                L = L + dL / div
                J = J + dJ / div
                pending_geom = None
            prev = (p, b)
    return L, J


def tendon(m: Model, d: Data) -> Data:
    """Tendon lengths + jacobians. Fixed tendons are linear in qpos with the
    compile-time jacobian; spatial tendons run the site/wrap path geometry."""
    s = m.skel
    if s.ntendon == 0:
        return d
    dtype = d.qpos.dtype
    ten_length = (m.tendon_Jq @ d.qpos).astype(dtype)
    ten_J = jnp.asarray(m.tendon_J, dtype)
    for t in range(s.ntendon):
        if s.tendon_kind[t] != "spatial":
            continue
        L, Jrow = _spatial_tendon(m, d, s.tendon_path[t])
        ten_length = ten_length.at[t].set(L)
        ten_J = ten_J.at[t].set(Jrow)
    return d.replace(ten_length=ten_length, ten_J=ten_J)


def fwd_position_smooth(m: Model, d: Data) -> Data:
    d = kinematics(m, d)
    d = com_pos(m, d)
    if m.skel.ncam or m.skel.nlight:
        d = camlight(m, d)
    d = tendon(m, d)
    d = crb(m, d)
    d = factor_m(m, d)
    return d


def fwd_velocity(m: Model, d: Data) -> Data:
    if m.skel.ntendon:
        d = d.replace(ten_velocity=d.ten_J @ d.qvel)
    d = com_vel(m, d)
    d = passive(m, d)
    d = rne(m, d)
    return d


def fwd_acceleration(m: Model, d: Data) -> Data:
    qfrc_smooth = d.qfrc_passive + d.qfrc_actuator + d.qfrc_applied + xfrc_accumulate(m, d) - d.qfrc_bias
    qacc_smooth = solve_m(m, d, qfrc_smooth)
    return d.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)
