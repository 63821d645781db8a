"""Smooth (unconstrained) dynamics: FK, COM quantities, CRBA, RNEA,
passive forces, actuation.

Reimplements the pipeline stages of mjx.forward that the reference's hot loop
runs (reference: ambersim/rl/base.py:93 `mjx.step`; stage list documented in
SURVEY.md §3.4), with MuJoCo-compatible semantics verified against the host
oracle per stage.

TPU-first structure: the body loop is unrolled at trace time over the static
skeleton (parents precede children in DFS order), producing straight-line XLA
that fuses; the mass matrix is assembled with two einsums + a static ancestor
mask instead of sparse composite propagation; everything batches with vmap.

All functions take (Model, Data) for a SINGLE env and return updated Data.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ambersim_tpu.core import math as am
from ambersim_tpu.core.types import BiasType, Data, DisableBit, DynType, GainType, JointType, Model


def kinematics(m: Model, d: Data) -> Data:
    """Forward kinematics: joint -> cartesian body/geom/joint frames."""
    s = m.skel
    xpos = [jnp.zeros(3, d.qpos.dtype) for _ in range(s.nbody)]
    xquat = [jnp.array([1.0, 0, 0, 0], dtype=d.qpos.dtype) for _ in range(s.nbody)]
    xanchor = [None] * s.njnt
    xaxis = [None] * s.njnt

    for b in range(1, s.nbody):
        p = int(s.body_parentid[b])
        pos = xpos[p] + am.rotate(m.body_pos[b], xquat[p])
        quat = am.mul_quat(xquat[p], m.body_quat[b])
        jadr, jnum = int(s.body_jntadr[b]), int(s.body_jntnum[b])
        for j in range(jadr, jadr + jnum):
            jtype = JointType(int(s.jnt_type[j]))
            qa = int(s.jnt_qposadr[j])
            if jtype == JointType.FREE:
                pos = d.qpos[qa : qa + 3]
                quat = am.normalize_quat(d.qpos[qa + 3 : qa + 7])
                xanchor[j] = pos
                xaxis[j] = am.rotate(m.jnt_axis[j], quat)
            elif jtype == JointType.BALL:
                qloc = am.normalize_quat(d.qpos[qa : qa + 4])
                anchor = pos + am.rotate(m.jnt_pos[j], quat)
                quat = am.mul_quat(quat, qloc)
                pos = anchor - am.rotate(m.jnt_pos[j], quat)
                xanchor[j] = anchor
                xaxis[j] = am.rotate(m.jnt_axis[j], quat)
            elif jtype == JointType.HINGE:
                angle = d.qpos[qa] - m.qpos0[qa]
                anchor = pos + am.rotate(m.jnt_pos[j], quat)
                qloc = am.axis_angle_to_quat(m.jnt_axis[j], angle)
                quat = am.mul_quat(quat, qloc)
                pos = anchor - am.rotate(m.jnt_pos[j], quat)
                xanchor[j] = anchor
                xaxis[j] = am.rotate(m.jnt_axis[j], quat)
            else:  # SLIDE
                pos = pos + am.rotate(m.jnt_axis[j], quat) * (d.qpos[qa] - m.qpos0[qa])
                xanchor[j] = pos + am.rotate(m.jnt_pos[j], quat)
                xaxis[j] = am.rotate(m.jnt_axis[j], quat)
        xpos[b] = pos
        xquat[b] = am.normalize_quat(quat)

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)
    xanchor_a = jnp.stack(xanchor) if s.njnt else jnp.zeros((0, 3), xpos.dtype)
    xaxis_a = jnp.stack(xaxis) if s.njnt else jnp.zeros((0, 3), xpos.dtype)

    # inertial and geom frames (batched over bodies/geoms)
    xipos = xpos + am.rotate(m.body_ipos, xquat)
    ximat = am.quat_to_mat(am.mul_quat(xquat, m.body_iquat))
    bid = s.geom_bodyid
    geom_xpos = xpos[bid] + am.rotate(m.geom_pos, xquat[bid])
    geom_xmat = am.quat_to_mat(am.mul_quat(xquat[bid], m.geom_quat))

    return d.replace(
        xpos=xpos,
        xquat=xquat,
        xanchor=xanchor_a,
        xaxis=xaxis_a,
        xipos=xipos,
        ximat=ximat,
        geom_xpos=geom_xpos,
        geom_xmat=geom_xmat,
    )


def com_pos(m: Model, d: Data) -> Data:
    """Subtree COM, com-frame spatial inertias (cinert) and dof axes (cdof)."""
    s = m.skel

    # subtree com: bottom-up accumulation (unrolled, reverse DFS order)
    mass_acc = [m.body_mass[b] for b in range(s.nbody)]
    mpos_acc = [m.body_mass[b] * d.xipos[b] for b in range(s.nbody)]
    for b in range(s.nbody - 1, 0, -1):
        p = int(s.body_parentid[b])
        mass_acc[p] = mass_acc[p] + mass_acc[b]
        mpos_acc[p] = mpos_acc[p] + mpos_acc[b]
    subtree_mass = jnp.stack(mass_acc)
    subtree_com = jnp.stack(mpos_acc) / jnp.maximum(subtree_mass, 1e-12)[:, None]

    # per-body com-frame origin: subtree com of the body's kinematic root
    origin = subtree_com[s.body_rootid]  # (nbody, 3)

    # cinert: spatial inertia about the com-frame origin
    inertia_world = d.ximat @ (m.body_inertia[:, :, None] * jnp.swapaxes(d.ximat, -1, -2))
    cinert = am.spatial_inertia(m.body_mass, inertia_world, d.xipos - origin)

    # cdof
    cdofs = []
    for j in range(s.njnt):
        jtype = JointType(int(s.jnt_type[j]))
        b = int(s.jnt_bodyid[j])
        o = origin[b]
        if jtype == JointType.FREE:
            eye3 = jnp.eye(3, dtype=d.qpos.dtype)
            for k in range(3):  # translation dofs: world axes
                cdofs.append(jnp.concatenate([jnp.zeros(3, d.qpos.dtype), eye3[k]]))
            xmat = am.quat_to_mat(d.xquat[b])
            for k in range(3):  # rotation dofs: body-frame axes, anchored at body origin
                ax = xmat[:, k]
                cdofs.append(jnp.concatenate([ax, jnp.cross(ax, o - d.xanchor[j])]))
        elif jtype == JointType.BALL:
            xmat = am.quat_to_mat(d.xquat[b])
            for k in range(3):
                ax = xmat[:, k]
                cdofs.append(jnp.concatenate([ax, jnp.cross(ax, o - d.xanchor[j])]))
        elif jtype == JointType.HINGE:
            ax = d.xaxis[j]
            cdofs.append(jnp.concatenate([ax, jnp.cross(ax, o - d.xanchor[j])]))
        else:  # SLIDE
            cdofs.append(jnp.concatenate([jnp.zeros(3, d.qpos.dtype), d.xaxis[j]]))
    cdof = jnp.stack(cdofs) if cdofs else jnp.zeros((0, 6), d.qpos.dtype)

    return d.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


def com_vel(m: Model, d: Data) -> Data:
    """Body spatial velocities and cdof time-derivatives (mirrors mj_comVel).

    cdof_dot[j] = cvel_running x cdof[j], where cvel_running is the body
    velocity accumulated over the parent and *preceding* joints only; a free
    joint's world-fixed translation axes have zero derivative and are added
    to the running velocity before its rotation axes are differentiated.
    """
    s = m.skel
    dtype = d.qpos.dtype
    cvel = [jnp.zeros(6, dtype) for _ in range(s.nbody)]
    cdof_dot = [jnp.zeros(6, dtype)] * s.nv
    for b in range(1, s.nbody):
        p = int(s.body_parentid[b])
        v = cvel[p]
        jadr, jnum = int(s.body_jntadr[b]), int(s.body_jntnum[b])
        for j in range(jadr, jadr + jnum):
            jtype = JointType(int(s.jnt_type[j]))
            da = int(s.jnt_dofadr[j])
            if jtype == JointType.FREE:
                v = v + d.cdof[da : da + 3].T @ d.qvel[da : da + 3]
                for k in range(3):
                    cdof_dot[da + 3 + k] = am.motion_cross(v, d.cdof[da + 3 + k])
                v = v + d.cdof[da + 3 : da + 6].T @ d.qvel[da + 3 : da + 6]
            else:
                width = jtype.dof_width
                for k in range(width):
                    cdof_dot[da + k] = am.motion_cross(v, d.cdof[da + k])
                v = v + d.cdof[da : da + width].T @ d.qvel[da : da + width]
        cvel[b] = v
    cdof_dot_a = jnp.stack(cdof_dot) if s.nv else jnp.zeros((0, 6), dtype)
    return d.replace(cvel=jnp.stack(cvel), cdof_dot=cdof_dot_a)


def crb(m: Model, d: Data) -> Data:
    """Composite-rigid-body mass matrix, dense, via two einsums + static mask."""
    s = m.skel
    # composite inertias: accumulate children into parents (reverse order)
    crb_acc = [d.cinert[b] for b in range(s.nbody)]
    for b in range(s.nbody - 1, 0, -1):
        p = int(s.body_parentid[b])
        if p > 0:
            crb_acc[p] = crb_acc[p] + crb_acc[b]
    crb_mat = jnp.stack(crb_acc)  # (nbody, 6, 6)

    if s.nv == 0:
        return d.replace(qM=jnp.zeros((0, 0), d.qpos.dtype))

    f = jnp.einsum("vij,vj->vi", crb_mat[s.dof_bodyid], d.cdof)  # (nv, 6)
    m_full = f @ d.cdof.T  # (nv, nv)
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
    """Recursive Newton-Euler: bias forces C(q,v)v + g(q) into qfrc_bias."""
    s = m.skel
    dtype = d.qpos.dtype
    gravity = jnp.where(m.opt.disableflags & DisableBit.GRAVITY, 0.0, 1.0) * m.opt.gravity

    acc0 = jnp.concatenate([jnp.zeros(3, dtype), -gravity.astype(dtype)])
    acc = [jnp.zeros(6, dtype) for _ in range(s.nbody)]
    frc = [jnp.zeros(6, dtype) for _ in range(s.nbody)]
    acc[0] = acc0
    for b in range(1, s.nbody):
        p = int(s.body_parentid[b])
        da, dn = int(s.body_dofadr[b]), int(s.body_dofnum[b])
        a = acc[p]
        if dn:
            a = a + d.cdof_dot[da : da + dn].T @ d.qvel[da : da + dn]
        acc[b] = a
        iv = d.cinert[b] @ d.cvel[b]
        frc[b] = d.cinert[b] @ a + am.force_cross(d.cvel[b], iv)
    for b in range(s.nbody - 1, 0, -1):
        p = int(s.body_parentid[b])
        if p > 0:
            frc[p] = frc[p] + frc[b]
    ftot = jnp.stack(frc)  # (nbody, 6)
    qfrc_bias = jnp.einsum("vi,vi->v", d.cdof, ftot[s.dof_bodyid]) if s.nv else jnp.zeros(0, dtype)
    return d.replace(qfrc_bias=qfrc_bias)


def passive(m: Model, d: Data) -> Data:
    """Spring/damper passive forces (mirrors mj_passive for joints)."""
    s = m.skel
    dtype = d.qpos.dtype
    if s.nv == 0:
        return d
    spring = jnp.zeros(s.nv, dtype)
    for j in range(s.njnt):
        jtype = JointType(int(s.jnt_type[j]))
        qa, da = int(s.jnt_qposadr[j]), int(s.jnt_dofadr[j])
        k = m.jnt_stiffness[j]
        if jtype in (JointType.HINGE, JointType.SLIDE):
            spring = spring.at[da].add(-k * (d.qpos[qa] - m.qpos_spring[qa]))
        elif jtype == JointType.BALL:
            dif = am.quat_sub(d.qpos[qa : qa + 4], m.qpos_spring[qa : qa + 4])
            spring = spring.at[da : da + 3].add(-k * dif)
        else:  # FREE
            spring = spring.at[da : da + 3].add(-k * (d.qpos[qa : qa + 3] - m.qpos_spring[qa : qa + 3]))
            dif = am.quat_sub(d.qpos[qa + 3 : qa + 7], m.qpos_spring[qa + 3 : qa + 7])
            spring = spring.at[da + 3 : da + 6].add(-k * dif)
    damper = -m.dof_damping * d.qvel
    qfrc_passive = spring + damper
    if m.opt.disableflags & DisableBit.PASSIVE:
        qfrc_passive = jnp.zeros_like(qfrc_passive)
        spring = jnp.zeros_like(spring)
        damper = jnp.zeros_like(damper)
    return d.replace(qfrc_spring=spring, qfrc_damper=damper, qfrc_passive=qfrc_passive)


def actuator_moment(m: Model, d: Data) -> jax.Array:
    """(nu, nv) transmission moment matrix (joint transmissions)."""
    s = m.skel
    moment = jnp.zeros((s.nu, s.nv), d.qpos.dtype)
    for u in range(s.nu):
        j = int(s.actuator_trnid[u])
        da = int(s.jnt_dofadr[j])
        jtype = JointType(int(s.jnt_type[j]))
        if jtype in (JointType.HINGE, JointType.SLIDE):
            moment = moment.at[u, da].set(m.actuator_gear[u, 0])
        else:
            width = jtype.dof_width
            gear = m.actuator_gear[u, :width] if jtype == JointType.FREE else m.actuator_gear[u, :3]
            moment = moment.at[u, da : da + gear.shape[0]].set(gear)
    return moment


def fwd_actuation(m: Model, d: Data) -> Data:
    """ctrl -> generalized actuator force (fixed gain + affine bias)."""
    s = m.skel
    dtype = d.qpos.dtype
    if s.nu == 0:
        return d.replace(qfrc_actuator=jnp.zeros(s.nv, dtype))

    ctrl = d.ctrl
    if not (m.opt.disableflags & DisableBit.CLAMPCTRL):
        limited = jnp.asarray(s.actuator_ctrllimited)
        lo, hi = m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1]
        ctrl = jnp.where(limited, jnp.clip(ctrl, lo, hi), ctrl)

    # length/velocity through the transmission
    lengths = []
    for u in range(s.nu):
        j = int(s.actuator_trnid[u])
        jtype = JointType(int(s.jnt_type[j]))
        qa = int(s.jnt_qposadr[j])
        if jtype in (JointType.HINGE, JointType.SLIDE):
            lengths.append(d.qpos[qa] * m.actuator_gear[u, 0])
        else:
            lengths.append(jnp.zeros((), dtype))
    length = jnp.stack(lengths)
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
    # act dynamics (dyntype none/integrator/filter); na==0 for all current models
    act_input = ctrl
    force = gain * act_input + bias

    limited_f = jnp.asarray(s.actuator_forcelimited)
    force = jnp.where(
        limited_f, jnp.clip(force, m.actuator_forcerange[:, 0], m.actuator_forcerange[:, 1]), force
    )
    qfrc = moment.T @ force
    if m.opt.disableflags & DisableBit.ACTUATION:
        force = jnp.zeros_like(force)
        qfrc = jnp.zeros_like(qfrc)
    return d.replace(
        actuator_length=length,
        actuator_velocity=velocity,
        actuator_force=force,
        qfrc_actuator=qfrc,
        ctrl=d.ctrl,
    )


def xfrc_accumulate(m: Model, d: Data) -> jax.Array:
    """Map xfrc_applied (torque/force at body com, world frame) to qfrc."""
    s = m.skel
    if s.nv == 0 or s.nbody <= 1:
        return jnp.zeros(s.nv, d.qpos.dtype)
    origin = d.subtree_com[s.body_rootid]  # (nbody, 3)
    torque = d.xfrc_applied[:, :3]
    force = d.xfrc_applied[:, 3:]
    # spatial force at com-frame origin: (t + (p - o) x f, f)
    ang = torque + jnp.cross(d.xipos - origin, force)
    fspatial = jnp.concatenate([ang, force], axis=-1)  # (nbody, 6)
    # qfrc_j = sum over bodies b for which dof j is an ancestor: cdof_j . f_b
    # body-dof ancestor matrix: dof j supports body b iff dof_bodyid chain
    supports = _body_dof_support(s)  # (nbody, nv) static
    return jnp.einsum("bv,vi,bi->v", jnp.asarray(supports, d.qpos.dtype), d.cdof, fspatial)


_SUPPORT_CACHE: dict = {}


def _body_dof_support(s):
    key = (id(s), "support")
    if key not in _SUPPORT_CACHE:
        import numpy as np

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


def fwd_position_smooth(m: Model, d: Data) -> Data:
    d = kinematics(m, d)
    d = com_pos(m, d)
    d = crb(m, d)
    d = factor_m(m, d)
    return d


def fwd_velocity(m: Model, d: Data) -> Data:
    d = com_vel(m, d)
    d = passive(m, d)
    d = rne(m, d)
    return d


def fwd_acceleration(m: Model, d: Data) -> Data:
    qfrc_smooth = d.qfrc_passive + d.qfrc_actuator + d.qfrc_applied + xfrc_accumulate(m, d) - d.qfrc_bias
    qacc_smooth = solve_m(m, d, qfrc_smooth)
    return d.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)
