"""Sensor evaluation (mirrors mj_sensorPos/Vel/Acc + mj_rnePostConstraint).

The reference exposes MuJoCo sensors through mjx.Data.sensordata (reference
call path: ambersim/rl/base.py:93 mjx.step -> sensor stages). Here all three
stages run together at the end of forward(): sensordata never feeds back
into the dynamics, so evaluating pos/vel/acc sensors once per step — after
qacc/efc_force are known — is semantically identical to MuJoCo's interleaved
schedule. Per-sensor work is unrolled at trace time (sensor tables are
static skeleton data; sensor counts are small), with shared intermediates
(cacc, subtree momentum, contact normal forces) computed once and only when
a present sensor type needs them.

Parity: tests/test_sensors.py checks every supported type row-by-row against
the MuJoCo C oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ambersim_tpu.core import math as am
from ambersim_tpu.core.types import (
    ConeType,
    Data,
    DisableBit,
    JointType,
    Model,
    ObjType,
    SensorType,
    SiteType,
)
from ambersim_tpu.engine.schedule import tree_schedule

# sensors evaluated by this module
_POS = {
    SensorType.MAGNETOMETER,
    SensorType.RANGEFINDER,
    SensorType.JOINTPOS,
    SensorType.TENDONPOS,
    SensorType.ACTUATORPOS,
    SensorType.BALLQUAT,
    SensorType.JOINTLIMITPOS,
    SensorType.TENDONLIMITPOS,
    SensorType.FRAMEPOS,
    SensorType.FRAMEQUAT,
    SensorType.FRAMEXAXIS,
    SensorType.FRAMEYAXIS,
    SensorType.FRAMEZAXIS,
    SensorType.SUBTREECOM,
    SensorType.E_POTENTIAL,
    SensorType.CLOCK,
    SensorType.CAMPROJECTION,
    SensorType.INSIDESITE,
    SensorType.GEOMDIST,
    SensorType.GEOMNORMAL,
    SensorType.GEOMFROMTO,
}

# geom-distance trio: cutoff is the search range (handled inside evaluation),
# not an output clamp (oracle-pinned: a unit normal is NOT clipped to a 0.5
# cutoff)
_GEOMPAIR = {SensorType.GEOMDIST, SensorType.GEOMNORMAL, SensorType.GEOMFROMTO}
_VEL = {
    SensorType.VELOCIMETER,
    SensorType.GYRO,
    SensorType.JOINTVEL,
    SensorType.TENDONVEL,
    SensorType.ACTUATORVEL,
    SensorType.BALLANGVEL,
    SensorType.JOINTLIMITVEL,
    SensorType.TENDONLIMITVEL,
    SensorType.FRAMELINVEL,
    SensorType.FRAMEANGVEL,
    SensorType.SUBTREELINVEL,
    SensorType.SUBTREEANGMOM,
    SensorType.E_KINETIC,
}
_ACC = {
    SensorType.TOUCH,
    SensorType.ACCELEROMETER,
    SensorType.FORCE,
    SensorType.TORQUE,
    SensorType.ACTUATORFRC,
    SensorType.JOINTACTFRC,
    SensorType.TENDONACTFRC,
    SensorType.JOINTLIMITFRC,
    SensorType.TENDONLIMITFRC,
    SensorType.FRAMELINACC,
    SensorType.FRAMEANGACC,
}


def _object_pos_mat(m: Model, d: Data, objtype: int, objid: int):
    """World frame (pos, mat) of a sensor attachment object (static dispatch)."""
    t = ObjType(objtype)
    if t in (ObjType.BODY, ObjType.XBODY):
        # BODY = inertial frame, XBODY = body frame (MuJoCo distinction)
        if t == ObjType.BODY:
            return d.xipos[objid], d.ximat[objid]
        return d.xpos[objid], am.quat_to_mat(d.xquat[objid])
    if t == ObjType.GEOM:
        return d.geom_xpos[objid], d.geom_xmat[objid]
    if t == ObjType.SITE:
        return d.site_xpos[objid], d.site_xmat[objid]
    raise NotImplementedError(f"sensor objtype {t}")


def _object_bodyid(m: Model, objtype: int, objid: int) -> int:
    t = ObjType(objtype)
    s = m.skel
    if t in (ObjType.BODY, ObjType.XBODY):
        return int(objid)
    if t == ObjType.GEOM:
        return int(s.geom_bodyid[objid])
    if t == ObjType.SITE:
        return int(s.site_bodyid[objid])
    raise NotImplementedError(f"sensor objtype {t}")


def _point_vel(m: Model, d: Data, bodyid: int, pos):
    """World (angvel, linvel) of a body-fixed world point (cf. mj_objectVelocity)."""
    origin = d.subtree_com[m.skel.body_rootid[bodyid]]
    ang = d.cvel[bodyid, :3]
    lin = d.cvel[bodyid, 3:] + jnp.cross(ang, pos - origin)
    return ang, lin


def _point_acc(m: Model, d: Data, bodyid: int, pos):
    """World (angacc, linacc) of a body-fixed point from post-constraint cacc,
    including the rotating-frame correction (cf. mj_objectAcceleration)."""
    origin = d.subtree_com[m.skel.body_rootid[bodyid]]
    r = pos - origin
    ang_v = d.cvel[bodyid, :3]
    lin_v = d.cvel[bodyid, 3:] + jnp.cross(ang_v, r)
    ang_a = d.cacc[bodyid, :3]
    lin_a = d.cacc[bodyid, 3:] + jnp.cross(ang_a, r) + jnp.cross(ang_v, lin_v)
    return ang_a, lin_a


def rne_postconstraint(m: Model, d: Data) -> Data:
    """Post-constraint spatial accelerations cacc (forward pass of
    mj_rnePostConstraint; gravity offset at the root, full qacc included)."""
    s = m.skel
    sched = tree_schedule(s)
    dtype = d.qpos.dtype
    gravity = jnp.where(m.opt.disableflags & DisableBit.GRAVITY, 0.0, 1.0) * m.opt.gravity
    cacc = jnp.zeros((s.nbody, 6), dtype)
    cacc = cacc.at[0].set(jnp.concatenate([jnp.zeros(3, dtype), -jnp.asarray(gravity, dtype)]))
    for level in sched.levels:
        for sig, ids, parents, jnt_slots in level:
            a = cacc[parents]
            for slot, jtype_int in enumerate(sig):
                jids = jnt_slots[slot]
                w = JointType(jtype_int).dof_width
                idx = s.jnt_dofadr[jids][:, None] + np.arange(w)[None, :]
                a = a + jnp.einsum("gwi,gw->gi", d.cdof_dot[idx], d.qvel[idx])
                a = a + jnp.einsum("gwi,gw->gi", d.cdof[idx], d.qacc[idx])
            cacc = cacc.at[ids].set(a)
    return d.replace(cacc=cacc)


def _contact_forces_world(m: Model, d: Data):
    """Per-contact-slot (normal_force, world_force) from efc_force.

    Pyramidal rows are n +/- mu_i t_i facets: normal = sum(f), tangent_i =
    mu_i (f_2i - f_2i+1). Elliptic rows are the cone axes directly."""
    s = m.skel
    elliptic = m.opt.cone == int(ConeType.ELLIPTIC)
    normals = []
    forces = []
    for slot in range(s.ncon):
        adr = int(s.con_efcadr[slot])
        cdim = int(s.con_dim[slot])
        frame = d.contact.frame[slot]  # rows: n, t1, t2
        mu = d.contact.friction[slot]
        active = d.efc_active[adr]
        if cdim == 1:
            fn = d.efc_force[adr]
            fw = fn * frame[0]
        elif elliptic:
            f = d.efc_force[adr : adr + cdim]
            fn = f[0]
            fw = frame[0] * fn
            for i in range(1, min(cdim, 3)):
                fw = fw + frame[i] * f[i]
        else:
            nfacet = 2 * (cdim - 1)
            f = d.efc_force[adr : adr + nfacet]
            fn = jnp.sum(f)
            fw = frame[0] * fn
            for i in range(min(cdim - 1, 2)):
                ft = mu[i] * (f[2 * i] - f[2 * i + 1])
                fw = fw + frame[1 + i] * ft
        fn = jnp.where(active, fn, 0.0)
        fw = jnp.where(active, fw, jnp.zeros(3, fw.dtype))
        normals.append(fn)
        forces.append(fw)
    return jnp.stack(normals), jnp.stack(forces)


def _contact_wrench(m: Model, d: Data) -> jax.Array:
    """(ncon, 6) contact-frame wrench (fn, ft1, ft2, tn, tt1, tt2) acting on
    each slot's geom2 (mj_contactForce semantics), from efc_force."""
    s = m.skel
    elliptic = m.opt.cone == int(ConeType.ELLIPTIC)
    dtype = d.qpos.dtype
    rows = []
    for slot in range(s.ncon):
        adr = int(s.con_efcadr[slot])
        cdim = int(s.con_dim[slot])
        mu = d.contact.friction[slot]  # (5,) t1 t2 torsional roll1 roll2
        w = jnp.zeros(6, dtype)
        if cdim == 1:
            w = w.at[0].set(d.efc_force[adr])
        elif elliptic:
            f = d.efc_force[adr : adr + cdim]
            w = w.at[:cdim].set(f)
        else:
            nfacet = 2 * (cdim - 1)
            f = d.efc_force[adr : adr + nfacet]
            w = w.at[0].set(jnp.sum(f))
            for i in range(cdim - 1):
                w = w.at[1 + i].set(mu[i] * (f[2 * i] - f[2 * i + 1]))
        active = d.efc_active[adr]
        rows.append(jnp.where(active, w, jnp.zeros(6, dtype)))
    return jnp.stack(rows)


def _contact_sensor(m: Model, d: Data, objtype, objid, reftype, refid, intprm, wrench):
    """mjSENS_CONTACT: match contact slots by side criteria, reduce, and
    write `num` slots of the selected data fields.

    Conventions pinned against the oracle (tests/test_contact_sensor.py):
    in-order match reports the stored contact-frame wrench (acting on the
    second matched side), normal = frame n, tangent = frame t1; a swapped
    match negates the third (t2) components of force/torque and negates
    normal/tangent. netforce sums world wrenches on the second side about
    the |F|-weighted centroid of matched contact positions."""
    s = m.skel
    dtype = d.qpos.dtype
    dataspec, reduce_, num = int(intprm[0]), int(intprm[1]), int(intprm[2])
    widths = [("found", 1, 1), ("force", 2, 3), ("torque", 4, 3), ("dist", 8, 1), ("pos", 16, 3), ("normal", 32, 3), ("tangent", 64, 3)]
    sel_fields = [(n, w) for n, b, w in widths if dataspec & b]
    width = sum(w for _, w in sel_fields)
    if s.ncon == 0:
        return jnp.zeros(num * width, dtype)

    ngeom = s.ngeom

    def side_mask(t, i):
        t = ObjType(t)
        if t in (ObjType.UNKNOWN, ObjType.SITE):
            return np.ones(ngeom, bool)  # wildcard (site is a position filter)
        if t == ObjType.GEOM:
            mask = np.zeros(ngeom, bool)
            mask[i] = True
            return mask
        if t == ObjType.BODY:
            return np.asarray(s.geom_bodyid) == i
        if t == ObjType.XBODY:  # subtree rooted at body i (parents precede children)
            sub = np.zeros(s.nbody, bool)
            sub[i] = True
            parent = np.asarray(s.body_parentid)
            for b in range(i + 1, s.nbody):
                sub[b] |= sub[parent[b]]
            return sub[np.asarray(s.geom_bodyid)]
        raise NotImplementedError(f"contact sensor criterion objtype {t}")

    m1 = jnp.asarray(side_mask(objtype, objid))
    m2 = jnp.asarray(side_mask(reftype, refid))
    g1, g2 = d.contact.geom1, d.contact.geom2
    inorder = m1[g1] & m2[g2]
    swapped = m1[g2] & m2[g1] & ~inorder
    active = d.efc_active[jnp.asarray(s.con_efcadr)]
    matched = (inorder | swapped) & active
    if ObjType(objtype) == ObjType.SITE:
        inside = jax.vmap(lambda p: _inside_site(m, d, objid, p))(d.contact.pos)
        matched = matched & inside

    sigma = jnp.where(swapped, -1.0, 1.0).astype(dtype)
    frame = d.contact.frame  # (ncon, 3, 3) rows n, t1, t2
    force_f = wrench[:, :3] * jnp.stack([jnp.ones_like(sigma), jnp.ones_like(sigma), sigma], -1)
    torque_f = wrench[:, 3:] * jnp.stack([jnp.ones_like(sigma), jnp.ones_like(sigma), sigma], -1)
    per_slot = {
        "force": force_f,
        "torque": torque_f,
        "dist": d.contact.dist[:, None],
        "pos": d.contact.pos,
        "normal": sigma[:, None] * frame[:, 0],
        "tangent": sigma[:, None] * frame[:, 1],
    }
    maskf = matched.astype(dtype)
    found = jnp.sum(maskf)

    feat_names = [n for n, _ in sel_fields if n != "found"]
    has_found = any(n == "found" for n, _ in sel_fields)

    def assemble(rows_by_name, found_col):
        """Interleave found + field rows per the dataspec order. rows: (num, w)."""
        parts = []
        for n, w in sel_fields:
            parts.append(found_col[:, None] if n == "found" else rows_by_name[n])
        return jnp.concatenate(parts, axis=1).reshape(-1)

    if reduce_ == 0:  # none: first `num` matched slots in slot order
        rank = jnp.cumsum(maskf)
        selmat = maskf[None, :] * (rank[None, :] == jnp.arange(1, num + 1, dtype=rank.dtype)[:, None])
        rows = {n: selmat @ per_slot[n] for n in feat_names}
        found_col = found * (found > jnp.arange(num, dtype=dtype)) if has_found else None
        return assemble(rows, found_col)

    if reduce_ in (1, 2):  # mindist / maxforce: single winner in slot 0
        big = jnp.asarray(1e30, dtype)
        if reduce_ == 1:
            score = jnp.where(matched, d.contact.dist, big)
            win = jnp.argmin(score)
        else:
            score = jnp.where(matched, wrench[:, 0], -big)
            win = jnp.argmax(score)
        sel = (jnp.arange(s.ncon) == win).astype(dtype) * (found > 0)
        selmat = jnp.zeros((num, s.ncon), dtype).at[0].set(sel)
        rows = {n: selmat @ per_slot[n] for n in feat_names}
        found_col = (found * (jnp.arange(num) == 0)) if has_found else None
        return assemble(rows, found_col)

    # netforce: world wrench on the second matched side, about the
    # |F|-weighted centroid of matched contact positions
    Fw = sigma[:, None] * jnp.einsum("ci,cij->cj", wrench[:, :3], frame)
    Tw = sigma[:, None] * jnp.einsum("ci,cij->cj", wrench[:, 3:], frame)
    Fw = maskf[:, None] * Fw
    Tw = maskf[:, None] * Tw
    wts = jnp.linalg.norm(Fw, axis=1)
    ref = jnp.sum(wts[:, None] * d.contact.pos, 0) / jnp.maximum(jnp.sum(wts), 1e-15)
    Fsum = jnp.sum(Fw, 0)
    Tsum = jnp.sum(jnp.cross(d.contact.pos - ref, Fw) + Tw, 0)
    nonzero = (found > 0).astype(dtype)
    rows0 = {
        "force": Fsum,
        "torque": Tsum,
        "dist": jnp.zeros(1, dtype),
        "pos": ref * nonzero,
        "normal": jnp.array([1.0, 0, 0], dtype) * nonzero,
        "tangent": jnp.array([0.0, 1, 0], dtype) * nonzero,
    }
    rows = {n: jnp.zeros((num, rows0[n].shape[-1]), dtype).at[0].set(rows0[n]) for n in feat_names}
    found_col = (found * (jnp.arange(num) == 0)) if has_found else None
    return assemble(rows, found_col)


def _cfrc_int(m: Model, d: Data, con_normal, con_force) -> jax.Array:
    """Interaction force (ang, lin) each body receives through its parent
    joint (backward pass of mj_rnePostConstraint). External loads included:
    gravity (via cacc root offset), contacts, xfrc_applied. Equality-
    constraint reaction forces are not yet included."""
    s = m.skel
    sched = tree_schedule(s)
    dtype = d.qpos.dtype
    origin_all = d.subtree_com[s.body_rootid]

    iv = jnp.einsum("bij,bj->bi", d.cinert, d.cvel)
    frc = jnp.einsum("bij,bj->bi", d.cinert, d.cacc) + am.force_cross(d.cvel, iv)

    # applied external forces (world (force, torque) at body com)
    xang = d.xfrc_applied[:, 3:] + jnp.cross(d.xipos - origin_all, d.xfrc_applied[:, :3])
    frc = frc - jnp.concatenate([xang, d.xfrc_applied[:, :3]], axis=-1)

    # contact forces: force on geom2's body is +fw at contact pos, on geom1's
    # body is -fw (normal points from geom1 into geom2 in this engine's
    # convention; engine/collision.py)
    b1 = jnp.asarray(s.geom_bodyid)[d.contact.geom1]
    b2 = jnp.asarray(s.geom_bodyid)[d.contact.geom2]
    pos = d.contact.pos
    for sgn, bid in ((1.0, b2), (-1.0, b1)):
        f_lin = sgn * con_force
        ang = jnp.cross(pos - origin_all[bid], f_lin)
        sp = jnp.concatenate([ang, f_lin], axis=-1)
        frc = frc.at[bid].add(-sp)

    frc = frc.at[0].set(0.0)
    for child_ids, parent_ids in sched.reverse_levels:
        keep = parent_ids >= 0
        if keep.any():
            frc = frc.at[parent_ids[keep]].add(frc[child_ids[keep]])
    return frc


def _inside_site(m: Model, d: Data, siteid: int, point):
    """Boolean: world point inside the site volume (touch-sensor zone)."""
    s = m.skel
    stype = SiteType(int(s.site_type[siteid]))
    size = m.site_size[siteid]
    local = d.site_xmat[siteid].T @ (point - d.site_xpos[siteid])
    x, y, z = local[0], local[1], local[2]
    if stype == SiteType.SPHERE:
        return jnp.sum(local**2) <= size[0] ** 2
    if stype == SiteType.CAPSULE:
        zc = jnp.clip(z, -size[1], size[1])
        return x**2 + y**2 + (z - zc) ** 2 <= size[0] ** 2
    if stype == SiteType.CYLINDER:
        return (x**2 + y**2 <= size[0] ** 2) & (jnp.abs(z) <= size[1])
    if stype == SiteType.ELLIPSOID:
        return jnp.sum((local / jnp.maximum(size, 1e-12)) ** 2) <= 1.0
    # BOX
    return jnp.all(jnp.abs(local) <= size)


def _limit_row(s, jntid: int):
    """efc row index of a joint's limit row, or -1 (static layout)."""
    where = np.nonzero(s.limit_jntid == jntid)[0]
    if len(where) == 0:
        return -1
    return int(s.ne + s.nf + where[0])


def _tendon_limit_row(s, tenid: int):
    """efc row index of a tendon's limit row, or -1 (after joint limit rows)."""
    where = np.nonzero(s.limit_tenid == tenid)[0]
    if len(where) == 0:
        return -1
    return int(s.ne + s.nf + len(s.limit_jntid) + where[0])


def sensors(m: Model, d: Data) -> Data:
    """Evaluate all sensors into d.sensordata (pos+vel+acc stages)."""
    s = m.skel
    if s.nsensor == 0 or (m.opt.disableflags & DisableBit.SENSOR):
        return d
    dtype = d.qpos.dtype
    types = [SensorType(int(t)) for t in s.sensor_type]
    present = set(types)

    # ---- shared lazy intermediates ----
    if present & {
        SensorType.ACCELEROMETER,
        SensorType.FORCE,
        SensorType.TORQUE,
        SensorType.FRAMELINACC,
        SensorType.FRAMEANGACC,
    }:
        d = rne_postconstraint(m, d)
    con_normal = con_force = None
    if present & {SensorType.TOUCH, SensorType.FORCE, SensorType.TORQUE}:
        con_normal, con_force = _contact_forces_world(m, d)
    con_wrench = None
    if SensorType.CONTACT in present and s.ncon > 0:
        con_wrench = _contact_wrench(m, d)
    cfrc_int = None
    if present & {SensorType.FORCE, SensorType.TORQUE}:
        cfrc_int = _cfrc_int(m, d, con_normal, con_force)

    subtree_linvel = subtree_angmom = None
    if present & {SensorType.SUBTREELINVEL, SensorType.SUBTREEANGMOM}:
        subtree_linvel, subtree_angmom = _subtree_momentum(m, d)

    out = d.sensordata
    for i, stype in enumerate(types):
        objtype = int(s.sensor_objtype[i])
        objid = int(s.sensor_objid[i])
        reftype = int(s.sensor_reftype[i])
        refid = int(s.sensor_refid[i])
        adr = int(s.sensor_adr[i])
        dim = int(s.sensor_dim[i])
        if stype == SensorType.USER:
            # no mjcb_sensor-style callback mechanism: user sensors read 0
            out = out.at[adr : adr + dim].set(0.0)
            continue
        if stype == SensorType.CONTACT:
            val = _contact_sensor(
                m, d, objtype, objid, reftype, refid, s.sensor_intprm[i], con_wrench
            )
            out = out.at[adr : adr + dim].set(jnp.asarray(val, dtype))
            continue
        val = _eval_sensor(
            m,
            d,
            stype,
            objtype,
            objid,
            reftype,
            refid,
            con_normal=con_normal,
            cfrc_int=cfrc_int,
            subtree_linvel=subtree_linvel,
            subtree_angmom=subtree_angmom,
            cutoff=m.sensor_cutoff[i],
        )
        val = jnp.ravel(jnp.asarray(val, dtype))
        cutoff = m.sensor_cutoff[i]
        positive = stype == SensorType.TOUCH
        if stype in _GEOMPAIR:  # cutoff already applied as the search range
            clipped = val
        else:
            clipped = jnp.where(
                cutoff > 0,
                jnp.clip(val, 0.0 if positive else -cutoff, cutoff),
                val,
            )
        out = out.at[adr : adr + dim].set(clipped)
    return d.replace(sensordata=out)


def _subtree_momentum(m: Model, d: Data):
    """Per-body subtree (linvel of com, angmom about subtree com) —
    mirrors mj_subtreeVel."""
    s = m.skel
    sched = tree_schedule(s)
    origin = d.subtree_com[s.body_rootid]
    ang = d.cvel[:, :3]
    lin = d.cvel[:, 3:] + jnp.cross(ang, d.xipos - origin)  # body com velocity

    mass = m.body_mass
    mom = mass[:, None] * lin
    mass_acc = mass * jnp.ones((), d.qpos.dtype)
    mom_acc = mom
    # subtree com velocity
    for child_ids, parent_ids in sched.reverse_levels:
        mass_acc = mass_acc.at[parent_ids].add(mass_acc[child_ids])
        mom_acc = mom_acc.at[parent_ids].add(mom_acc[child_ids])
    sub_linvel = mom_acc / jnp.maximum(mass_acc, 1e-12)[:, None]

    # world-frame rotational inertia per body
    inertia_world = d.ximat @ (m.body_inertia[:, :, None] * jnp.swapaxes(d.ximat, -1, -2))
    own_ang = jnp.einsum("bij,bj->bi", inertia_world, ang)

    # angular momentum about each subtree's own com: accumulate children,
    # shifting reference points (parallel-axis) level by level
    angmom = own_ang + jnp.cross(d.xipos - d.subtree_com, mom)
    body_mom = mom  # linear momentum of each subtree, accumulated below
    for child_ids, parent_ids in sched.reverse_levels:
        shift = jnp.cross(
            d.subtree_com[child_ids] - d.subtree_com[parent_ids], body_mom[child_ids]
        )
        angmom = angmom.at[parent_ids].add(angmom[child_ids] + shift)
        body_mom = body_mom.at[parent_ids].add(body_mom[child_ids])
    return sub_linvel, angmom


def _geompair_sensor(m: Model, d: Data, stype: SensorType, objtype: int, objid: int, refid: int, cutoff):
    """<distance>/<normal>/<fromto>: min surface distance between two geoms
    (or over all geom pairs of two bodies, for body1/body2 attachment) with
    `cutoff` as the search range — beyond it the trio reads (cutoff, 0, 0).
    Oracle semantics pinned in tests/test_distance_sensors.py."""
    from ambersim_tpu.engine.collision import geom_pair_distance

    s = m.skel
    dtype = d.qpos.dtype
    if objtype == int(ObjType.GEOM):
        pairs = [(objid, refid)]
    else:  # BODY: all cross pairs of the two bodies' geoms
        ga = range(int(s.body_geomadr[objid]), int(s.body_geomadr[objid]) + int(s.body_geomnum[objid]))
        gb = range(int(s.body_geomadr[refid]), int(s.body_geomadr[refid]) + int(s.body_geomnum[refid]))
        pairs = [(a, b) for a in ga for b in gb]
    if not pairs:
        dim = {SensorType.GEOMDIST: 1, SensorType.GEOMNORMAL: 3, SensorType.GEOMFROMTO: 6}[stype]
        return jnp.zeros((dim,), dtype)
    best = None
    for g1, g2 in pairs:
        di, p1, p2 = geom_pair_distance(m, d, g1, g2)
        if best is None:
            best = (di, p1, p2)
        else:
            closer = di < best[0]
            best = (
                jnp.where(closer, di, best[0]),
                jnp.where(closer, p1, best[1]),
                jnp.where(closer, p2, best[2]),
            )
    di, p1, p2 = best
    cutoff = jnp.asarray(cutoff, dtype)
    within = di < cutoff
    if stype == SensorType.GEOMDIST:
        return jnp.minimum(di, cutoff)
    if stype == SensorType.GEOMNORMAL:
        n = p2 - p1
        n = n / jnp.maximum(jnp.linalg.norm(n), 1e-15)
        return jnp.where(within, n, jnp.zeros(3, dtype))
    return jnp.where(within, jnp.concatenate([p1, p2]), jnp.zeros(6, dtype))


def _eval_sensor(
    m: Model,
    d: Data,
    stype: SensorType,
    objtype: int,
    objid: int,
    reftype: int,
    refid: int,
    *,
    con_normal,
    cfrc_int,
    subtree_linvel,
    subtree_angmom,
    cutoff=None,
):
    s = m.skel
    has_ref = refid >= 0

    if stype in _GEOMPAIR:
        return _geompair_sensor(m, d, stype, objtype, objid, refid, cutoff)
    if stype == SensorType.CLOCK:
        return d.time
    if stype == SensorType.JOINTPOS:
        return d.qpos[s.jnt_qposadr[objid]]
    if stype == SensorType.JOINTVEL:
        return d.qvel[s.jnt_dofadr[objid]]
    if stype == SensorType.RANGEFINDER:
        from ambersim_tpu.engine.ray import ray

        dist, _ = ray(
            m,
            d,
            d.site_xpos[objid],
            d.site_xmat[objid][:, 2],
            bodyexclude=int(s.site_bodyid[objid]),
        )
        return dist
    if stype == SensorType.TENDONPOS:
        return d.ten_length[objid]
    if stype == SensorType.TENDONVEL:
        return d.ten_velocity[objid]
    if stype == SensorType.BALLQUAT:
        qa = s.jnt_qposadr[objid]
        return am.normalize_quat(d.qpos[qa : qa + 4])
    if stype == SensorType.BALLANGVEL:
        da = s.jnt_dofadr[objid]
        return d.qvel[da : da + 3]
    if stype == SensorType.ACTUATORPOS:
        return d.actuator_length[objid]
    if stype == SensorType.ACTUATORVEL:
        return d.actuator_velocity[objid]
    if stype == SensorType.ACTUATORFRC:
        return d.actuator_force[objid]
    if stype == SensorType.TENDONACTFRC:
        # scalar actuator force acting on the tendon: sum of actuator_force
        # over actuators with a tendon transmission targeting it (static mask)
        from ambersim_tpu.core.types import TrnType

        mask = (s.actuator_trntype == int(TrnType.TENDON)) & (s.actuator_trnid == objid)
        return jnp.sum(jnp.where(jnp.asarray(mask), d.actuator_force, 0.0))
    if stype == SensorType.CAMPROJECTION:
        # project site objid into camera refid's image plane (pixel coords).
        # Focal transform: sensorsize nonzero -> intrinsic focal length scaled
        # to pixels, else from fovy; principal point is stored but unused
        # (oracle-pinned: mujoco cam_project ignores cam_intrinsic[2:4]).
        dtype = d.qpos.dtype
        p_cam = d.cam_xmat[refid].T @ (d.site_xpos[objid] - d.cam_xpos[refid])
        res = jnp.asarray(m.cam_resolution[refid], dtype)
        ss = jnp.asarray(m.cam_sensorsize[refid], dtype)
        use_intrinsic = (ss[0] > 0) & (ss[1] > 0)
        f_fovy = 0.5 / jnp.tan(m.cam_fovy[refid] * jnp.pi / 360.0) * res[1]
        fx = jnp.where(use_intrinsic, m.cam_intrinsic[refid, 0] / jnp.where(ss[0] > 0, ss[0], 1.0) * res[0], f_fovy)
        fy = jnp.where(use_intrinsic, m.cam_intrinsic[refid, 1] / jnp.where(ss[1] > 0, ss[1], 1.0) * res[1], f_fovy)
        denom = p_cam[2]
        denom = jnp.where(jnp.abs(denom) < 1e-12, jnp.where(denom < 0, -1e-12, 1e-12), denom)
        u = -fx * p_cam[0] / denom + res[0] / 2.0
        v = fy * p_cam[1] / denom + res[1] / 2.0
        return jnp.stack([u, v])
    if stype == SensorType.INSIDESITE:
        point, _ = _object_pos_mat(m, d, objtype, objid)
        return _inside_site(m, d, refid, point).astype(d.qpos.dtype)
    if stype == SensorType.JOINTACTFRC:
        return d.qfrc_actuator[s.jnt_dofadr[objid]]
    if stype in (SensorType.JOINTLIMITPOS, SensorType.JOINTLIMITVEL, SensorType.JOINTLIMITFRC):
        row = _limit_row(s, objid)
        if row < 0:
            return jnp.zeros((), d.qpos.dtype)
        active = d.efc_active[row]
        if stype == SensorType.JOINTLIMITPOS:
            return jnp.where(active, d.efc_pos[row] - d.efc_margin[row], 0.0)
        if stype == SensorType.JOINTLIMITVEL:
            return jnp.where(active, d.efc_J[row] @ d.qvel, 0.0)
        return jnp.where(active, d.efc_force[row], 0.0)
    if stype in (
        SensorType.TENDONLIMITPOS,
        SensorType.TENDONLIMITVEL,
        SensorType.TENDONLIMITFRC,
    ):
        row = _tendon_limit_row(s, objid)
        if row < 0:
            return jnp.zeros((), d.qpos.dtype)
        active = d.efc_active[row]
        if stype == SensorType.TENDONLIMITPOS:
            return jnp.where(active, d.efc_pos[row] - d.efc_margin[row], 0.0)
        if stype == SensorType.TENDONLIMITVEL:
            return jnp.where(active, d.efc_J[row] @ d.qvel, 0.0)
        return jnp.where(active, d.efc_force[row], 0.0)
    if stype == SensorType.MAGNETOMETER:
        return d.site_xmat[objid].T @ jnp.asarray(m.opt.magnetic, d.qpos.dtype)
    if stype == SensorType.SUBTREECOM:
        return d.subtree_com[objid]
    if stype == SensorType.SUBTREELINVEL:
        return subtree_linvel[objid]
    if stype == SensorType.SUBTREEANGMOM:
        return subtree_angmom[objid]
    if stype == SensorType.E_POTENTIAL:
        from ambersim_tpu.engine import smooth as _smooth

        return _smooth.energy_pos(m, d)
    if stype == SensorType.E_KINETIC:
        from ambersim_tpu.engine import smooth as _smooth

        return _smooth.energy_vel(m, d)
    if stype == SensorType.TOUCH:
        siteid = objid
        sbody = int(s.site_bodyid[siteid])
        b1 = jnp.asarray(s.geom_bodyid)[d.contact.geom1]
        b2 = jnp.asarray(s.geom_bodyid)[d.contact.geom2]
        on_body = (b1 == sbody) | (b2 == sbody)
        inside = jax.vmap(lambda p: _inside_site(m, d, siteid, p))(d.contact.pos)
        return jnp.sum(jnp.where(on_body & inside, con_normal, 0.0))

    # site-frame inertial sensors
    if stype == SensorType.VELOCIMETER:
        bodyid = int(s.site_bodyid[objid])
        _, lin = _point_vel(m, d, bodyid, d.site_xpos[objid])
        return d.site_xmat[objid].T @ lin
    if stype == SensorType.GYRO:
        bodyid = int(s.site_bodyid[objid])
        ang, _ = _point_vel(m, d, bodyid, d.site_xpos[objid])
        return d.site_xmat[objid].T @ ang
    if stype == SensorType.ACCELEROMETER:
        bodyid = int(s.site_bodyid[objid])
        _, lin = _point_acc(m, d, bodyid, d.site_xpos[objid])
        return d.site_xmat[objid].T @ lin
    if stype == SensorType.FORCE:
        bodyid = int(s.site_bodyid[objid])
        return d.site_xmat[objid].T @ cfrc_int[bodyid, 3:]
    if stype == SensorType.TORQUE:
        bodyid = int(s.site_bodyid[objid])
        origin = d.subtree_com[s.body_rootid[bodyid]]
        ang = cfrc_int[bodyid, :3]
        lin = cfrc_int[bodyid, 3:]
        # torque about the site point
        t = ang - jnp.cross(d.site_xpos[objid] - origin, lin)
        return d.site_xmat[objid].T @ t

    # frame sensors
    pos, mat = _object_pos_mat(m, d, objtype, objid)
    if has_ref:
        rpos, rmat = _object_pos_mat(m, d, reftype, refid)
    if stype == SensorType.FRAMEPOS:
        return rmat.T @ (pos - rpos) if has_ref else pos
    if stype == SensorType.FRAMEQUAT:
        # compose quats directly where the object carries one (body/site/geom)
        t = ObjType(objtype)
        if t == ObjType.XBODY:
            q = d.xquat[objid]
        elif t == ObjType.BODY:
            q = am.mul_quat(d.xquat[objid], m.body_iquat[objid])
        elif t == ObjType.GEOM:
            q = am.mul_quat(d.xquat[s.geom_bodyid[objid]], m.geom_quat[objid])
        else:
            q = am.mul_quat(d.xquat[s.site_bodyid[objid]], m.site_quat[objid])
        if has_ref:
            rt = ObjType(reftype)
            if rt == ObjType.XBODY:
                rq = d.xquat[refid]
            elif rt == ObjType.BODY:
                rq = am.mul_quat(d.xquat[refid], m.body_iquat[refid])
            elif rt == ObjType.GEOM:
                rq = am.mul_quat(d.xquat[s.geom_bodyid[refid]], m.geom_quat[refid])
            else:
                rq = am.mul_quat(d.xquat[s.site_bodyid[refid]], m.site_quat[refid])
            q = am.mul_quat(am.neg_quat(rq), q)
        return am.normalize_quat(q)
    if stype in (SensorType.FRAMEXAXIS, SensorType.FRAMEYAXIS, SensorType.FRAMEZAXIS):
        col = {SensorType.FRAMEXAXIS: 0, SensorType.FRAMEYAXIS: 1, SensorType.FRAMEZAXIS: 2}[stype]
        axis = mat[:, col]
        return rmat.T @ axis if has_ref else axis
    bodyid = _object_bodyid(m, objtype, objid)
    if stype == SensorType.FRAMELINVEL:
        _, lin = _point_vel(m, d, bodyid, pos)
        if has_ref:
            rbody = _object_bodyid(m, reftype, refid)
            rang, rlin = _point_vel(m, d, rbody, rpos)
            return rmat.T @ (lin - rlin - jnp.cross(rang, pos - rpos))
        return lin
    if stype == SensorType.FRAMEANGVEL:
        ang, _ = _point_vel(m, d, bodyid, pos)
        if has_ref:
            rbody = _object_bodyid(m, reftype, refid)
            rang, _ = _point_vel(m, d, rbody, rpos)
            return rmat.T @ (ang - rang)
        return ang
    if stype == SensorType.FRAMELINACC:
        _, lin = _point_acc(m, d, bodyid, pos)
        return lin
    if stype == SensorType.FRAMEANGACC:
        ang, _ = _point_acc(m, d, bodyid, pos)
        return ang
    raise NotImplementedError(f"sensor type {stype}")
