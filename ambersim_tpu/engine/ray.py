"""Ray casting against geoms (mju_rayGeom / mj_ray semantics).

Used by rangefinder sensors (engine/sensor.py) and available as a standalone
query API. All casts are branch-free and vectorize under vmap: each geom type
yields a closed-form smallest nonnegative ray parameter t (inf = miss); the
scene-level `ray()` takes the masked minimum over geoms.

Conventions (pinned against the C oracle, tests/test_ray.py):
  * a ray starting inside a convex geom hits its exit surface (positive root)
  * geoms on `bodyexclude` (the sensing site's body) are skipped
  * planes respect their finite size when positive (size 0 = infinite)
Reference exposure: rangefinder sensors ride mjx sensordata in the
reference's pipeline (ambersim/rl/base.py:93).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ambersim_tpu.core.types import Data, GeomType, Model

_INF = 1e10


def _pick_t(t0: jax.Array, t1: jax.Array, valid: jax.Array) -> jax.Array:
    """Smallest nonnegative root; inside-start returns the exit root."""
    t0_ok = valid & (t0 >= 0)
    t1_ok = valid & (t1 >= 0)
    t = jnp.where(t0_ok, t0, jnp.where(t1_ok, t1, _INF))
    return t


def ray_sphere(p, v, r):
    """Local-frame ray vs sphere of radius r at the origin."""
    a = jnp.sum(v * v, -1)
    b = 2.0 * jnp.sum(p * v, -1)
    c = jnp.sum(p * p, -1) - r * r
    disc = b * b - 4 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) / jnp.maximum(2 * a, 1e-20)
    t1 = (-b + sq) / jnp.maximum(2 * a, 1e-20)
    return _pick_t(t0, t1, disc >= 0)


def ray_plane(p, v, size):
    """Local-frame ray vs the z=0 plane, bounded by size[0]/size[1] if > 0."""
    vz = jnp.where(jnp.abs(v[..., 2]) < 1e-15, 1e-15, v[..., 2])
    t = -p[..., 2] / vz
    x = p[..., 0] + t * v[..., 0]
    y = p[..., 1] + t * v[..., 1]
    inb = ((size[..., 0] <= 0) | (jnp.abs(x) <= size[..., 0])) & (
        (size[..., 1] <= 0) | (jnp.abs(y) <= size[..., 1])
    )
    return jnp.where((t >= 0) & inb, t, _INF)


def ray_box(p, v, size):
    """Local-frame ray vs origin-centered box (slab method)."""
    vsafe = jnp.where(jnp.abs(v) < 1e-15, 1e-15, v)
    t_lo = (-size - p) / vsafe
    t_hi = (size - p) / vsafe
    tmin = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
    tmax = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1)
    return _pick_t(tmin, tmax, tmin <= tmax)


def _ray_infinite_cyl(p, v, r):
    """Roots of the infinite cylinder |xy| = r (t0, t1, valid)."""
    a = v[..., 0] ** 2 + v[..., 1] ** 2
    b = 2.0 * (p[..., 0] * v[..., 0] + p[..., 1] * v[..., 1])
    c = p[..., 0] ** 2 + p[..., 1] ** 2 - r * r
    disc = b * b - 4 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    denom = jnp.maximum(2 * a, 1e-20)
    return (-b - sq) / denom, (-b + sq) / denom, (disc >= 0) & (a > 1e-20)


def ray_capsule(p, v, r, hl):
    """Local-frame ray vs capsule (z-axis, half-length hl, radius r)."""
    t0, t1, valid = _ray_infinite_cyl(p, v, r)
    z0 = p[..., 2] + t0 * v[..., 2]
    z1 = p[..., 2] + t1 * v[..., 2]
    t_side = _pick_t(
        jnp.where(jnp.abs(z0) <= hl, t0, _INF),
        jnp.where(jnp.abs(z1) <= hl, t1, _INF),
        valid,
    )
    up = jnp.zeros_like(p).at[..., 2].set(hl)
    t_top = ray_sphere(p - up, v, r)
    t_bot = ray_sphere(p + up, v, r)
    # cap hits must be on the cap hemispheres (|z| > hl), else the side wins
    zt = p[..., 2] + t_top * v[..., 2]
    zb = p[..., 2] + t_bot * v[..., 2]
    t_top = jnp.where(zt >= hl, t_top, _INF)
    t_bot = jnp.where(zb <= -hl, t_bot, _INF)
    return jnp.minimum(jnp.minimum(t_side, t_top), t_bot)


def ray_cylinder(p, v, r, hl):
    """Local-frame ray vs solid cylinder (flat disk caps)."""
    t0, t1, valid = _ray_infinite_cyl(p, v, r)
    z0 = p[..., 2] + t0 * v[..., 2]
    z1 = p[..., 2] + t1 * v[..., 2]
    t_side = _pick_t(
        jnp.where(jnp.abs(z0) <= hl, t0, _INF),
        jnp.where(jnp.abs(z1) <= hl, t1, _INF),
        valid,
    )
    vz = jnp.where(jnp.abs(v[..., 2]) < 1e-15, 1e-15, v[..., 2])
    ts = []
    for zcap in (hl, -hl):
        t = (zcap - p[..., 2]) / vz
        x = p[..., 0] + t * v[..., 0]
        y = p[..., 1] + t * v[..., 1]
        ts.append(jnp.where((t >= 0) & (x * x + y * y <= r * r), t, _INF))
    return jnp.minimum(t_side, jnp.minimum(ts[0], ts[1]))


def ray_ellipsoid(p, v, size):
    """Local-frame ray vs axis-aligned ellipsoid (scale to the unit sphere;
    the ray parameter is invariant under the shared reparametrization)."""
    return ray_sphere(p / size, v / size, 1.0)


def ray_hull(p, v, face_n, face_d, face_mask):
    """Local-frame ray vs convex polytope {x : n_i . x <= d_i}.

    face_n (F, 3), face_d (F,), face_mask (F,) validity of padded faces."""
    nv = jnp.einsum("fi,...i->...f", face_n, v)
    np_ = jnp.einsum("fi,...i->...f", face_n, p)
    lim = (face_d - np_) / jnp.where(jnp.abs(nv) < 1e-15, 1e-15, nv)
    is_upper = nv > 0
    uppers = jnp.where(is_upper & face_mask, lim, _INF)
    lowers = jnp.where((~is_upper) & face_mask, lim, -_INF)
    tmax = jnp.min(uppers, axis=-1)
    tmin = jnp.max(lowers, axis=-1)
    return _pick_t(tmin, tmax, tmin <= tmax)


def ray_hfield(m: Model, s, hid: int, p, v):
    """Local-frame ray vs every surface triangle of a height field
    (Moller-Trumbore over the full grid; grids are small and static)."""
    nrow, ncol = int(s.hfield_nrow[hid]), int(s.hfield_ncol[hid])
    size = m.hfield_size[hid]
    dx = 2.0 * size[0] / (ncol - 1)
    dy = 2.0 * size[1] / (nrow - 1)
    xs = -size[0] + jnp.arange(ncol) * dx
    ys = -size[1] + jnp.arange(nrow) * dy
    z = m.hfield_data[hid, :nrow, :ncol] * size[2]
    V = jnp.stack(
        [
            jnp.broadcast_to(xs[None, :], (nrow, ncol)),
            jnp.broadcast_to(ys[:, None], (nrow, ncol)),
            z,
        ],
        axis=-1,
    )
    v00 = V[:-1, :-1].reshape(-1, 3)
    v01 = V[:-1, 1:].reshape(-1, 3)
    v10 = V[1:, :-1].reshape(-1, 3)
    v11 = V[1:, 1:].reshape(-1, 3)
    tri_a = jnp.concatenate([v00, v00], 0)
    tri_b = jnp.concatenate([v01, v11], 0)
    tri_c = jnp.concatenate([v11, v10], 0)
    e1 = tri_b - tri_a
    e2 = tri_c - tri_a
    h = jnp.cross(v[None], e2)
    det = jnp.einsum("tj,tj->t", e1, h)
    det = jnp.where(jnp.abs(det) < 1e-15, 1e-15, det)
    sv = p[None] - tri_a
    u = jnp.einsum("tj,tj->t", sv, h) / det
    q = jnp.cross(sv, e1)
    w = jnp.einsum("j,tj->t", v, q) / det
    t = jnp.einsum("tj,tj->t", e2, q) / det
    hit = (u >= 0) & (w >= 0) & (u + w <= 1) & (t >= 0)
    return jnp.min(jnp.where(hit, t, _INF))


def ray_geom_local(gtype: int, p, v, size, mesh=None):
    """Dispatch by static geom type; p/v in the geom frame."""
    if gtype == int(GeomType.SPHERE):
        return ray_sphere(p, v, size[..., 0])
    if gtype == int(GeomType.PLANE):
        return ray_plane(p, v, size)
    if gtype == int(GeomType.BOX):
        return ray_box(p, v, size)
    if gtype == int(GeomType.CAPSULE):
        return ray_capsule(p, v, size[..., 0], size[..., 1])
    if gtype == int(GeomType.CYLINDER):
        return ray_cylinder(p, v, size[..., 0], size[..., 1])
    if gtype == int(GeomType.ELLIPSOID):
        return ray_ellipsoid(p, v, size)
    if gtype == int(GeomType.MESH):
        return ray_hull(p, v, *mesh)
    return jnp.full(p.shape[:-1], _INF, p.dtype)  # unknown type: no hit


def ray(m: Model, d: Data, pnt, vec, bodyexclude: int = -1):
    """Cast a world-frame ray against every geom (mj_ray).

    Returns (dist, geomid): smallest hit distance (|vec|-scaled parameter,
    i.e. metric distance when vec is unit) and the hit geom id, or
    (-1.0, -1) on a miss. bodyexclude skips that body's geoms (static int).
    """
    s = m.skel
    dtype = d.qpos.dtype
    pnt = jnp.asarray(pnt, dtype)
    vec = jnp.asarray(vec, dtype)
    best_t = jnp.asarray(_INF, dtype)
    best_g = jnp.asarray(-1, jnp.int32)
    for g in range(s.ngeom):
        if bodyexclude >= 0 and int(s.geom_bodyid[g]) == bodyexclude:
            continue
        gtype = int(s.geom_type[g])
        R = d.geom_xmat[g]
        p_l = R.T @ (pnt - d.geom_xpos[g])
        v_l = R.T @ vec
        mesh = None
        if gtype == int(GeomType.HFIELD):
            t = ray_hfield(m, s, int(s.geom_hfieldid[g]), p_l, v_l)
        else:
            if gtype == int(GeomType.MESH):
                mid = int(s.geom_meshid[g])
                fmask = np.arange(m.mesh_face_normal.shape[1]) < _mesh_facenum(m, s, mid)
                mesh = (
                    m.mesh_face_normal[mid],
                    m.mesh_face_dist[mid],
                    jnp.asarray(fmask),
                )
            t = ray_geom_local(gtype, p_l, v_l, m.geom_size[g], mesh)
        better = t < best_t
        best_t = jnp.where(better, t, best_t)
        best_g = jnp.where(better, g, best_g)
    hit = best_t < _INF * 0.5
    return jnp.where(hit, best_t, -1.0), jnp.where(hit, best_g, -1)


def _mesh_facenum(m: Model, s, mid: int) -> int:
    """Number of valid (non-padded) faces of a mesh (static skeleton data)."""
    return int(s.mesh_facenum[mid])
