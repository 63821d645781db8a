"""Batched collision: analytic narrowphase over static candidate pairs.

Replaces MJX's collision driver role in the reference's hot loop
(SURVEY.md §3.4: "collision: broadphase pair pruning -> convex narrowphase").

TPU-first design: candidate pairs are enumerated at compile time
(skeleton pair_geom1/pair_geom2, filtered by contype/conaffinity/parent);
at runtime each geom-type pair group runs one vectorized narrowphase over all
its pairs at once (no per-pair control flow), writing into fixed contact
slots. "No contact" is encoded by dist > includemargin (row masked inactive
downstream), so every shape is static.

Conventions match MuJoCo: contact frame rows = (normal, tangent1, tangent2)
with the normal pointing from geom1 into geom2; contact pos is the midpoint
of the overlap.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ambersim_tpu.core.types import Contact, Data, EnableBit, GeomType, Model

_BIG = 1e10

_BOX_CORNERS = np.array(
    [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)], dtype=np.float32
)


def _make_frame(n: jax.Array) -> jax.Array:
    """(..., 3) normal -> (..., 3, 3) frame rows (n, t1, t2), branch-free.

    Matches MuJoCo's tangent convention (verified against the C oracle):
    reference axis = y if |n_y| <= |n_x| else x; t1 = the reference axis
    orthogonalized against n; t2 = n x t1.
    """
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    use_y = jnp.abs(n[..., 1:2]) <= jnp.abs(n[..., 0:1])
    ref = jnp.where(
        use_y,
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], n.dtype), n.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n.dtype), n.shape),
    )
    t1 = ref - n * jnp.sum(n * ref, axis=-1, keepdims=True)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
    t2 = jnp.cross(n, t1)
    return jnp.stack([n, t1, t2], axis=-2)


# Each narrowphase fn takes batched geom poses/sizes for its group and returns
# (dist, pos, frame) with a fixed number of contact points per pair.


def plane_sphere(xp1, xm1, s1, xp2, xm2, s2):
    n = xm1[..., :, 2]
    r = s2[..., 0]
    h = jnp.einsum("...i,...i->...", xp2 - xp1, n)
    dist = h - r
    pos = xp2 - n * (r + 0.5 * dist)[..., None]
    return dist[..., None], pos[..., None, :], _make_frame(n)[..., None, :, :]


def plane_capsule(xp1, xm1, s1, xp2, xm2, s2):
    n = xm1[..., :, 2]
    r, hl = s2[..., 0], s2[..., 1]
    axis = xm2[..., :, 2]
    dists, poss = [], []
    for sign in (1.0, -1.0):
        c = xp2 + sign * hl[..., None] * axis
        h = jnp.einsum("...i,...i->...", c - xp1, n)
        dist = h - r
        pos = c - n * (r + 0.5 * dist)[..., None]
        dists.append(dist)
        poss.append(pos)
    dist = jnp.stack(dists, axis=-1)  # (..., 2)
    pos = jnp.stack(poss, axis=-2)
    frame = jnp.broadcast_to(_make_frame(n)[..., None, :, :], pos.shape[:-1] + (3, 3))
    return dist, pos, frame


def plane_box(xp1, xm1, s1, xp2, xm2, s2):
    """Up to 4 deepest corners of the box vs the plane.

    Component form + one-hot selection: the obvious argsort/take_along_axis
    top-4 costs ~240 us/step on the quadruped bench (gathers with a trailing
    corner dim under the env vmap); four successive argmin one-hot reductions
    over (..., 8) are pure VPU work with identical tie-breaking (first index).
    """
    n = xm1[..., :, 2]
    corners = jnp.asarray(_BOX_CORNERS, dtype=xp2.dtype)  # (8, 3) static
    # corner world positions, one (..., 8) array per world axis
    pts_i = [
        xp2[..., i, None]
        + sum(xm2[..., i, j, None] * (s2[..., j, None] * corners[:, j]) for j in range(3))
        for i in range(3)
    ]
    d = sum((pts_i[i] - xp1[..., i, None]) * n[..., i, None] for i in range(3))  # (..., 8)

    arange8 = jnp.arange(8)
    dw = d
    dists, poss = [], []
    for _ in range(4):
        dk = jnp.min(dw, axis=-1)  # (...,)
        oh = (arange8 == jnp.argmin(dw, axis=-1)[..., None]).astype(d.dtype)
        pk = [jnp.sum(pts_i[i] * oh, axis=-1) for i in range(3)]  # selected corner
        dists.append(dk)
        poss.append(jnp.stack([pk[i] - 0.5 * dk * n[..., i] for i in range(3)], axis=-1))
        dw = dw + oh * _BIG  # exclude the picked corner from later rounds
    dist = jnp.stack(dists, axis=-1)  # (..., 4)
    pos = jnp.stack(poss, axis=-2)  # (..., 4, 3)
    frame = jnp.broadcast_to(_make_frame(n)[..., None, :, :], pos.shape[:-1] + (3, 3))
    return dist, pos, frame


def _sphere_sphere_raw(c1, r1, c2, r2):
    delta = c2 - c1
    dd = jnp.linalg.norm(delta, axis=-1)
    n = delta / jnp.maximum(dd, 1e-12)[..., None]
    # degenerate (concentric) fallback: z axis
    n = jnp.where(dd[..., None] > 1e-9, n, jnp.broadcast_to(jnp.array([0.0, 0, 1.0], c1.dtype), n.shape))
    dist = dd - (r1 + r2)
    pos = c1 + n * (r1 + 0.5 * dist)[..., None]
    return dist, pos, n


def sphere_sphere(xp1, xm1, s1, xp2, xm2, s2):
    dist, pos, n = _sphere_sphere_raw(xp1, s1[..., 0], xp2, s2[..., 0])
    return dist[..., None], pos[..., None, :], _make_frame(n)[..., None, :, :]


def _closest_on_segment(p, a, axis, hl):
    t = jnp.einsum("...i,...i->...", p - a, axis)
    t = jnp.clip(t, -hl, hl)
    return a + t[..., None] * axis


def sphere_capsule(xp1, xm1, s1, xp2, xm2, s2):
    axis = xm2[..., :, 2]
    c = _closest_on_segment(xp1, xp2, axis, s2[..., 1])
    dist, pos, n = _sphere_sphere_raw(xp1, s1[..., 0], c, s2[..., 0])
    return dist[..., None], pos[..., None, :], _make_frame(n)[..., None, :, :]


def capsule_capsule(xp1, xm1, s1, xp2, xm2, s2):
    a1, a2 = xm1[..., :, 2], xm2[..., :, 2]
    hl1, hl2 = s1[..., 1], s2[..., 1]
    # closest points between two segments (branch-free clamped solve)
    d12 = jnp.einsum("...i,...i->...", a1, a2)
    r = xp2 - xp1
    s_ = jnp.einsum("...i,...i->...", r, a1)
    t_ = jnp.einsum("...i,...i->...", r, a2)
    denom = 1.0 - d12 * d12
    u = jnp.where(jnp.abs(denom) > 1e-9, (s_ - d12 * t_) / jnp.where(jnp.abs(denom) > 1e-9, denom, 1.0), 0.0)
    u = jnp.clip(u, -hl1, hl1)
    v = jnp.clip(u * d12 - t_, -hl2, hl2)
    u = jnp.clip(v * d12 + s_, -hl1, hl1)
    p1 = xp1 + u[..., None] * a1
    p2 = xp2 + v[..., None] * a2
    dist, pos, n = _sphere_sphere_raw(p1, s1[..., 0], p2, s2[..., 0])
    return dist[..., None], pos[..., None, :], _make_frame(n)[..., None, :, :]


def _sphere_box_raw(center, r, xp2, xm2, s2):
    # sphere center in box frame
    local = jnp.einsum("...ji,...j->...i", xm2, center - xp2)
    clamped = jnp.clip(local, -s2, s2)
    inside = jnp.all(jnp.abs(local) < s2, axis=-1)
    # if inside: push to the nearest face
    gap = s2 - jnp.abs(local)
    ax = jnp.argmin(gap, axis=-1)
    onehot = jax.nn.one_hot(ax, 3, dtype=local.dtype)
    face_pt = jnp.where(
        inside[..., None],
        local * (1 - onehot) + onehot * jnp.sign(local) * s2,
        clamped,
    )
    closest = xp2 + jnp.einsum("...ij,...j->...i", xm2, face_pt)
    delta = closest - center
    dd = jnp.linalg.norm(delta, axis=-1)
    n_out = delta / jnp.maximum(dd, 1e-12)[..., None]
    n_in = -n_out  # when center is inside, normal flips (from sphere into box face)
    n = jnp.where(inside[..., None], n_in, n_out)
    dist = jnp.where(inside, -(dd + r), dd - r)
    pos = center + n * (r + 0.5 * dist)[..., None]
    return dist, pos, n


def sphere_box(xp1, xm1, s1, xp2, xm2, s2):
    dist, pos, n = _sphere_box_raw(xp1, s1[..., 0], xp2, xm2, s2)
    return dist[..., None], pos[..., None, :], _make_frame(n)[..., None, :, :]


def capsule_box(xp1, xm1, s1, xp2, xm2, s2):
    """Three contacts: sphere-box at both capsule endpoints plus the
    segment-box closest point (alternating projection between the two convex
    sets, fixed 8 iterations) for mid-segment face/edge contact."""
    r, hl = s1[..., 0], s1[..., 1]
    axis = xm1[..., :, 2]
    e1 = xp1 + hl[..., None] * axis
    e2 = xp1 - hl[..., None] * axis

    # alternating projection: p on segment, q on box
    pseg = xp1
    for _ in range(8):
        local = jnp.einsum("...ji,...j->...i", xm2, pseg - xp2)
        q = xp2 + jnp.einsum("...ij,...j->...i", xm2, jnp.clip(local, -s2, s2))
        t = jnp.clip(jnp.einsum("...i,...i->...", q - xp1, axis), -hl, hl)
        pseg = xp1 + t[..., None] * axis

    dists, poss, ns = [], [], []
    for c in (e1, e2, pseg):
        dist, pos, n = _sphere_box_raw(c, r, xp2, xm2, s2)
        dists.append(dist)
        poss.append(pos)
        ns.append(n)
    dist = jnp.stack(dists, axis=-1)
    pos = jnp.stack(poss, axis=-2)
    frame = _make_frame(jnp.stack(ns, axis=-2))
    return dist, pos, frame


def plane_cylinder(xp1, xm1, s1, xp2, xm2, s2):
    """Four candidate contacts: the low rim point of each cap (covers the
    side-lying line contact) plus the lower cap's rim tripod (+-120 deg,
    covers end-standing). Inactive slots filter out by distance."""
    n = xm1[..., :, 2]
    a = xm2[..., :, 2]
    c = xp2
    r, hl = s2[..., 0], s2[..., 1]
    # radial direction of steepest descent in the cap plane
    an = jnp.einsum("...i,...i->...", a, n)
    d = n - an[..., None] * a
    dn = jnp.linalg.norm(d, axis=-1, keepdims=True)
    # degenerate (axis || n): any tangent
    tangent = xm2[..., :, 0]
    d_rn = jnp.where(dn > 1e-6, d / jnp.maximum(dn, 1e-12), tangent)

    lower = -jnp.sign(an)[..., None]  # cap in the -n-ish direction
    cap_lo = c + lower * hl[..., None] * a
    cap_hi = c - lower * hl[..., None] * a

    def rot_about_axis(v, axis, ang):
        cs, sn = jnp.cos(ang), jnp.sin(ang)
        return v * cs + jnp.cross(axis, v) * sn + axis * jnp.einsum("...i,...i->...", axis, v)[..., None] * (1 - cs)

    rim = -r[..., None] * d_rn
    pts = [
        cap_lo + rim,
        cap_hi + rim,
        cap_lo + rot_about_axis(rim, a, 2.0 * jnp.pi / 3),
        cap_lo + rot_about_axis(rim, a, -2.0 * jnp.pi / 3),
    ]
    pts = jnp.stack(pts, axis=-2)  # (..., 4, 3)
    dist = jnp.einsum("...ki,...i->...k", pts - xp1[..., None, :], n)
    pos = pts - 0.5 * dist[..., None] * n[..., None, :]
    frame = jnp.broadcast_to(_make_frame(n)[..., None, :, :], pos.shape[:-1] + (3, 3))
    return dist, pos, frame


def plane_ellipsoid(xp1, xm1, s1, xp2, xm2, s2):
    """Support point of the ellipsoid in the -normal direction (1 contact)."""
    n = xm1[..., :, 2]
    n_l = jnp.einsum("...ji,...j->...i", xm2, -n)  # -n in ellipsoid frame
    sn = s2 * n_l
    w = s2 * sn / jnp.maximum(jnp.linalg.norm(sn, axis=-1, keepdims=True), 1e-12)
    p = xp2 + jnp.einsum("...ij,...j->...i", xm2, w)
    dist = jnp.einsum("...i,...i->...", p - xp1, n)
    pos = p - 0.5 * dist[..., None] * n
    return dist[..., None], pos[..., None, :], _make_frame(n)[..., None, :, :]


def box_box(xp1, xm1, s1, xp2, xm2, s2):
    """Exact SAT box-box with a clipped contact manifold (engine.convex)."""
    from ambersim_tpu.engine import convex

    h1 = convex.box_hull(xp1, xm1, s1)
    h2 = convex.box_hull(xp2, xm2, s2)
    dist, pos, n = convex.hull_hull(h1, h2, 8)
    frame = jnp.broadcast_to(_make_frame(n)[..., None, :, :], pos.shape[:-1] + (3, 3))
    return dist, pos, frame


def plane_mesh(xp1, xm1, s1, xp2, xm2, s2, mesh2):
    """Up to 4 deepest hull vertices of a convex mesh vs the plane."""
    verts, vert_mask = mesh2[0], mesh2[1]
    n = xm1[..., :, 2]
    pts = xp2[:, None, :] + jnp.einsum("...ij,...vj->...vi", xm2, verts)
    dvert = jnp.einsum("...vi,...i->...v", pts - xp1[:, None, :], n)
    dvert = jnp.where(jnp.asarray(vert_mask), dvert, _BIG)
    idx = jnp.argsort(dvert, axis=-1)[..., :4]
    dist = jnp.take_along_axis(dvert, idx, axis=-1)
    pos = jnp.take_along_axis(pts, idx[..., None], axis=-2) - 0.5 * dist[..., None] * n[..., None, :]
    frame = jnp.broadcast_to(_make_frame(n)[..., None, :, :], pos.shape[:-1] + (3, 3))
    return dist, pos, frame


def _point_hull_sd(p_local, face_n, face_d):
    """Signed distance of points to a convex hull via face planes.

    p_local (..., K, 3) in mesh frame; face_n (..., F, 3), face_d (..., F).
    Returns (sd (..., K), outward normal at argmax face (..., K, 3)).
    Exact for interior points and points nearest a face; approximate past
    edges/corners (adequate for contact resolution near the surface)."""
    plane_d = jnp.einsum("...ki,...fi->...kf", p_local, face_n) - face_d[..., None, :]
    sd = jnp.max(plane_d, axis=-1)
    idx = jnp.argmax(plane_d, axis=-1)
    n = jnp.take_along_axis(
        jnp.broadcast_to(face_n[..., None, :, :], p_local.shape[:-1] + face_n.shape[-2:]),
        idx[..., None, None],
        axis=-2,
    )[..., 0, :]
    return sd, n


def _mesh_frame_points(pts_world, xp_m, xm_m):
    return jnp.einsum("...ji,...kj->...ki", xm_m, pts_world - xp_m[..., None, :])


def _points_vs_hull(pts_world, r, xp_m, xm_m, face_n, face_d):
    """Contacts of spheres (centers pts_world (..., K, 3), radius r) against a
    hull. Returns dist (..., K), pos, world outward normal (..., K, 3)."""
    p_l = _mesh_frame_points(pts_world, xp_m, xm_m)
    sd, n_l = _point_hull_sd(p_l, face_n, face_d)
    n_w = jnp.einsum("...ij,...kj->...ki", xm_m, n_l)
    dist = sd - r
    # midpoint of overlap between sphere surface and hull face
    pos = pts_world - (r + 0.5 * dist)[..., None] * n_w
    return dist, pos, n_w


def sphere_mesh(xp1, xm1, s1, xp2, xm2, s2, mesh2):
    fn2, fd2 = mesh2[2], mesh2[3]
    dist, pos, n_w = _points_vs_hull(xp1[..., None, :], s1[..., 0:1], xp2, xm2, fn2, fd2)
    # normal out of the hull = g2 -> g1; flip to point g1 -> g2
    return dist, pos, _make_frame(-n_w)


def capsule_mesh(xp1, xm1, s1, xp2, xm2, s2, mesh2):
    """Endpoints + the convex-minimizing segment point (ternary search on the
    piecewise-linear hull distance)."""
    fn2, fd2 = mesh2[2], mesh2[3]
    r, hl = s1[..., 0], s1[..., 1]
    axis = xm1[..., :, 2]

    def sd_at(t):
        p = xp1 + t[..., None] * axis
        p_l = _mesh_frame_points(p[..., None, :], xp2, xm2)
        sd, _ = _point_hull_sd(p_l, fn2, fd2)
        return sd[..., 0]

    lo, hi = -hl, hl
    for _ in range(12):  # ternary search: sd(t) is convex (max of affines)
        m1 = lo + (hi - lo) / 3
        m2 = hi - (hi - lo) / 3
        left = sd_at(m1) < sd_at(m2)
        hi = jnp.where(left, m2, hi)
        lo = jnp.where(left, lo, m1)
    tmid = 0.5 * (lo + hi)
    pts = jnp.stack([xp1 + hl[..., None] * axis, xp1 - hl[..., None] * axis, xp1 + tmid[..., None] * axis], axis=-2)
    dist, pos, n_w = _points_vs_hull(pts, r[..., None], xp2, xm2, fn2, fd2)
    return dist, pos, _make_frame(-n_w)


def box_mesh(xp1, xm1, s1, xp2, xm2, s2, mesh2):
    """Exact SAT box-hull with a clipped contact manifold (engine.convex)."""
    from ambersim_tpu.engine import convex

    h1 = convex.box_hull(xp1, xm1, s1)
    h2 = convex.mesh_hull(xp2, xm2, mesh2[0], mesh2[2], mesh2[4], mesh2[5])
    dist, pos, n = convex.hull_hull(h1, h2, 4)
    frame = jnp.broadcast_to(_make_frame(n)[..., None, :, :], pos.shape[:-1] + (3, 3))
    return dist, pos, frame


def mesh_mesh(xp1, xm1, s1, xp2, xm2, s2, mesh1, mesh2):
    """Exact SAT hull-hull with a clipped contact manifold (engine.convex)."""
    from ambersim_tpu.engine import convex

    h1 = convex.mesh_hull(xp1, xm1, mesh1[0], mesh1[2], mesh1[4], mesh1[5])
    h2 = convex.mesh_hull(xp2, xm2, mesh2[0], mesh2[2], mesh2[4], mesh2[5])
    dist, pos, n = convex.hull_hull(h1, h2, 4)
    frame = jnp.broadcast_to(_make_frame(n)[..., None, :, :], pos.shape[:-1] + (3, 3))
    return dist, pos, frame


def _closest_on_triangle(p, a, b, c):
    """Closest point on triangle (a, b, c) to point p, branch-free
    (Ericson, Real-Time Collision Detection 5.1.5). All (..., 3)."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = jnp.maximum(va + vb + vc, 1e-20)
    v = jnp.clip(vb / denom, 0.0, 1.0)
    w = jnp.clip(vc / denom, 0.0, 1.0)
    interior = a + v[..., None] * ab + w[..., None] * ac
    # edge/vertex regions
    t_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, 1e-20), 0.0, 1.0)
    on_ab = a + t_ab[..., None] * ab
    t_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, 1e-20), 0.0, 1.0)
    on_ac = a + t_ac[..., None] * ac
    t_bc = jnp.clip((d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), 1e-20), 0.0, 1.0)
    on_bc = b + t_bc[..., None] * (c - b)
    out = interior
    out = jnp.where(((vc <= 0) & (d1 >= 0) & (d3 <= 0))[..., None], on_ab, out)
    out = jnp.where(((vb <= 0) & (d2 >= 0) & (d6 <= 0))[..., None], on_ac, out)
    out = jnp.where(((va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0))[..., None], on_bc, out)
    out = jnp.where(((d1 <= 0) & (d2 <= 0))[..., None], a, out)
    out = jnp.where(((d3 >= 0) & (d4 <= d3))[..., None], b, out)
    out = jnp.where(((d6 >= 0) & (d5 <= d6))[..., None], c, out)
    return out


def _hfield_window_tris(m, s, hid: int, c_local, K: int, dtype):
    """2*(K-1)^2 local-frame surface triangles of the KxK grid window nearest
    the local point c_local. Cells split along the (j,i)->(j+1,i+1) diagonal."""
    nrow, ncol = int(s.hfield_nrow[hid]), int(s.hfield_ncol[hid])
    size = m.hfield_size[hid]
    dx = 2.0 * size[0] / (ncol - 1)
    dy = 2.0 * size[1] / (nrow - 1)
    fx = (c_local[0] + size[0]) / dx
    fy = (c_local[1] + size[1]) / dy
    i0 = jnp.clip(jnp.floor(fx).astype(jnp.int32) - (K - 1) // 2, 0, ncol - K)
    j0 = jnp.clip(jnp.floor(fy).astype(jnp.int32) - (K - 1) // 2, 0, nrow - K)
    win = jax.lax.dynamic_slice(m.hfield_data[hid], (j0, i0), (K, K)) * size[2]  # (K, K)
    xs = (-size[0] + (i0 + jnp.arange(K)) * dx).astype(dtype)  # (K,)
    ys = (-size[1] + (j0 + jnp.arange(K)) * dy).astype(dtype)
    V = jnp.stack(
        [
            jnp.broadcast_to(xs[None, :], (K, K)),
            jnp.broadcast_to(ys[:, None], (K, K)),
            win.astype(dtype),
        ],
        axis=-1,
    )  # (K, K, 3) with [j, i]
    v00 = V[:-1, :-1].reshape(-1, 3)
    v01 = V[:-1, 1:].reshape(-1, 3)
    v10 = V[1:, :-1].reshape(-1, 3)
    v11 = V[1:, 1:].reshape(-1, 3)
    tri_a = jnp.concatenate([v00, v00], 0)
    tri_b = jnp.concatenate([v01, v11], 0)
    tri_c = jnp.concatenate([v11, v10], 0)
    return tri_a, tri_b, tri_c  # (T, 3) each, T = 2*(K-1)^2


def _hfield_spheres(m, s, d, gh: int, go: int, centers_w, r, K: int, k_out: int):
    """Deepest k_out contacts between a set of spheres (centers, shared radius)
    and the hfield's local triangle window. Returns (k_out,), (k_out, 3) world
    pos, (k_out, 3, 3) frames. Normal points from the hfield into the sphere."""
    dtype = centers_w.dtype
    hid = int(s.geom_hfieldid[gh])
    R = d.geom_xmat[gh]
    p = d.geom_xpos[gh]
    cs = jnp.einsum("ij,nj->ni", R.T, centers_w - p)  # (N, 3) local centers
    tri_a, tri_b, tri_c = _hfield_window_tris(m, s, hid, cs.mean(0), K, dtype)
    cp = _closest_on_triangle(cs[:, None, :], tri_a[None], tri_b[None], tri_c[None])  # (N, T, 3)
    dvec = cs[:, None, :] - cp
    dd = jnp.linalg.norm(dvec, axis=-1)
    n = dvec / jnp.maximum(dd, 1e-12)[..., None]
    # upward triangle plane normal + signed center-plane distance
    nt = jnp.cross(tri_b - tri_a, tri_c - tri_a)  # (T, 3)
    nt = nt * jnp.sign(nt[..., 2:3])
    nt = nt / jnp.maximum(jnp.linalg.norm(nt, -1, keepdims=True), 1e-12)
    sd = jnp.einsum("ntj,tj->nt", cs[:, None, :] - tri_a[None], nt)
    # is the center's xy inside the triangle's column? (2D barycentric)
    e0 = (tri_b - tri_a)[..., :2]
    e1 = (tri_c - tri_a)[..., :2]
    dp = cs[:, None, :2] - tri_a[None, :, :2]
    det = e0[..., 0] * e1[..., 1] - e0[..., 1] * e1[..., 0]
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    u = (dp[..., 0] * e1[..., 1] - dp[..., 1] * e1[..., 0]) / det
    v = (e0[..., 0] * dp[..., 1] - e0[..., 1] * dp[..., 0]) / det
    inside = (u >= 0) & (v >= 0) & (u + v <= 1)
    # center below the surface inside a column: push up along the plane normal;
    # outside-column triangles with the center behind their plane are ignored
    # (a tall neighbor must not claim a laterally adjacent sphere)
    below = inside & (sd < 0)
    ignore = (~inside) & (sd < 0)
    n = jnp.where(below[..., None], jnp.broadcast_to(nt[None], n.shape), n)
    dist = jnp.where(below, sd - r, dd - r)
    dist = jnp.where(ignore, _BIG, dist)
    cp = jnp.where(below[..., None], cs[:, None, :] - sd[..., None] * nt[None], cp)
    # one contact per triangle region; pick the k_out deepest across all
    # (sphere, triangle) candidates
    flat_dist = dist.reshape(-1)
    _, sel = jax.lax.top_k(-flat_dist, k_out)
    dist_k = flat_dist[sel]
    cp_k = cp.reshape(-1, 3)[sel]
    n_k = n.reshape(-1, 3)[sel]
    pos_w = p[None] + cp_k @ R.T + 0.5 * dist_k[:, None] * (n_k @ R.T)
    n_w = n_k @ R.T
    return dist_k, pos_w, _make_frame(n_w)


def _hfield_group(m, s, d, g1s, g2s, other_type: int, ncon_per: int):
    """Static unroll over hfield pairs (windows are tiny and pair counts low)."""
    dists, poss, frames = [], [], []
    for gh, go in zip(g1s, g2s):
        gh, go = int(gh), int(go)
        pair_idx = int(
            next(
                i
                for i in range(len(s.pair_geom1))
                if int(s.pair_geom1[i]) == gh and int(s.pair_geom2[i]) == go
            )
        )
        K = int(s.pair_hfk[pair_idx])
        if other_type == int(GeomType.SPHERE):
            centers = d.geom_xpos[go][None]
            r = m.geom_size[go, 0]
        elif other_type == int(GeomType.CAPSULE):
            # capsule: 3-sphere approximation along the axis
            axis = d.geom_xmat[go][:, 2]
            hl = m.geom_size[go, 1]
            centers = d.geom_xpos[go][None] + jnp.array([-1.0, 0.0, 1.0])[:, None] * hl * axis[None]
            r = m.geom_size[go, 0]
        else:  # box: 8 corner point contacts
            corners = jnp.asarray(_BOX_CORNERS, d.qpos.dtype) * m.geom_size[go][None]
            centers = d.geom_xpos[go][None] + corners @ d.geom_xmat[go].T
            r = jnp.zeros(())
        dist, pos, frame = _hfield_spheres(m, s, d, gh, go, centers, r, K, ncon_per)
        dists.append(dist)
        poss.append(pos)
        frames.append(frame)
    return jnp.stack(dists), jnp.stack(poss), jnp.stack(frames)


# dispatch table keyed by (type1, type2) with type1 <= type2 (compiler orders pairs)
_NARROWPHASE = {
    (int(GeomType.PLANE), int(GeomType.SPHERE)): (plane_sphere, 1),
    (int(GeomType.PLANE), int(GeomType.CAPSULE)): (plane_capsule, 2),
    (int(GeomType.PLANE), int(GeomType.BOX)): (plane_box, 4),
    (int(GeomType.SPHERE), int(GeomType.SPHERE)): (sphere_sphere, 1),
    (int(GeomType.SPHERE), int(GeomType.CAPSULE)): (sphere_capsule, 1),
    (int(GeomType.SPHERE), int(GeomType.BOX)): (sphere_box, 1),
    (int(GeomType.CAPSULE), int(GeomType.CAPSULE)): (capsule_capsule, 1),
    (int(GeomType.PLANE), int(GeomType.MESH)): (plane_mesh, 4),
    (int(GeomType.SPHERE), int(GeomType.MESH)): (sphere_mesh, 1),
    (int(GeomType.CAPSULE), int(GeomType.MESH)): (capsule_mesh, 3),
    (int(GeomType.BOX), int(GeomType.MESH)): (box_mesh, 4),
    (int(GeomType.MESH), int(GeomType.MESH)): (mesh_mesh, 4),
    (int(GeomType.CAPSULE), int(GeomType.BOX)): (capsule_box, 3),
    (int(GeomType.BOX), int(GeomType.BOX)): (box_box, 8),
    (int(GeomType.PLANE), int(GeomType.CYLINDER)): (plane_cylinder, 4),
    (int(GeomType.PLANE), int(GeomType.ELLIPSOID)): (plane_ellipsoid, 1),
    # hfield pairs dispatch through _hfield_group (window geometry needs the
    # model/skeleton, not just poses)
    (int(GeomType.HFIELD), int(GeomType.SPHERE)): (None, 4),
    (int(GeomType.HFIELD), int(GeomType.CAPSULE)): (None, 4),
    (int(GeomType.HFIELD), int(GeomType.BOX)): (None, 4),
}



SUPPORTED_PAIRS = set(_NARROWPHASE)


def geom_pair_distance(m: Model, d: Data, g1: int, g2: int):
    """Signed surface distance + closest points for ONE static geom pair.

    Returns (dist, p1, p2): p1 on geom1's surface, p2 on geom2's. Backs the
    <distance>/<normal>/<fromto> sensors (the mj_geomDistance role; parity in
    tests/test_distance_sensors.py). Exact for the analytic primitive pairs;
    box-box and mesh pairs reuse the SAT narrowphase, whose separation is a
    lower bound when the closest features are not face-aligned."""
    s = m.skel
    t1, t2 = int(s.geom_type[g1]), int(s.geom_type[g2])
    swap = t1 > t2
    if swap:
        g1, g2, t1, t2 = g2, g1, t2, t1
    fn = _NARROWPHASE.get((t1, t2), (None, 0))[0]
    if fn is None:
        raise NotImplementedError(
            f"distance sensor between geom types {GeomType(t1).name} and "
            f"{GeomType(t2).name} is not supported"
        )
    gsize = jnp.asarray(m.geom_size)
    args = (
        d.geom_xpos[g1], d.geom_xmat[g1], gsize[g1],
        d.geom_xpos[g2], d.geom_xmat[g2], gsize[g2],
    )

    def mesh_tuple(g):
        mid = int(s.geom_meshid[g])
        vert_mask = np.arange(m.mesh_vert.shape[1]) < int(s.mesh_vertnum[mid])
        return (
            jnp.asarray(m.mesh_vert)[mid],
            jnp.asarray(vert_mask),
            jnp.asarray(m.mesh_face_normal)[mid],
            jnp.asarray(m.mesh_face_dist)[mid],
            jnp.asarray(m.mesh_face_vert)[mid],
            jnp.asarray(m.mesh_edge)[mid],
        )

    if t1 == int(GeomType.MESH):
        args = args + (mesh_tuple(g1),)
    if t2 == int(GeomType.MESH):
        args = args + (mesh_tuple(g2),)
    dist, pos, frame = fn(*args)
    i = jnp.argmin(dist)
    di = dist[i]
    n = frame[i, 0]  # contact normal, points from geom1 toward geom2
    half = n * (di * 0.5)
    p1, p2 = pos[i] - half, pos[i] + half
    if swap:
        p1, p2 = p2, p1
    return di, p1, p2


def _mix_params(m: Model, g1, g2):
    """Contact parameter mixing (mirrors mj_contactParam): priority wins,
    otherwise solmix-weighted solref/solimp, max friction. Margins ADD
    (includemargin = margin1 + margin2 regardless of priority) and gap is
    dynamically inert — both oracle-verified against MuJoCo 3.10, which
    changed the pre-3.x max-margin / margin-minus-gap semantics.

    g1/g2 may be static numpy indices or traced int arrays (broadphase-capped
    groups select pairs at runtime), so model fields go through jnp.asarray."""
    gprio = jnp.asarray(m.geom_priority)
    gsolmix = jnp.asarray(m.geom_solmix)
    gsolref = jnp.asarray(m.geom_solref)
    gsolimp = jnp.asarray(m.geom_solimp)
    gfriction = jnp.asarray(m.geom_friction)
    gmargin = jnp.asarray(m.geom_margin)
    ggap = jnp.asarray(m.geom_gap)

    p1, p2 = gprio[g1], gprio[g2]
    eq = p1 == p2
    w1 = gsolmix[g1] / jnp.maximum(gsolmix[g1] + gsolmix[g2], 1e-12)
    w1 = jnp.where((gsolmix[g1] >= 1e-12) & (gsolmix[g2] < 1e-12), 1.0, w1)
    w1 = jnp.where((gsolmix[g1] < 1e-12) & (gsolmix[g2] >= 1e-12), 0.0, w1)
    w1 = jnp.where((gsolmix[g1] < 1e-12) & (gsolmix[g2] < 1e-12), 0.5, w1)
    w1 = jnp.where(eq, w1, jnp.where(p1 > p2, 1.0, 0.0))[..., None]

    # solref: weighted average if standard (positive); min if direct
    sr1, sr2 = gsolref[g1], gsolref[g2]
    standard = (sr1[..., 0] > 0) & (sr2[..., 0] > 0)
    solref = jnp.where(standard[..., None], w1 * sr1 + (1 - w1) * sr2, jnp.minimum(sr1, sr2))
    solimp = w1 * gsolimp[g1] + (1 - w1) * gsolimp[g2]

    fr = jnp.maximum(gfriction[g1], gfriction[g2])
    fr = jnp.where(eq[..., None], fr, jnp.where(p1[..., None] > p2[..., None], gfriction[g1], gfriction[g2]))
    friction = jnp.stack([fr[..., 0], fr[..., 0], fr[..., 1], fr[..., 2], fr[..., 2]], axis=-1)

    margin = gmargin[g1] + gmargin[g2]
    gap = jnp.maximum(ggap[g1], ggap[g2])
    return friction, solref, solimp, margin, gap


def collision(m: Model, d: Data) -> Data:
    """Run narrowphase for all candidate pairs into fixed contact slots.

    Broadphase (SURVEY.md §7 step 5): type-pair groups larger than the
    compile-time broadphase_cap don't get per-pair slots. Instead a cheap
    bounding-sphere (or plane-halfspace) distance is computed for every pair
    in the group — one fused gather+norm, O(npair) trivial arithmetic — and
    ``lax.top_k`` selects the cap most-overlapping pairs. Only those run the
    expensive narrowphase and occupy contact slots, so narrowphase cost and
    efc row count scale with the cap, not with the O(n^2) candidate count.
    Slot layout stays static; slot content (which geom pair) is traced.

    Additionally, a model-declared global cap (<custom><numeric
    name="max_contact_points">) compacts the ncand candidate slots to the
    skel.ncon deepest-penetrating contacts after narrowphase, shrinking the
    efc rows the solver sees (exact whenever <= cap contacts are active).
    """
    s = m.skel
    if s.ncon == 0:
        return d

    dtype = d.qpos.dtype
    ncand = s.ncand
    dist_all = jnp.full((ncand,), _BIG, dtype)
    pos_all = jnp.zeros((ncand, 3), dtype)
    frame_all = jnp.tile(jnp.eye(3, dtype=dtype), (ncand, 1, 1))
    fric_all = jnp.zeros((ncand, 5), dtype)
    solref_all = jnp.zeros((ncand, 2), dtype)
    solimp_all = jnp.zeros((ncand, 5), dtype)
    margin_all = jnp.zeros((ncand,), dtype)
    gap_all = jnp.zeros((ncand,), dtype)
    geom1_all = jnp.asarray(s.con_geom1, jnp.int32)
    geom2_all = jnp.asarray(s.con_geom2, jnp.int32)

    # group pairs by effective collision type (static; cylinders/ellipsoids
    # in non-analytic pairs dispatch as their synthesized MESH hulls)
    pair_t1 = s.pair_ctype1
    pair_t2 = s.pair_ctype2
    con_adr = s.con_adr  # (npair,) first contact slot of each pair (-1 = capped group)
    dyn_groups = {
        (int(t1), int(t2)): (int(adr), int(nsel))
        for t1, t2, adr, nsel in zip(s.bpg_type1, s.bpg_type2, s.bpg_adr, s.bpg_nsel)
    }

    groups: dict = {}
    for i in range(len(s.pair_geom1)):
        groups.setdefault((int(pair_t1[i]), int(pair_t2[i])), []).append(i)

    for tkey, idx_list in groups.items():
        fn, ncon_per = _NARROWPHASE[tkey]
        idx = np.array(idx_list, dtype=np.int32)
        g1s = s.pair_geom1[idx]  # static numpy
        g2s = s.pair_geom2[idx]
        exp_s = s.pair_explicit[idx]  # static numpy

        if tkey in dyn_groups:
            adr, k_sel = dyn_groups[tkey]
            # cheap bound distance over ALL pairs of the group (vectorized)
            c1 = d.geom_xpos[g1s]
            c2 = d.geom_xpos[g2s]
            rb = jnp.asarray(m.geom_rbound)
            gmargin = jnp.asarray(m.geom_margin)
            margin_ub = jnp.maximum(gmargin[g1s], gmargin[g2s])
            if (exp_s >= 0).any():
                pmargin = jnp.asarray(m.pair_margin)[np.maximum(exp_s, 0)]
                margin_ub = jnp.where(jnp.asarray(exp_s >= 0), pmargin, margin_ub)
            if tkey[0] == int(GeomType.PLANE):
                n = d.geom_xmat[g1s][..., :, 2]
                db = jnp.einsum("pi,pi->p", c2 - c1, n) - rb[g2s] - margin_ub
            else:
                db = jnp.linalg.norm(c2 - c1, axis=-1) - rb[g1s] - rb[g2s] - margin_ub
            _, sel = jax.lax.top_k(-db, k_sel)  # (k_sel,) most-overlapping pairs
            g1 = jnp.asarray(g1s)[sel]
            g2 = jnp.asarray(g2s)[sel]
            exp = jnp.asarray(exp_s)[sel]
            slots = adr + np.arange(k_sel * ncon_per, dtype=np.int32)
            geom1_all = geom1_all.at[slots].set(jnp.repeat(g1, ncon_per))
            geom2_all = geom2_all.at[slots].set(jnp.repeat(g2, ncon_per))
            gsize = jnp.asarray(m.geom_size)
        else:
            g1, g2, exp = g1s, g2s, exp_s
            slots = np.concatenate(
                [np.arange(ncon_per, dtype=np.int32) + int(con_adr[i]) for i in idx]
            )
            gsize = m.geom_size

        args = (
            d.geom_xpos[g1], d.geom_xmat[g1], gsize[g1],
            d.geom_xpos[g2], d.geom_xmat[g2], gsize[g2],
        )

        def mesh_tuple(gs):
            meshids = jnp.asarray(s.geom_meshid)[gs] if tkey in dyn_groups else s.geom_meshid[gs]
            verts = jnp.asarray(m.mesh_vert)[meshids]  # (P, V, 3)
            vertnum = jnp.asarray(s.mesh_vertnum)[meshids] if tkey in dyn_groups else s.mesh_vertnum[meshids]
            vert_mask = jnp.arange(m.mesh_vert.shape[1])[None, :] < vertnum[:, None]
            return (
                verts,
                vert_mask,
                jnp.asarray(m.mesh_face_normal)[meshids],
                jnp.asarray(m.mesh_face_dist)[meshids],
                jnp.asarray(m.mesh_face_vert)[meshids],
                jnp.asarray(m.mesh_edge)[meshids],
            )

        if tkey[0] == int(GeomType.MESH):
            args = args + (mesh_tuple(g1),)
        if tkey[1] == int(GeomType.MESH):
            args = args + (mesh_tuple(g2),)
        if tkey[0] == int(GeomType.HFIELD):
            dist, pos, frame = _hfield_group(m, s, d, g1s, g2s, tkey[1], ncon_per)
        else:
            dist, pos, frame = fn(*args)  # (npairs_in_group, ncon_per[, ...])
        friction, solref, solimp, margin, gap = _mix_params(m, g1, g2)
        # explicit <pair> overrides
        has_any_exp = bool((exp_s >= 0).any())
        if has_any_exp:
            if isinstance(exp, np.ndarray):
                eidx = jnp.asarray(np.maximum(exp, 0))
                hexp = jnp.asarray(exp >= 0)
            else:
                eidx = jnp.maximum(exp, 0)
                hexp = exp >= 0
            friction = jnp.where(hexp[:, None], jnp.asarray(m.pair_friction)[eidx], friction)
            solref = jnp.where(hexp[:, None], jnp.asarray(m.pair_solref)[eidx], solref)
            solimp = jnp.where(hexp[:, None], jnp.asarray(m.pair_solimp)[eidx], solimp)
            margin = jnp.where(hexp, jnp.asarray(m.pair_margin)[eidx], margin)
            gap = jnp.where(hexp, jnp.asarray(m.pair_gap)[eidx], gap)

        if m.opt.enableflags & EnableBit.OVERRIDE:
            # mjENBL_OVERRIDE: contact solver parameters replaced wholesale by
            # the option-level o_* values; includemargin = o_margin with gap
            # treated as zero (oracle-verified). condim stays per-geom. The
            # o_* fields are traced, so overrides can be swept under vmap.
            friction = jnp.broadcast_to(
                jnp.asarray(m.opt.o_friction, dtype), friction.shape
            )
            solref = jnp.broadcast_to(jnp.asarray(m.opt.o_solref, dtype), solref.shape)
            solimp = jnp.broadcast_to(jnp.asarray(m.opt.o_solimp, dtype), solimp.shape)
            includemargin = jnp.broadcast_to(
                jnp.asarray(m.opt.o_margin, dtype), margin.shape
            )
            gap = jnp.zeros_like(gap)
        else:
            # oracle-verified (MuJoCo 3.10): includemargin is the mixed (or
            # explicit <pair>) margin; gap no longer subtracts
            includemargin = margin
        # scatter into slots (slot indices static for both paths)
        dist_all = dist_all.at[slots].set(dist.reshape(-1))
        pos_all = pos_all.at[slots].set(pos.reshape(-1, 3))
        frame_all = frame_all.at[slots].set(frame.reshape(-1, 3, 3))
        fric_all = fric_all.at[slots].set(jnp.repeat(friction, ncon_per, axis=0))
        solref_all = solref_all.at[slots].set(jnp.repeat(solref, ncon_per, axis=0))
        solimp_all = solimp_all.at[slots].set(jnp.repeat(solimp, ncon_per, axis=0))
        margin_all = margin_all.at[slots].set(jnp.repeat(includemargin, ncon_per, axis=0))
        gap_all = gap_all.at[slots].set(jnp.repeat(gap, ncon_per, axis=0))

    if s.ncon < ncand:
        # global contact cap (<custom numeric max_contact_points>): keep the
        # s.ncon deepest candidates. Activity is dist < includemargin, so the
        # selection key is penetration-past-margin; empty slots sit at
        # -_BIG and lax.top_k breaks ties by lowest index (deterministic).
        _, sel = jax.lax.top_k(margin_all - dist_all, s.ncon)
        # Row selection as a one-hot matmul, not x[sel]: per-env gathers
        # under the big env vmap run row-at-a-time on TPU and were ~5 ms of
        # the 35 ms clutter rowcap step (hlo_stats, batch 256); the one-hot
        # contraction is an MXU batched matmul and exact (one unit entry per
        # row). Ints ride the same path via f32 (ids << 2^24).
        onehot = (
            sel[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, ncand), 1)
        ).astype(dist_all.dtype)

        def take(x):
            # precision=HIGHEST: TPU f32 dots default to bf16 operands, which
            # would round dist/pos/frame to ~8 mantissa bits and corrupt geom
            # ids above 256; exact-f32 is cheap here (one operand is one-hot).
            flat = x.reshape(ncand, -1)
            out = jnp.matmul(onehot, flat, precision=jax.lax.Precision.HIGHEST)
            return out.reshape((s.ncon,) + x.shape[1:])

        dist_all = take(dist_all)
        pos_all = take(pos_all)
        frame_all = take(frame_all)
        fric_all = take(fric_all)
        solref_all = take(solref_all)
        solimp_all = take(solimp_all)
        margin_all = take(margin_all)
        gap_all = take(gap_all)
        geom1_all = jnp.round(take(geom1_all.astype(dist_all.dtype))).astype(geom1_all.dtype)
        geom2_all = jnp.round(take(geom2_all.astype(dist_all.dtype))).astype(geom2_all.dtype)

    contact = Contact(
        dist=dist_all,
        pos=pos_all,
        frame=frame_all,
        friction=fric_all,
        solref=solref_all,
        solimp=solimp_all,
        includemargin=margin_all,
        gap=gap_all,
        geom1=geom1_all,
        geom2=geom2_all,
    )
    return d.replace(contact=contact)
