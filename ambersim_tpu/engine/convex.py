"""Convex-convex narrowphase: vectorized SAT with polygon-clip manifolds.

Replaces the MJX convex pipeline role in the reference stack (GJK/EPA for
mesh hulls — reference failure-mode note at
/root/reference/ambersim/utils/io_utils.py:230-233; SURVEY.md §7 hard-part 2).

TPU-first reformulation: instead of iterative GJK/EPA (data-dependent simplex
updates, divergent branches under vmap), we run a *separating-axis test over
the complete axis set* of the two polytopes — all face normals plus all
edge-direction cross products. For convex polytopes this is exact (it is the
same optimum EPA converges to), and it maps onto the hardware as one batched
matmul (verts x axes) followed by masked reductions: no data-dependent
control flow at all. Contact manifolds come from a flat, fully-masked
polygon-clip candidate set (face verts + edge/side-plane crossings) instead
of sequential Sutherland-Hodgman clipping.

All padding in hull data duplicates *real* geometry (repeat-last-vert /
repeat-first-face), so reductions need no validity masks: duplicates never
change a max/min.

Conventions match MuJoCo: contact normal points from geom1 into geom2,
contact pos is the midpoint of the surface overlap, dist < 0 inside.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1e10


class Hull(NamedTuple):
    """World-frame convex polytope (batched over leading dims).

    verts:  (..., V, 3)
    face_n: (..., F, 3) outward unit normals
    face_v: (..., F, FV, 3) face polygon rings, CCW around face_n,
            padded by repeating the last vertex
    edge:   (..., E, 2, 3) unique edge segments
    """

    verts: jnp.ndarray
    face_n: jnp.ndarray
    face_v: jnp.ndarray
    edge: jnp.ndarray


# box corner order matches collision._BOX_CORNERS: index bit pattern (x, y, z)
# with -1 for bit 0: corner k = (sx, sy, sz), k = 4*(x>0) + 2*(y>0) + (z>0)
_BOX_CORNERS = np.array(
    [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)], dtype=np.float32
)
# face rings (CCW around outward normal), one per +-x, +-y, +-z
_BOX_FACES = np.array(
    [
        [4, 6, 7, 5],  # +x
        [0, 1, 3, 2],  # -x
        [2, 3, 7, 6],  # +y
        [0, 4, 5, 1],  # -y
        [1, 5, 7, 3],  # +z
        [0, 2, 6, 4],  # -z
    ],
    dtype=np.int32,
)
_BOX_FACE_AXIS = np.array([0, 0, 1, 1, 2, 2], dtype=np.int32)
_BOX_FACE_SIGN = np.array([1.0, -1.0, 1.0, -1.0, 1.0, -1.0], dtype=np.float32)
_BOX_EDGES = np.array(
    [[0, 1], [2, 3], [4, 5], [6, 7], [0, 2], [1, 3], [4, 6], [5, 7], [0, 4], [1, 5], [2, 6], [3, 7]],
    dtype=np.int32,
)


def box_hull(xp, xm, size) -> Hull:
    """Hull view of a box geom: 8 verts, 6 faces, 12 edges (analytic)."""
    corners = jnp.asarray(_BOX_CORNERS, xp.dtype)
    verts = xp[..., None, :] + jnp.einsum("...ij,...kj->...ki", xm, corners * size[..., None, :])
    axis_n = np.eye(3, dtype=np.float32)[_BOX_FACE_AXIS] * _BOX_FACE_SIGN[:, None]
    face_n = jnp.einsum("...ij,fj->...fi", xm, jnp.asarray(axis_n, xp.dtype))
    face_v = verts[..., jnp.asarray(_BOX_FACES), :]  # (..., 6, 4, 3)
    edge = verts[..., jnp.asarray(_BOX_EDGES), :]  # (..., 12, 2, 3)
    return Hull(verts, face_n, face_v, edge)


def mesh_hull(xp, xm, verts_l, face_n_l, face_v_l, edge_l) -> Hull:
    """Hull view of a mesh geom from compile-time local-frame hull data."""
    rot = lambda v: jnp.einsum("...ij,...kj->...ki", xm, v)  # noqa: E731
    verts = xp[..., None, :] + rot(verts_l)
    face_n = rot(face_n_l)
    fv_shape = face_v_l.shape
    flat_fv = face_v_l.reshape(fv_shape[:-3] + (fv_shape[-3] * fv_shape[-2], 3))
    face_v = xp[..., None, None, :] + rot(flat_fv).reshape(fv_shape)
    flat_e = edge_l.reshape(edge_l.shape[:-3] + (-1, 3))
    edge = xp[..., None, None, :] + rot(flat_e).reshape(edge_l.shape)
    return Hull(verts, face_n, face_v, edge)


def _seg_seg_closest(a0, a1, b0, b1):
    """Closest points between segments [a0,a1], [b0,b1]; batched, branch-free."""
    da = a1 - a0
    db = b1 - b0
    r = b0 - a0
    aa = jnp.einsum("...i,...i->...", da, da)
    bb = jnp.einsum("...i,...i->...", db, db)
    ab = jnp.einsum("...i,...i->...", da, db)
    ar = jnp.einsum("...i,...i->...", da, r)
    br = jnp.einsum("...i,...i->...", db, r)
    den = aa * bb - ab * ab
    safe = jnp.abs(den) > 1e-12
    t = jnp.where(safe, (ar * bb - br * ab) / jnp.where(safe, den, 1.0), 0.0)
    t = jnp.clip(t, 0.0, 1.0)
    u = jnp.where(bb > 1e-12, (t * ab - br) / jnp.maximum(bb, 1e-12), 0.0)
    u = jnp.clip(u, 0.0, 1.0)
    t = jnp.where(aa > 1e-12, (u * ab + ar) / jnp.maximum(aa, 1e-12), 0.0)
    t = jnp.clip(t, 0.0, 1.0)
    p = a0 + t[..., None] * da
    q = b0 + u[..., None] * db
    return p, q


def hull_hull(h1: Hull, h2: Hull, ncon: int):
    """SAT narrowphase between two convex polytopes.

    Returns (dist (..., ncon), pos (..., ncon, 3), n (..., 3)) with the
    normal pointing from hull1 into hull2. Unused contact slots carry
    dist = +BIG (masked inactive downstream).
    """
    F1 = h1.face_n.shape[-2]
    F2 = h2.face_n.shape[-2]
    E1 = h1.edge.shape[-3]
    E2 = h2.edge.shape[-3]

    c1 = jnp.mean(h1.verts, axis=-2)
    c2 = jnp.mean(h2.verts, axis=-2)
    cdir = c2 - c1

    # ---- axis set: face normals (oriented 1 -> 2) + edge-cross axes ----
    e1d = h1.edge[..., 1, :] - h1.edge[..., 0, :]  # (..., E1, 3)
    e2d = h2.edge[..., 1, :] - h2.edge[..., 0, :]  # (..., E2, 3)
    cr = jnp.cross(e1d[..., :, None, :], e2d[..., None, :, :])  # (..., E1, E2, 3)
    cr = cr.reshape(cr.shape[:-3] + (E1 * E2, 3))
    crn = jnp.linalg.norm(cr, axis=-1)
    cr_ok = crn > 1e-8
    cr = cr / jnp.maximum(crn, 1e-12)[..., None]
    # orient all axes from hull1 toward hull2
    axes = jnp.concatenate([h1.face_n, -h2.face_n, cr], axis=-2)  # (..., A, 3)
    flip = jnp.einsum("...ai,...i->...a", axes, cdir)
    axes = jnp.where((flip < 0)[..., None], -axes, axes)

    # ---- support values: one batched matmul per hull ----
    d1 = jnp.einsum("...vi,...ai->...av", h1.verts, axes)  # (..., A, V1)
    d2 = jnp.einsum("...vi,...ai->...av", h2.verts, axes)
    max1 = jnp.max(d1, axis=-1)
    min2 = jnp.min(d2, axis=-1)
    sep = min2 - max1  # separation along each axis (> 0 means disjoint)

    # invalidate degenerate cross axes
    valid = jnp.concatenate(
        [
            jnp.ones(axes.shape[:-2] + (F1 + F2,), bool),
            cr_ok,
        ],
        axis=-1,
    )
    sep = jnp.where(valid, sep, -_BIG)

    # best face axis and best edge axis; prefer faces unless an edge axis is
    # decisively better (avoids normal jitter on near-ties, cf. Bullet SAT)
    sep_f = sep[..., : F1 + F2]
    sep_e = sep[..., F1 + F2 :]
    bf = jnp.argmax(sep_f, axis=-1)
    be = jnp.argmax(sep_e, axis=-1)
    best_f = jnp.take_along_axis(sep_f, bf[..., None], axis=-1)[..., 0]
    best_e = jnp.take_along_axis(sep_e, be[..., None], axis=-1)[..., 0]
    use_edge = best_e > best_f + jnp.maximum(1e-7, 1e-3 * jnp.abs(best_f))
    dist0 = jnp.where(use_edge, best_e, best_f)
    bidx = jnp.where(use_edge, be + F1 + F2, bf)
    n = jnp.take_along_axis(axes, bidx[..., None, None], axis=-2)[..., 0, :]  # (..., 3)

    # ================= face-case manifold =================
    # reference face lives on hull1 iff the winning face axis came from
    # hull1's block. The face RING, though, is selected by alignment with
    # the oriented normal n, NOT by the winning axis index: axes are flipped
    # to point hull1->hull2, so a hull's two antiparallel faces produce the
    # SAME flipped axis and tie in sep — argmax can land on the far-side
    # face, whose ring then anchors the depth projection a full box-width
    # off (observed: near-parallel stacked boxes reporting +0.079
    # "separation" while 0.021 interpenetrated, letting the top box fall
    # straight through; tests/test_convex_narrowphase.py near-parallel).
    on1 = bf < F1  # reference face lives on hull1

    def gather_face(h: Hull, idx):
        fv = jnp.take_along_axis(
            h.face_v, idx[..., None, None, None], axis=-3
        )[..., 0, :, :]  # (..., FV, 3)
        fn = jnp.take_along_axis(h.face_n, idx[..., None, None], axis=-2)[..., 0, :]
        return fv, fn

    # incident face = argmin over faces of n . face_n_own (most anti-parallel
    # to the contact normal as seen from that hull's outward orientation)
    inc_score1 = jnp.einsum("...fi,...i->...f", h1.face_n, n)  # want max (n points away from 1)
    inc_score2 = jnp.einsum("...fi,...i->...f", h2.face_n, n)  # want min
    if1 = jnp.argmax(inc_score1, axis=-1)
    if2 = jnp.argmin(inc_score2, axis=-1)
    # the n-aligned faces are ALSO the reference rings (see comment above):
    # hull1's reference face is its most n-aligned face, hull2's its most
    # anti-aligned — identical selections to the incident faces
    rf1 = if1
    rf2 = if2

    # reference ring/normal and incident ring/normal, resolved by on1.
    # rings from the two hulls may have different widths: pad to a common
    # width by repeating the last vertex (degenerate edges are harmless)
    def pad_ring(fv, width):
        extra = width - fv.shape[-2]
        if extra <= 0:
            return fv
        last = jnp.broadcast_to(fv[..., -1:, :], fv.shape[:-2] + (extra, 3))
        return jnp.concatenate([fv, last], axis=-2)

    fvw = max(h1.face_v.shape[-2], h2.face_v.shape[-2])
    rfv1, rfn1 = gather_face(h1, rf1)
    rfv2, rfn2 = gather_face(h2, rf2)
    ifv1, ifn1 = gather_face(h1, if1)
    ifv2, ifn2 = gather_face(h2, if2)
    rfv1, rfv2, ifv1, ifv2 = (pad_ring(x, fvw) for x in (rfv1, rfv2, ifv1, ifv2))
    sel = on1[..., None, None]
    ref_v = jnp.where(sel, rfv1, rfv2)
    inc_v = jnp.where(sel, ifv2, ifv1)
    ref_n_own = jnp.where(on1[..., None], rfn1, rfn2)
    inc_n_own = jnp.where(on1[..., None], ifn2, ifn1)

    FV_r = ref_v.shape[-2]
    FV_i = inc_v.shape[-2]

    # side planes of a ring (inward normals): sn_k = face_n x (v_{k+1} - v_k)
    def side_planes(ring, fn_own):
        nxt = jnp.roll(ring, -1, axis=-2)
        ev = nxt - ring
        sn = jnp.cross(fn_own[..., None, :], ev)
        return sn  # (..., FV, 3); zero for padded (repeated) verts

    ref_sn = side_planes(ref_v, ref_n_own)
    inc_sn = side_planes(inc_v, inc_n_own)

    tol = 1e-6 + 1e-6 * jnp.max(jnp.abs(ref_v), axis=(-2, -1))  # (...,)

    def inside(pts, ring, sn, tol):
        # pts (..., K, 3) vs ring planes (..., FV, 3) anchored at ring verts
        rel = pts[..., :, None, :] - ring[..., None, :, :]  # (..., K, FV, 3)
        dd = jnp.einsum("...kfi,...fi->...kf", rel, sn)
        slack = tol[..., None, None] * jnp.maximum(jnp.linalg.norm(sn, axis=-1), 1e-12)[..., None, :]
        return jnp.all(dd >= -slack, axis=-1)

    # candidate set: incident verts in ref region, ref verts in incident
    # region, incident-edge x ref-side-plane crossings
    cand_iv = inc_v  # (..., FV_i, 3)
    ok_iv = inside(cand_iv, ref_v, ref_sn, tol)
    cand_rv = ref_v
    ok_rv = inside(cand_rv, inc_v, inc_sn, tol)

    # edge crossings: incident ring edges against each ref side plane
    inc_a = inc_v
    inc_b = jnp.roll(inc_v, -1, axis=-2)
    # plane k: passes through ref_v[k], normal ref_sn[k]
    num = jnp.einsum("...fi,...kfi->...kf", ref_sn, ref_v[..., None, :, :] - inc_a[..., :, None, :])
    den = jnp.einsum("...fi,...ki->...kf", ref_sn, inc_b - inc_a)
    t_ok = jnp.abs(den) > 1e-12
    t = jnp.where(t_ok, num / jnp.where(t_ok, den, 1.0), -1.0)
    cross_pt = inc_a[..., :, None, :] + t[..., None] * (inc_b - inc_a)[..., :, None, :]
    cross_pt = cross_pt.reshape(cross_pt.shape[:-3] + (FV_i * FV_r, 3))
    t_flat = t.reshape(t.shape[:-2] + (FV_i * FV_r,))
    ok_cross = (t_flat >= 0.0) & (t_flat <= 1.0)
    ok_cross = ok_cross & inside(cross_pt, ref_v, ref_sn, tol)

    cand = jnp.concatenate([cand_iv, cand_rv, cross_pt], axis=-2)  # (..., C, 3)
    ok = jnp.concatenate([ok_iv, ok_rv, ok_cross], axis=-1)

    # per-candidate depth: project along n onto each hull's involved face
    # plane; dist = gap between the two surfaces at the candidate
    plane1_n = jnp.where(on1[..., None], ref_n_own, inc_n_own)
    plane2_n = jnp.where(on1[..., None], inc_n_own, ref_n_own)
    p1_anchor = jnp.where(sel, ref_v[..., :1, :], inc_v[..., :1, :])[..., 0, :]
    p2_anchor = jnp.where(sel, inc_v[..., :1, :], ref_v[..., :1, :])[..., 0, :]

    def line_plane_t(p, pn, pa):
        # p + t n on plane (pn, pa): t = pn.(pa - p) / pn.n
        den = jnp.einsum("...i,...i->...", pn, n)
        den = jnp.where(jnp.abs(den) > 1e-6, den, jnp.where(den >= 0, 1e-6, -1e-6))
        return jnp.einsum("...ki,...i->...k", pa[..., None, :] - p, pn) / den[..., None]

    t1 = line_plane_t(cand, plane1_n, p1_anchor)
    t2 = line_plane_t(cand, plane2_n, p2_anchor)
    cdist = t2 - t1  # gap along n (hull2 surface minus hull1 surface)
    cpos = cand + (0.5 * (t1 + t2))[..., None] * n[..., None, :]
    cdist = jnp.where(ok, cdist, _BIG)

    # ---- manifold reduction: slot 0 = deepest; remaining slots spread
    # around the contact-plane compass, softly biased toward depth ----
    from ambersim_tpu.engine.collision import _make_frame  # local import (no cycle at call time)

    frame_n = _make_frame(n)
    tan1 = frame_n[..., 1, :]
    tan2 = frame_n[..., 2, :]

    deepest = jnp.argmin(cdist, axis=-1)
    sel_idx = [deepest]
    for k in range(1, ncon):
        ang = 2.0 * np.pi * k / max(ncon - 1, 1)
        uvec = float(np.cos(ang)) * tan1 + float(np.sin(ang)) * tan2
        score = jnp.einsum("...ki,...i->...k", cand, uvec) - 0.5 * cdist
        score = jnp.where(ok, score, -_BIG)
        sel_idx.append(jnp.argmax(score, axis=-1))
    sel_idx = jnp.stack(sel_idx, axis=-1)  # (..., ncon)

    # one-hot contraction, not take_along_axis: per-env gathers under the
    # big env vmap run row-at-a-time on TPU (~1.6 ms of the clutter rowcap
    # step across these two sites, hlo_stats); the one-hot einsum is a
    # batched matmul and exact (single unit entry per selected row). A/B on
    # the 496-pair exact-allpairs config measured no downside (2,643 one-hot
    # vs 2,568 gathers env steps/s).
    C = cand.shape[-2]
    onehot = (
        sel_idx[..., :, None] == jnp.arange(C, dtype=sel_idx.dtype)
    ).astype(cdist.dtype)  # (..., ncon, C)
    # precision=HIGHEST: TPU f32 einsums default to bf16 operands; these
    # select exact contact dist/pos rows (one-hot operand, so exact is free).
    face_dist = jnp.einsum(
        "...kc,...c->...k", onehot, cdist, precision=jax.lax.Precision.HIGHEST
    )
    face_pos = jnp.einsum(
        "...kc,...ci->...ki", onehot, cpos, precision=jax.lax.Precision.HIGHEST
    )
    # a face-case contact with no valid candidate at all (grazing corner):
    # fall back to the support points along n
    any_ok = jnp.any(ok, axis=-1)

    # ================= edge-case manifold =================
    # parallel edges share one cross axis, so decode the *supporting* edge
    # pair along n, not the axis index: the hull1 edge with max midpoint
    # support (both endpoints tie iff the edge is perpendicular to n, which
    # the winning edge is), and the hull2 edge with min support.
    emid1 = 0.5 * (h1.edge[..., 0, :] + h1.edge[..., 1, :])
    emid2 = 0.5 * (h2.edge[..., 0, :] + h2.edge[..., 1, :])
    e1i = jnp.argmax(jnp.einsum("...ei,...i->...e", emid1, n), axis=-1)
    e2i = jnp.argmin(jnp.einsum("...ei,...i->...e", emid2, n), axis=-1)
    a = jnp.take_along_axis(h1.edge, e1i[..., None, None, None], axis=-3)[..., 0, :, :]
    b = jnp.take_along_axis(h2.edge, e2i[..., None, None, None], axis=-3)[..., 0, :, :]
    p_e, q_e = _seg_seg_closest(a[..., 0, :], a[..., 1, :], b[..., 0, :], b[..., 1, :])
    edge_pos = 0.5 * (p_e + q_e)
    edge_dist = dist0  # separation along the SAT axis

    # ================= support-point fallback =================
    i1 = jnp.argmax(jnp.take_along_axis(d1, bidx[..., None, None], axis=-2)[..., 0, :], axis=-1)
    i2 = jnp.argmin(jnp.take_along_axis(d2, bidx[..., None, None], axis=-2)[..., 0, :], axis=-1)
    sp1 = jnp.take_along_axis(h1.verts, i1[..., None, None], axis=-2)[..., 0, :]
    sp2 = jnp.take_along_axis(h2.verts, i2[..., None, None], axis=-2)[..., 0, :]
    fb_pos = 0.5 * (sp1 + sp2)

    # ================= combine =================
    use_face = (~use_edge) & any_ok
    pos0 = jnp.where(
        use_edge[..., None], edge_pos, jnp.where(any_ok[..., None], face_pos[..., 0, :], fb_pos)
    )
    d0 = jnp.where(use_edge, edge_dist, jnp.where(any_ok, face_dist[..., 0], dist0))

    dist = jnp.concatenate([d0[..., None], jnp.where(use_face[..., None], face_dist[..., 1:], _BIG)], axis=-1)
    pos = jnp.concatenate(
        [pos0[..., None, :], jnp.where(use_face[..., None, None], face_pos[..., 1:, :], 0.0)],
        axis=-2,
    )

    # dedup: spread-selection can pick the same candidate for several slots
    # (small manifolds); duplicated points would double contact stiffness
    dtol = 1e-6 + 1e-5 * jnp.max(jnp.abs(ref_v), axis=(-2, -1))
    for k in range(1, ncon):
        dup = jnp.zeros(dist.shape[:-1], bool)
        for j in range(k):
            dup = dup | (
                jnp.linalg.norm(pos[..., k, :] - pos[..., j, :], axis=-1) < dtol
            ) & (dist[..., j] < _BIG * 0.5)
        dist = dist.at[..., k].set(jnp.where(dup, _BIG, dist[..., k]))
    return dist, pos, n
