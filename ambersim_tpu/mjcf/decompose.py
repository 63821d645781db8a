"""Approximate convex decomposition (host side, numpy).

Fills the CoACD role in the reference pipeline (reference:
ambersim/utils/conversion_utils.py:58-72 runs the CoACD C++ library with
max_convex_hull=16, threshold=0.1): split a genuinely concave solid into
convex parts whose union matches the input.

Method: volumetric ACD by recursive plane splitting (V-HACD/CoACD family).
The solid is represented by volume samples (generalized winding number) plus
its boundary vertices and surface samples; the part with the worst concavity
(relative hull-volume error) is split by the cutting plane that minimizes
the resulting children's total hull volume, searched over principal and
cardinal axes at projection quantiles. Points within one sample-spacing of
the cut are projected onto the plane for both children, so neighboring part
hulls meet at the cut instead of leaving a sampling gap.
"""

from __future__ import annotations

import heapq
from typing import List, Tuple

import numpy as np
from scipy.spatial import ConvexHull

from ambersim_tpu.mjcf.mesh import convex_hull


def mesh_volume(verts: np.ndarray, faces: np.ndarray) -> float:
    """Exact volume of a closed, outward-oriented triangle mesh."""
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    return float(np.abs(np.einsum("fi,fi->f", v0, np.cross(v1, v2)).sum()) / 6.0)


def winding_number(points: np.ndarray, verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Generalized winding number (Jacobson et al.): ~1 inside, ~0 outside.

    Van Oosterom-Strackee per-triangle solid angle, vectorized over
    points x faces. Robust for closed meshes regardless of convexity.
    """
    out = np.empty(len(points))
    tri = verts[faces]  # (F, 3, 3)
    # chunk points to bound memory at P*F
    chunk = max(1, int(4e6 / max(len(faces), 1)))
    for s in range(0, len(points), chunk):
        p = points[s : s + chunk]
        a = tri[None, :, 0] - p[:, None]  # (P, F, 3)
        b = tri[None, :, 1] - p[:, None]
        c = tri[None, :, 2] - p[:, None]
        la = np.linalg.norm(a, axis=-1)
        lb = np.linalg.norm(b, axis=-1)
        lc = np.linalg.norm(c, axis=-1)
        num = np.einsum("pfi,pfi->pf", a, np.cross(b, c))
        den = (
            la * lb * lc
            + np.einsum("pfi,pfi->pf", a, b) * lc
            + np.einsum("pfi,pfi->pf", b, c) * la
            + np.einsum("pfi,pfi->pf", c, a) * lb
        )
        out[s : s + chunk] = np.arctan2(num, den).sum(axis=1) / (2.0 * np.pi)
    return out


def sample_surface(verts: np.ndarray, faces: np.ndarray, n: int, rng) -> np.ndarray:
    """Area-weighted random points on the mesh surface."""
    tri = verts[faces]
    area = 0.5 * np.linalg.norm(np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1)
    fidx = rng.choice(len(faces), size=n, p=area / area.sum())
    r1 = np.sqrt(rng.random(n))
    r2 = rng.random(n)
    a, b, c = tri[fidx, 0], tri[fidx, 1], tri[fidx, 2]
    return (1 - r1)[:, None] * a + (r1 * (1 - r2))[:, None] * b + (r1 * r2)[:, None] * c


def _hull_volume(points: np.ndarray) -> float:
    if len(points) < 4:
        return 0.0
    try:
        return float(ConvexHull(points).volume)
    except Exception:
        return 0.0


class _Part:
    __slots__ = ("vol_pts", "hull_pts", "vol", "hull_vol", "conc")

    def __init__(self, vol_pts, hull_pts, vol_per_sample):
        self.vol_pts = vol_pts  # interior samples (drive volume estimates)
        self.hull_pts = hull_pts  # interior + boundary points (drive hulls)
        self.vol = len(vol_pts) * vol_per_sample
        self.hull_vol = _hull_volume(hull_pts)
        self.conc = 0.0 if self.hull_vol <= 0 else max(0.0, (self.hull_vol - self.vol) / self.hull_vol)


def _split_axes(points: np.ndarray) -> np.ndarray:
    """Candidate cut directions: cardinal + principal axes of the point set."""
    axes = [np.eye(3)[i] for i in range(3)]
    centered = points - points.mean(axis=0)
    if len(points) > 4:
        _, vecs = np.linalg.eigh(centered.T @ centered)
        axes += [vecs[:, i] for i in range(3)]
    return np.asarray(axes)


def approximate_convex_decomposition(
    verts: np.ndarray,
    faces: np.ndarray,
    threshold: float = 0.05,
    max_convex_hull: int = 16,
    resolution: int = 24,
    seed: int = 0,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Decompose a closed triangle mesh into convex parts.

    threshold: maximum relative hull-volume error per part (the concavity
    metric); parts below it are emitted as-is. max_convex_hull caps the part
    count (reference default 16: conversion_utils.py:60).
    Returns a list of (hull_verts, hull_faces).
    """
    rng = np.random.default_rng(seed)
    lo, hi = verts.min(axis=0), verts.max(axis=0)
    diag = float(np.linalg.norm(hi - lo))

    # volume samples on a regular grid (inside by winding number)
    axes = [np.linspace(lo[i], hi[i], resolution) for i in range(3)]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    wn = winding_number(grid, verts, faces)
    vol_pts = grid[wn > 0.5]
    if len(vol_pts) < 8:  # thin shell: fall back to denser surface sampling
        vol_pts = sample_surface(verts, faces, 2000, rng)
    total_vol = mesh_volume(verts, faces)
    vol_per_sample = total_vol / max(len(vol_pts), 1)
    spacing = diag / resolution

    surf = sample_surface(verts, faces, 1500, rng)
    boundary = np.concatenate([verts, surf], axis=0)

    root = _Part(vol_pts, np.concatenate([vol_pts, boundary]), vol_per_sample)
    # max-heap by removable volume (concavity * hull volume)
    heap = [(-root.conc * root.hull_vol, 0, root)]
    done: List[_Part] = []
    counter = 1

    while heap and (len(heap) + len(done)) < max_convex_hull:
        _, _, part = heapq.heappop(heap)
        if part.conc <= threshold or len(part.vol_pts) < 16:
            done.append(part)
            continue
        best = None
        for axis in _split_axes(part.vol_pts):
            proj_v = part.vol_pts @ axis
            proj_h = part.hull_pts @ axis
            for q in (0.3, 0.4, 0.5, 0.6, 0.7):
                off = np.quantile(proj_v, q)
                left_v = part.vol_pts[proj_v <= off]
                right_v = part.vol_pts[proj_v > off]
                if len(left_v) < 8 or len(right_v) < 8:
                    continue

                def side_pts(sign):
                    keep = (proj_h - off) * sign <= 0
                    pts = part.hull_pts[keep]
                    # project near-cut points from the far side onto the
                    # plane so children meet at the cut
                    band = np.abs(proj_h - off) <= spacing
                    extra = part.hull_pts[band & ~keep]
                    extra = extra - ((extra @ axis) - off)[:, None] * axis
                    return np.concatenate([pts, extra]) if len(extra) else pts

                la = _Part(left_v, side_pts(+1), vol_per_sample)
                rb = _Part(right_v, side_pts(-1), vol_per_sample)
                score = la.hull_vol + rb.hull_vol
                if best is None or score < best[0]:
                    best = (score, la, rb)
        if best is None:
            done.append(part)  # no feasible cut (degenerate point set)
            continue
        # NOTE: a cut is accepted even when it does not immediately reduce
        # total hull volume — on a torus no single plane is "productive",
        # but the recursion is (halves -> quarters -> convex-ish arcs).
        _, la, rb = best
        heapq.heappush(heap, (-la.conc * la.hull_vol, counter, la))
        counter += 1
        heapq.heappush(heap, (-rb.conc * rb.hull_vol, counter, rb))
        counter += 1

    done.extend(p for _, _, p in heap)
    parts = []
    for p in done:
        if len(p.hull_pts) >= 4 and _hull_volume(p.hull_pts) > 0:
            parts.append(convex_hull(p.hull_pts))
    return parts
