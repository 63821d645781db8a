"""Generate the mesh-collision hand assets (run from the repo root):

    python ambersim_tpu/models/hand/make_assets.py

Produces meshes/*.obj — genuinely concave visual link meshes — and their
convex-decomposed collision parts meshes/*_col_*.obj via the framework's own
approximate convex decomposition. Mirrors the reference's flagship asset:
the Barrett BH-280 ships 47 convex-decomposed collision meshes produced by
CoACD (reference: ambersim/models/barrett_hand/bh280.xml:4-54; decomposition
entry point at ambersim/utils/conversion_utils.py:40-81).

The generated .obj files are committed so the asset loads without running
this script; re-run it to regenerate after changing the shapes.
"""

import os

import numpy as np


def extrude_polygon(poly2d, tris2d, width):
    """Extrude a 2D (x, z) polygon ring along y in [-width/2, width/2]."""
    n = len(poly2d)
    lo = np.c_[poly2d[:, 0], np.full(n, -width / 2), poly2d[:, 1]]
    hi = np.c_[poly2d[:, 0], np.full(n, +width / 2), poly2d[:, 1]]
    verts = np.concatenate([lo, hi])
    faces = []
    for a, b, c in tris2d:  # -y cap: CCW in (x, z) faces -y already
        faces.append([a, b, c])
    for a, b, c in tris2d:  # +y cap flipped
        faces.append([a + n, c + n, b + n])
    # side walls: (x, z, y) is left-handed, so wind opposite to a z-extrusion
    for i in range(n):
        j = (i + 1) % n
        faces.append([i, j + n, j])
        faces.append([i, i + n, j + n])
    return verts, np.asarray(faces)


def palm():
    """U-channel palm: 9 x 12 x 4 cm block with a 5 x 1.5 cm channel scooped
    from the top face — concave, decomposes into >= 2 parts."""
    u = np.array(
        [
            [-0.045, 0.0],
            [0.045, 0.0],
            [0.045, 0.04],
            [0.025, 0.04],
            [0.025, 0.025],
            [-0.025, 0.025],
            [-0.025, 0.04],
            [-0.045, 0.04],
        ]
    )
    tris = np.array([[0, 1, 4], [1, 2, 3], [1, 3, 4], [0, 4, 5], [0, 5, 7], [5, 6, 7]])
    return extrude_polygon(u, tris, 0.12)


def prox_link():
    """Tapered proximal link (convex): 7 cm long octagon-profile beam."""
    p = np.array(
        [
            [0.0, -0.011],
            [0.065, -0.009],
            [0.07, -0.004],
            [0.07, 0.004],
            [0.065, 0.009],
            [0.0, 0.011],
        ]
    )
    tris = np.array([[0, 1, 2], [0, 2, 3], [0, 3, 4], [0, 4, 5]])
    return extrude_polygon(p, tris, 0.022)


def dist_link():
    """Hooked distal link: an L-profile with a downward fingertip hook —
    concave at the inner corner, decomposes into >= 2 parts."""
    L = np.array(
        [
            [0.0, -0.008],
            [0.045, -0.008],
            [0.045, -0.02],
            [0.058, -0.02],
            [0.058, 0.01],
            [0.0, 0.01],
        ]
    )
    tris = np.array([[0, 1, 5], [1, 4, 5], [1, 2, 3], [1, 3, 4]])
    return extrude_polygon(L, tris, 0.018)


def rock():
    """Small irregular convex rock (the grasp object)."""
    rng = np.random.default_rng(7)
    pts = rng.uniform(-1.0, 1.0, (24, 3)) * np.array([0.022, 0.022, 0.018])
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))
    from ambersim_tpu.mjcf.mesh import convex_hull
    return convex_hull(pts)


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    meshdir = os.path.join(here, "meshes")
    os.makedirs(meshdir, exist_ok=True)

    import sys

    sys.path.insert(0, os.path.join(here, "..", "..", ".."))
    from ambersim_tpu.mjcf.mesh import save_obj
    from ambersim_tpu.utils.conversion_utils import convex_decomposition_file

    for name, make in (("palm", palm), ("prox_link", prox_link), ("dist_link", dist_link), ("rock", rock)):
        v, f = make()
        path = os.path.join(meshdir, f"{name}.obj")
        save_obj(path, v, f)
        parts = convex_decomposition_file(path, threshold=0.1, max_convex_hull=4, savedir=meshdir)
        print(f"{name}: {len(parts)} collision part(s)")


if __name__ == "__main__":
    main()
