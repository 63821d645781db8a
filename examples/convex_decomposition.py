"""Convex decomposition of mesh files (reference: examples/convex_decomposition.py)."""

import os
import tempfile

import numpy as np

from ambersim_tpu.mjcf.mesh import save_obj
from ambersim_tpu.utils.conversion_utils import convex_decomposition_dir, convex_decomposition_file

if __name__ == "__main__":
    tmp = tempfile.mkdtemp()
    # build a demo multi-component mesh
    tet = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    verts = np.concatenate([tet, tet + np.array([3.0, 0, 0]), tet + np.array([0.0, 3, 0])])
    faces = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]])
    faces = np.concatenate([faces, faces + 4, faces + 8])
    meshfile = os.path.join(tmp, "demo.obj")
    save_obj(meshfile, verts, faces)

    parts = convex_decomposition_file(meshfile, max_convex_hull=16, savedir=tmp)
    print(f"decomposed into {len(parts)} convex parts:")
    for i, (pv, pf) in enumerate(parts):
        print(f"  part {i}: {len(pv)} verts, {len(pf)} faces -> {tmp}/demo_col_{i}.obj")

    convex_decomposition_dir(tmp, recursive=True, savedir=tmp)
    print("directory pass complete")
