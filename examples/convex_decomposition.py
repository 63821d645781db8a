"""Convex decomposition of mesh files (reference: examples/convex_decomposition.py).

Decomposes the packaged mesh-hand assets — real concave robot link meshes —
into convex collision parts, the same pipeline that produced the committed
`*_col_*.obj` files consumed by models/hand/hand_mesh.xml (the role CoACD
plays for the reference's Barrett hand: ambersim/models/barrett_hand/bh280.xml:4-54).
"""


# Allow running from a source checkout without pip install.
import os as _os, sys as _sys

_d = _os.path.dirname(_os.path.abspath(__file__))
while _d != "/" and not _os.path.isdir(_os.path.join(_d, "ambersim_tpu")):
    _d = _os.path.dirname(_d)
_sys.path.insert(0, _d)
import os
import tempfile

from ambersim_tpu import ROOT
from ambersim_tpu.utils.conversion_utils import convex_decomposition_dir, convex_decomposition_file

if __name__ == "__main__":
    out = tempfile.mkdtemp()
    meshdir = os.path.join(ROOT, "models", "hand", "meshes")

    # single file: the concave U-channel palm
    parts = convex_decomposition_file(os.path.join(meshdir, "palm.obj"), threshold=0.1, savedir=out)
    print(f"palm.obj decomposed into {len(parts)} convex parts:")
    for i, (pv, pf) in enumerate(parts):
        print(f"  part {i}: {len(pv)} verts, {len(pf)} faces -> {out}/palm_col_{i}.obj")

    # whole directory (skips existing *_col_* outputs)
    convex_decomposition_dir(meshdir, recursive=True, savedir=out)
    print(f"directory pass complete -> {out}")
