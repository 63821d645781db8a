"""Conversion tests: XML export round trip, convex decomposition parity
(mirrors reference tests/test_model_io.py:149-180)."""

import os

import numpy as np

from ambersim_tpu import ROOT
from ambersim_tpu.mjcf.mesh import convex_hull, save_obj, signed_distance
from ambersim_tpu.utils.conversion_utils import convex_decomposition_file, save_model_xml
from ambersim_tpu.utils.io_utils import load_model_from_file


def test_save_model_xml_roundtrip(tmp_path):
    out = os.path.join(tmp_path, "pendulum_exported.xml")
    save_model_xml(os.path.join(ROOT, "models/pendulum/pendulum.urdf"), out)
    model = load_model_from_file(out)
    assert model.nq == 1 and model.nu == 1
    np.testing.assert_allclose(np.asarray(model.actuator_ctrlrange[0]), [-2.0, 2.0])


def _make_two_tet_obj(path):
    """Two disjoint tetrahedra: a 2-component mesh."""
    tet = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    verts = np.concatenate([tet, tet + np.array([3.0, 0, 0])])
    faces = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]])
    faces = np.concatenate([faces, faces + 4])
    save_obj(path, verts, faces)


def test_convex_decomposition(tmp_path):
    meshfile = os.path.join(tmp_path, "two_tets.obj")
    _make_two_tet_obj(meshfile)
    parts = convex_decomposition_file(meshfile, savedir=tmp_path)
    assert len(parts) == 2
    # parity criterion (reference test_model_io.py:163-178): each part matches
    # its own convex hull in signed distance at random query points
    rng = np.random.default_rng(0)
    for pv, pf in parts:
        hv, hf = convex_hull(pv)
        pts = rng.uniform(-1, 2, size=(100, 3)) + pv.mean(0)
        sd_part = signed_distance(pts, pv, pf)
        sd_hull = signed_distance(pts, hv, hf)
        np.testing.assert_allclose(sd_part, sd_hull, atol=1e-9)
    # saved files exist with the reference naming convention
    assert os.path.exists(os.path.join(tmp_path, "two_tets_col_0.obj"))
    assert os.path.exists(os.path.join(tmp_path, "two_tets_col_1.obj"))
