"""Model loading in three path styles (reference: examples/load_from_file.py)."""


# Allow running from a source checkout without pip install.
import os as _os, sys as _sys

_d = _os.path.dirname(_os.path.abspath(__file__))
while _d != "/" and not _os.path.isdir(_os.path.join(_d, "ambersim_tpu")):
    _d = _os.path.dirname(_d)
_sys.path.insert(0, _d)
from pathlib import Path

from ambersim_tpu import ROOT
from ambersim_tpu.utils.io_utils import load_model_and_data_from_file

if __name__ == "__main__":
    # global path
    model, data = load_model_and_data_from_file(ROOT + "/models/pendulum/pendulum.xml")
    print("global path:", model.skel.model_name, "nq =", model.nq)

    # repo-root-relative path
    model, data = load_model_and_data_from_file("models/pendulum/scene.xml")
    print("repo-relative:", model.skel.model_name, "ngeom =", model.ngeom)

    # pathlib.Path + URDF
    model, data = load_model_and_data_from_file(Path(ROOT) / "models/pendulum/pendulum.urdf")
    print("urdf:", model.skel.model_name, "nu =", model.nu)
