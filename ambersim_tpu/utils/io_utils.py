"""Model I/O: MJCF/URDF loading with option overrides
(reference API: ambersim/utils/io_utils.py:139-249).

`load_model_from_file` plays the role of the reference's
`load_mj_model_from_file` (io_utils.py:139): resolves the path
global/local/repo-relative, dispatches URDF through the converter, applies
solver/iteration overrides. `load_model_and_data_from_file` mirrors
`load_mjx_model_and_data_from_file` (io_utils.py:244), returning the compiled
device Model plus a fresh Data.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple, Union

from ambersim_tpu.core.types import Data, Model
from ambersim_tpu.utils._internal_utils import _check_filepath


def load_model_from_file(
    filepath: Union[str, Path],
    force_float: bool = False,
    solver: Optional[str] = None,
    iterations: Optional[int] = None,
    ls_iterations: Optional[int] = None,
    cone: Optional[str] = None,  # "pyramidal"/"elliptic"; pre-compile (layout!)
    broadphase_cap: int = 0,
    hessian_bf16: bool = False,  # opt-in bf16 Newton Hessian assembly (see Option)
    device=None,
) -> Model:
    """Load a URDF or MJCF file into a compiled Model.

    Model leaves stay as host numpy arrays by default: close over the model
    in your jitted rollout/training function and the constants are baked into
    the executable with zero transfers (the right pattern on a tunneled TPU,
    where each individual host<->device transfer costs seconds). Pass
    `device=` to upload the model once as a single flat buffer instead
    (core.device.put_model) if you want to pass it as a jit *argument*.

    broadphase_cap > 0 bounds contact capacity for cluttered scenes: any
    geom-type pair group with more candidate pairs than the cap gets only
    `cap` contact slots, filled each step with the cap most-overlapping pairs
    (bounding-sphere top-k broadphase in engine/collision.py). 0 = exact
    all-pairs narrowphase."""
    from ambersim_tpu.core.device import put_model
    from ambersim_tpu.engine.setconst import set_constants
    from ambersim_tpu.mjcf import compile_spec
    from ambersim_tpu.mjcf.parser import parse_mjcf

    path = _check_filepath(filepath)
    if path.endswith(".urdf"):
        from ambersim_tpu.mjcf.urdf import urdf_to_spec

        spec = urdf_to_spec(path)
    else:
        spec = parse_mjcf(path)

    if force_float:
        from ambersim_tpu.mjcf.urdf import force_float_base

        force_float_base(spec)

    if cone is not None:
        # must be applied BEFORE compilation: the static efc layout encodes
        # the cone (k rows/contact elliptic vs 2(k-1) pyramidal); flipping
        # opt.cone on a compiled Model is rejected by the solver
        if cone.lower() not in ("pyramidal", "elliptic"):
            raise ValueError(f"cone must be 'pyramidal' or 'elliptic', got {cone!r}")
        spec.option["cone"] = cone.lower()

    model = set_constants(compile_spec(spec, broadphase_cap=broadphase_cap))

    opt_updates = {}
    if solver is not None:
        from ambersim_tpu.core.types import SolverType

        opt_updates["solver"] = int(SolverType[solver.upper()])
    if iterations is not None:
        opt_updates["iterations"] = int(iterations)
    if ls_iterations is not None:
        opt_updates["ls_iterations"] = int(ls_iterations)
    if hessian_bf16:
        opt_updates["hessian_bf16"] = True
    if opt_updates:
        model = model.replace(opt=model.opt.replace(**opt_updates))
    if device is not None:
        model = put_model(model, device)
    return model


def load_model_and_data_from_file(
    filepath: Union[str, Path], force_float: bool = False, **kwargs
) -> Tuple[Model, Data]:
    """Load a model and allocate Data (reference: io_utils.py:244-249)."""
    from ambersim_tpu.engine import make_data

    model = load_model_from_file(filepath, force_float=force_float, **kwargs)
    return model, make_data(model)
