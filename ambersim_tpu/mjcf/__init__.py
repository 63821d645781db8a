"""Host-side model compiler: MJCF/URDF -> Model pytree.

Plays the role MuJoCo's C compiler plays for the reference
(reference: ambersim/utils/io_utils.py:206 `mj.MjModel.from_xml_path`).
"""

from ambersim_tpu.mjcf.compiler import compile_spec, load_model  # noqa: F401
from ambersim_tpu.mjcf.parser import parse_mjcf, parse_mjcf_string  # noqa: F401
