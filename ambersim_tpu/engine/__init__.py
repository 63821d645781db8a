"""TPU-native physics pipeline.

Public API mirrors the call surface the reference uses from MJX
(reference: ambersim/rl/base.py:52,83,86,93 and ambersim/trajopt/shooting.py:34-41):
``make_data``, ``forward``, ``step``. All functions are pure, jit/vmap-safe,
and operate on a single env; batch by ``jax.vmap`` with ``in_axes=(None, 0)``.
"""

from ambersim_tpu.engine import support  # noqa: F401
from ambersim_tpu.engine.forward import forward, step  # noqa: F401
from ambersim_tpu.engine.init import make_data  # noqa: F401
from ambersim_tpu.engine.inverse import inverse  # noqa: F401
