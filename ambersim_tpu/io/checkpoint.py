"""Parameter checkpoint I/O (role of brax.io.model.save_params/load_params,
used by the reference at examples/rl/pendulum/ex_save_and_load.py:85,101 — D9).

Params are arbitrary pytrees; arrays are materialized to host numpy before
pickling so checkpoints are device-independent.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any, Union

import jax
import numpy as np


def save_params(path: Union[str, Path], params: Any) -> None:
    host_params = jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, params)
    with open(path, "wb") as f:
        pickle.dump(host_params, f)


def load_params(path: Union[str, Path]) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)
