"""Constraint solver (Newton with line search). Placeholder."""

from __future__ import annotations

from ambersim_tpu.core.types import Data, Model


def solve(m: Model, d: Data) -> Data:
    return d.replace(qacc=d.qacc_smooth)
