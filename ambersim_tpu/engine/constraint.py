"""Constraint assembly: equality, friction loss, limits, contacts -> efc rows.

Placeholder until the constraint solver lands.
"""

from __future__ import annotations

from ambersim_tpu.core.types import Data, Model


def make_constraint(m: Model, d: Data) -> Data:
    return d
