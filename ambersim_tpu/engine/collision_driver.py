"""Collision driver: static candidate pairs -> contacts (fixed capacity).

Placeholder until the narrowphase lands; populates no contacts.
"""

from __future__ import annotations

from ambersim_tpu.core.types import Data, Model


def collision(m: Model, d: Data) -> Data:
    return d
