"""Inverse dynamics (the mj_inverse role; the reference's MuJoCo C dependency
exposes this next to mj_step — cf. reference examples/interactive_simulation.py
which drives the C engine directly).

Given (qpos, qvel, qacc) in Data, compute the applied generalized force that
would produce qacc:

    qfrc_inverse = M qacc + qfrc_bias - qfrc_passive - qfrc_constraint

The constraint force is recovered analytically from the soft-constraint model
(no iterative solve is needed in the inverse direction): with
jar = J qacc - aref, each row's force is the derivative of its penalty cost —
exactly the per-row force expression the Newton solver uses, so the forward
and inverse directions are consistent by construction (solver._row_costs is
shared). Supports pyramidal and elliptic cones, friction-loss rows, limits and
equality rows.

TPU notes: this is a cold path (system identification, residual learning,
torque estimation — batched via vmap). It reuses the dense efc_J; XLA DCEs
the structured-solver buffers here.
"""

from __future__ import annotations

import jax.numpy as jnp

from ambersim_tpu.core.types import Data, DisableBit, Model
from ambersim_tpu.engine import smooth, solver
from ambersim_tpu.engine.forward import fwd_position


def inv_constraint(m: Model, d: Data) -> Data:
    """Recover efc_force / qfrc_constraint from d.qacc (mj_invConstraint)."""
    s = m.skel
    if s.nefc == 0 or (m.opt.disableflags & DisableBit.CONSTRAINT):
        return d.replace(
            qfrc_constraint=jnp.zeros_like(d.qacc),
            efc_force=jnp.zeros_like(d.efc_force),
        )
    jar = d.efc_J @ d.qacc - d.efc_aref
    _, force, _ = solver._row_costs(m, d, jar)
    return d.replace(qfrc_constraint=d.efc_J.T @ force, efc_force=force)


def inverse(m: Model, d: Data) -> Data:
    """Full inverse dynamics: position + velocity stages, constraint-force
    recovery, and qfrc_inverse. d.qacc is the input acceleration."""
    d = fwd_position(m, d)
    d = smooth.fwd_velocity(m, d)
    d = inv_constraint(m, d)
    qfrc_inverse = d.qM @ d.qacc + d.qfrc_bias - d.qfrc_passive - d.qfrc_constraint
    return d.replace(qfrc_inverse=qfrc_inverse)
