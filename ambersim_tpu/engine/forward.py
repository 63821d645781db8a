"""Top-level forward dynamics and step (the hot loop of the framework;
role of mjx.forward/mjx.step at reference ambersim/rl/base.py:86,93)."""

from __future__ import annotations

from ambersim_tpu.core.types import Data, DisableBit, EnableBit, IntegratorType, Model
from ambersim_tpu.engine import collision, constraint, integrate, smooth, solver


def fwd_position(m: Model, d: Data) -> Data:
    import jax

    with jax.named_scope("fwd_position_smooth"):
        d = smooth.fwd_position_smooth(m, d)
    if not (m.opt.disableflags & DisableBit.CONSTRAINT):
        with jax.named_scope("collision"):
            d = collision.collision(m, d)
        with jax.named_scope("make_constraint"):
            d = constraint.make_constraint(m, d)
    return d


def forward(m: Model, d: Data) -> Data:
    """Full forward dynamics: populate qacc without integrating."""
    import jax

    d = fwd_position(m, d)
    if m.opt.enableflags & EnableBit.ENERGY:
        # mj_energyPos at the end of the position stage
        d = d.replace(energy=d.energy.at[0].set(smooth.energy_pos(m, d)))
    with jax.named_scope("fwd_velocity"):
        d = smooth.fwd_velocity(m, d)
    if m.opt.enableflags & EnableBit.ENERGY:
        # mj_energyVel at the end of the velocity stage
        d = d.replace(energy=d.energy.at[1].set(smooth.energy_vel(m, d)))
    with jax.named_scope("fwd_actuation"):
        d = smooth.fwd_actuation(m, d)
    with jax.named_scope("fwd_acceleration"):
        d = smooth.fwd_acceleration(m, d)
    if m.opt.disableflags & DisableBit.CONSTRAINT or m.skel.nefc == 0:
        # zero any stale constraint force: the integrators consume
        # qfrc_smooth + qfrc_constraint as the total applied force
        import jax.numpy as jnp

        d = d.replace(qacc=d.qacc_smooth, qfrc_constraint=jnp.zeros_like(d.qfrc_constraint))
    else:
        with jax.named_scope("newton_solve"):
            d = solver.solve(m, d)
        if m.opt.noslip_iterations > 0:
            from ambersim_tpu.engine import noslip

            with jax.named_scope("noslip"):
                d = noslip.noslip(m, d)
    if m.opt.enableflags & EnableBit.FWDINV:
        # mj_compareFwdInv: recover the constraint force from the solved qacc
        # via the inverse direction and report the discrepancy norms
        import jax.numpy as jnp

        from ambersim_tpu.engine.inverse import inv_constraint

        di = inv_constraint(m, d)
        d = d.replace(
            solver_fwdinv=jnp.stack(
                [
                    jnp.linalg.norm(d.qfrc_constraint - di.qfrc_constraint),
                    jnp.linalg.norm(d.efc_force - di.efc_force),
                ]
            )
        )
    if m.skel.nsensor and not (m.opt.disableflags & DisableBit.SENSOR):
        from ambersim_tpu.engine import sensor

        with jax.named_scope("sensors"):
            d = sensor.sensors(m, d)
    return d


def step(m: Model, d: Data) -> Data:
    """One physics step: forward dynamics + integration (Euler or RK4)."""
    d = forward(m, d)
    if m.opt.integrator == int(IntegratorType.RK4):
        return integrate.rk4(m, d, forward)
    if m.opt.integrator == int(IntegratorType.IMPLICIT):
        return integrate.implicit(m, d)
    if m.opt.integrator == int(IntegratorType.IMPLICITFAST):
        return integrate.implicitfast(m, d)
    return integrate.euler(m, d)


# Persistent jitted entry points: tracing the engine body is the dominant
# Python cost of every outer jit (reset / training epoch / eval are three
# separate step-class graphs in PPO, and rollout() binds step twice per
# trace). A module-level pjit caches the traced jaxpr by (skel, leaf avals),
# so the engine is traced ONCE per model per process and every later outer
# graph pays only an aval-keyed cache hit + jaxpr batching. XLA inlines the
# nested call — compiled code and runtime are unchanged. Close models over
# jitted callers as before; calling these EAGERLY on TPU transfers the host
# model leaves per call (seconds over a tunneled chip) — keep eager use to
# tests.
import jax as _jax

step_jit = _jax.jit(step)
forward_jit = _jax.jit(forward)
