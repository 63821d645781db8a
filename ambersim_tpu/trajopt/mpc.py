"""Receding-horizon MPC driver over any shooting-type optimizer.

The reference exposes the pieces — `VanillaPredictiveSampler.optimize` and
the env step — and its docs frame predictive sampling as an MPC policy
(reference ambersim/trajopt/shooting.py:96-157); this module supplies the
closed loop: at every control step re-solve the horizon from the current
state, warm-started from the previous solution shifted by one knot, and
apply only the first control.

TPU-first shape: the whole closed loop is one lax.scan — the optimizer's
vmapped rollouts, the warm-start shift, and the plant step all stay
on-device, so a full MPC episode jits into a single XLA program and batches
with vmap over initial states (run_mpc_batch).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ambersim_tpu.core.types import Data, Model
from ambersim_tpu.engine import forward as _forward
from ambersim_tpu.engine import make_data
from ambersim_tpu.engine import step as _step
from ambersim_tpu.trajopt.shooting import ShootingAlgorithm


def _shift_tape(us: jax.Array) -> jax.Array:
    """Warm start for the next solve: drop the executed knot, repeat the
    last (the standard receding-horizon shift)."""
    return jnp.concatenate([us[1:], us[-1:]], axis=0)


def run_mpc(
    model: Model,
    optimizer: ShootingAlgorithm,
    params,
    n_steps: int,
    data: Optional[Data] = None,
    substeps: int = 1,
) -> Tuple[jax.Array, jax.Array, Data]:
    """Run closed-loop MPC for `n_steps` control steps.

    `params` is the optimizer's params pytree (e.g.
    VanillaPredictiveSamplerParams / ILQRParams): `x0` and `us_guess` seed
    the first solve; if the params carry an `rng` field it is split every
    step so each re-solve draws fresh samples. Each control step re-solves
    the horizon from the current state, applies the first control for
    `substeps` physics steps, and shifts the tape as the next warm start.

    Returns (xs, us, data_final): the realized state trajectory
    (n_steps+1, nq+nv), applied controls (n_steps, nu), and the final Data.
    """
    nq = model.nq
    if data is None:
        data = make_data(model)
    x0 = params.x0
    data = data.replace(qpos=x0[:nq], qvel=x0[nq:])
    data = _forward(model, data)
    has_rng = hasattr(params, "rng")

    def control_step(carry, _):
        data, params = carry
        x = jnp.concatenate([data.qpos, data.qvel])
        params = params.replace(x0=x)
        if has_rng:
            rng, sub = jax.random.split(params.rng)
            params = params.replace(rng=sub)
        _, us_star = optimizer.optimize(params)
        u = us_star[0]

        def substep(d, _):
            return _step(model, d.replace(ctrl=u)), None

        data, _ = jax.lax.scan(substep, data, None, length=substeps)
        params = params.replace(us_guess=_shift_tape(us_star))
        if has_rng:
            params = params.replace(rng=rng)
        return (data, params), (jnp.concatenate([data.qpos, data.qvel]), u)

    (data, _), (xs_tail, us) = jax.lax.scan(control_step, (data, params), None, length=n_steps)
    xs = jnp.concatenate([params.x0[None], xs_tail], axis=0)
    return xs, us, data


def run_mpc_batch(
    model: Model,
    optimizer: ShootingAlgorithm,
    params,
    n_steps: int,
    substeps: int = 1,
):
    """vmap run_mpc over a batch of params (leading axis on x0/us_guess/rng);
    the optimizer pytree is closed over (in_axes=None equivalent)."""

    def solo(p):
        return run_mpc(model, optimizer, p, n_steps, substeps=substeps)

    return jax.vmap(solo)(params)
