"""iLQR on the pendulum: second-order trajopt through the differentiable sim.

Demonstrates the full trajopt ladder this framework ships beyond the
reference's predictive sampler (reference ambersim/trajopt/shooting.py):
the same `ShootingParams`-style surface, but the control tape is improved by
Gauss-Newton steps — dynamics linearized by one vmapped reverse-mode sweep
per iteration, Riccati recursion as a reverse lax.scan, and a parallel-alpha
line search (every step size evaluated simultaneously under vmap, which is
the TPU-idiomatic replacement for CPU backtracking).

Two tasks:
  1. reach: drive the packaged torque-limited pendulum to a holdable angle
     (converges to the goal to ~2% in 12 iterations),
  2. swingup attempt: pump toward the unstable upright from a
     predictive-sampling warm start — sampler explores, iLQR polishes, the
     standard pairing. The pendulum's ctrlrange (+-2 vs mgl ~ 2.5) makes a
     single open-loop tape reach within ~0.5 rad of upright; closing the
     distance needs receding-horizon reoptimization (wrap `optimize` in a
     step loop) or the RL policy (examples/rl/pendulum/ex_swingup.py).

Run: PYTHONPATH=. python examples/trajopt/ex_ilqr.py
"""


# Allow running from a source checkout without pip install.
import os as _os, sys as _sys

_d = _os.path.dirname(_os.path.abspath(__file__))
while _d != "/" and not _os.path.isdir(_os.path.join(_d, "ambersim_tpu")):
    _d = _os.path.dirname(_d)
_sys.path.insert(0, _d)
import time

import jax
import jax.numpy as jnp
import numpy as np

from ambersim_tpu import ROOT
from ambersim_tpu.trajopt import (
    ILQR,
    ILQRParams,
    VanillaPredictiveSampler,
    VanillaPredictiveSamplerParams,
    shoot,
)
from ambersim_tpu.trajopt.base import CostFunction
from ambersim_tpu.utils.io_utils import load_model_from_file
from flax import struct

if __name__ == "__main__":
    model = load_model_from_file(f"{ROOT}/models/pendulum/pendulum.xml")

    # ---- task 1: reach a holdable angle --------------------------------
    goal = jnp.array([0.7, 0.0])

    def running(x, u):
        return 0.02 * (u @ u)

    def terminal(x):
        dx = x - goal
        return 100.0 * (dx @ dx)

    opt = ILQR(model=model, running_cost=running, terminal_cost=terminal, iterations=12)
    params = ILQRParams(x0=jnp.zeros(2), us_guess=jnp.zeros((50, 1)))

    t0 = time.perf_counter()
    xs, us = jax.jit(opt.optimize)(params)
    xs.block_until_ready()
    t1 = time.perf_counter()
    c0 = float(opt._traj_cost(shoot(model, params.x0, params.us_guess), params.us_guess))
    c1 = float(opt._traj_cost(xs, us))
    print(f"[reach]   cost {c0:8.2f} -> {c1:8.3f}   final angle {float(xs[-1, 0]):.3f} "
          f"(goal {float(goal[0]):.3f})   {t1 - t0:.1f}s incl. jit")

    # ---- task 2: swingup, sampler warm start + iLQR polish --------------
    up = jnp.array([jnp.pi, 0.0])

    def wrap(x):
        a = jnp.arctan2(jnp.sin(x[0] - up[0]), jnp.cos(x[0] - up[0]))
        return jnp.array([a, x[1]])

    def running_up(x, u):
        dx = wrap(x)
        return 0.2 * (dx @ dx) + 0.005 * (u @ u)

    def terminal_up(x):
        dx = wrap(x)
        return 300.0 * (dx @ dx)

    @struct.dataclass
    class WrapCost(CostFunction):
        def cost(self, xs, us):
            run = jax.vmap(lambda x, u: running_up(x, u))(xs[:-1], us).sum()
            return run + terminal_up(xs[-1])

    N = 150
    sp = VanillaPredictiveSamplerParams(
        x0=jnp.zeros(2), us_guess=jnp.zeros((N, 1)), rng=jax.random.PRNGKey(0)
    )
    # annealed exploration; fold the key each round so every batch draws
    # fresh noise around the improving tape
    for std in (0.6, 0.3, 0.12):
        sampler = VanillaPredictiveSampler(
            model=model, cost_function=WrapCost(), nsamples=512, stdev=std
        )
        sopt = jax.jit(sampler.optimize)
        for i in range(12):
            _, us_ws = sopt(sp)
            sp = sp.replace(us_guess=us_ws, rng=jax.random.fold_in(sp.rng, i))

    polish = ILQR(
        model=model, running_cost=running_up, terminal_cost=terminal_up, iterations=30
    )
    xs2, us2 = jax.jit(polish.optimize)(ILQRParams(x0=jnp.zeros(2), us_guess=sp.us_guess))
    cw = float(WrapCost().cost(shoot(model, sp.x0, sp.us_guess), sp.us_guess))
    cp = float(WrapCost().cost(xs2, us2))
    closest = float(jnp.min(jnp.abs(jax.vmap(wrap)(xs2)[:, 0])))
    print(f"[swingup] sampler warm-start cost {cw:8.2f} -> iLQR {cp:8.2f}   "
          f"closest approach to upright {closest:.3f} rad")
