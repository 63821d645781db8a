"""Subtractive fused-phase profiler for the quadruped benchmark step.

bench.py's per-phase table jits each phase separately, which adds a fixed
dispatch + Data-materialization cost per phase (~6 ms at batch 4096) and
says nothing about where time goes *inside* the fused step. This script
instead times full fused rollouts with pipeline stages progressively
enabled; consecutive differences attribute wall time within the real fused
context (XLA still fuses across the stage boundary, so attribution is
approximate but far closer than separate jits).

Usage: python benchmarks/profile_phases.py  [BENCH_NUM_ENVS=4096] [BENCH_NUM_STEPS=100]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ambersim_tpu.core.types import Data, IntegratorType, Model
from ambersim_tpu.engine import collision, constraint, integrate, smooth, solver
from ambersim_tpu.engine import make_data
from ambersim_tpu.utils.io_utils import load_model_from_file

NUM_ENVS = int(os.environ.get("BENCH_NUM_ENVS", 4096))
NUM_STEPS = int(os.environ.get("BENCH_NUM_STEPS", 100))

_CARRY = ("qpos", "qvel", "act", "qacc_warmstart", "time")


def _sync(x) -> float:
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0])


def step_upto(m: Model, d: Data, stage: str) -> Data:
    """Forward step truncated after `stage`; later stages replaced by the
    cheapest valid continuation so integration still runs."""
    d = smooth.fwd_position_smooth(m, d)
    if stage in ("collision", "constraint", "solver"):
        d = collision.collision(m, d)
    if stage in ("constraint", "solver"):
        d = constraint.make_constraint(m, d)
    d = smooth.fwd_velocity(m, d)
    d = smooth.fwd_actuation(m, d)
    d = smooth.fwd_acceleration(m, d)
    if stage == "solver" and m.skel.nefc:
        d = solver.solve(m, d)
    else:
        d = d.replace(qacc=d.qacc_smooth)
    if m.opt.integrator in (int(IntegratorType.IMPLICIT), int(IntegratorType.IMPLICITFAST)):
        return integrate.implicitfast(m, d)
    return integrate.euler(m, d)


def timed_rollout(m: Model, batch: Data, stage: str, kp=60.0, kd=2.0) -> float:
    nu = m.nu

    def one(dd: Data) -> Data:
        if nu and m.skel.nv == nu + 6:
            ctrl = kp * (jnp.zeros(nu) - dd.qpos[7:]) - kd * dd.qvel[6:]
            dd = dd.replace(ctrl=ctrl)
        return step_upto(m, dd, stage)

    stepper = jax.vmap(one)

    @jax.jit
    def roll(b: Data) -> Data:
        carry0 = tuple(getattr(b, f) for f in _CARRY)

        def body(carry, _):
            dd = b.replace(**dict(zip(_CARRY, carry)))
            dd = stepper(dd)
            return tuple(getattr(dd, f) for f in _CARRY), None

        carry, _ = jax.lax.scan(body, carry0, None, length=NUM_STEPS)
        return b.replace(**dict(zip(_CARRY, carry)))

    out = roll(batch)
    _sync(out.qpos)
    t0 = time.perf_counter()
    out = roll(batch)
    _sync(out.qpos)
    return time.perf_counter() - t0


def main():
    path = os.environ.get("BENCH_MODEL", "models/quadruped/quadruped.xml")
    cap = os.environ.get("BENCH_BROADPHASE_CAP")
    kwargs = {"broadphase_cap": int(cap)} if cap else {}
    model = load_model_from_file(path, **kwargs)
    d0 = make_data(model)
    nu = model.nu
    keys = jax.random.split(jax.random.PRNGKey(0), NUM_ENVS)
    if nu and model.skel.nv == nu + 6:
        batch = jax.vmap(
            lambda k: d0.replace(qpos=d0.qpos.at[7:].add(0.05 * jax.random.normal(k, (nu,))))
        )(keys)
    else:
        batch = jax.vmap(lambda k: d0)(keys)

    stages = ["smooth", "collision", "constraint", "solver"]
    prev = 0.0
    print(f"fused rollout wall time, batch {NUM_ENVS} x {NUM_STEPS} steps:")
    for st in stages:
        t = timed_rollout(model, batch, st)
        ms = 1e3 * t / NUM_STEPS
        print(f"  upto {st:10s} {ms:7.3f} ms/step   delta {ms - prev:+7.3f} ms")
        prev = ms
    sps = NUM_ENVS * NUM_STEPS / (prev / 1e3 * NUM_STEPS)
    print(f"  full-step throughput: {sps:,.0f} env steps/s")


if __name__ == "__main__":
    main()
