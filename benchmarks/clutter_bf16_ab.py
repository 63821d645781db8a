"""A/B the opt-in bf16 Newton Hessian on the clutter32 rowcap rung
(VERDICT r4 #2): throughput f32 vs bf16-H, plus accuracy evidence —
relative Hessian error and end-to-end trajectory divergence vs the f32
solve on identical states.

Run on the real chip: python benchmarks/clutter_bf16_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ambersim_tpu.engine import make_data
from ambersim_tpu.engine.rollout import rollout as engine_rollout
from ambersim_tpu.engine.setconst import set_constants
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string


def _load_rowcap(hessian_bf16):
    cl = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "ambersim_tpu", "models", "objects", "clutter32.xml")
    xml = open(cl).read().replace(
        "</mujoco>",
        '<custom><numeric name="max_contact_points" data="192"/></custom></mujoco>',
    )
    m = set_constants(compile_spec(parse_mjcf_string(xml, base_dir=os.path.dirname(cl)),
                                   broadphase_cap=48))
    if hessian_bf16:
        m = m.replace(opt=m.opt.replace(hessian_bf16=True))
    return m


def _rate(m, batch, nsteps=100):
    @jax.jit
    def roll(b):
        return engine_rollout(m, b, nsteps, batched=True)

    warm = roll(batch)
    float(warm.qpos.reshape(-1)[0])
    t0 = time.perf_counter()
    out = roll(warm)
    float(out.qpos.reshape(-1)[0])
    dt = time.perf_counter() - t0
    return batch.qpos.shape[0] * nsteps / dt, out


def main():
    B = 256
    m32 = _load_rowcap(False)
    m16 = _load_rowcap(True)
    d0 = make_data(m32)
    batch = jax.jit(jax.vmap(lambda i: d0))(jnp.arange(B))
    # settle 400 steps first: the drop scene is mostly in flight before
    # that (qfrc_constraint == 0 -> h_diag == 0 -> the Hessian product is
    # zero both ways), so an unsettled A/B measures free-fall, not the solve
    batch = jax.jit(lambda b: engine_rollout(m32, b, 400, batched=True))(batch)
    float(batch.qpos.reshape(-1)[0])

    r32, out32 = _rate(m32, batch)
    r16, out16 = _rate(m16, batch)
    # divergence on identical 100-step trajectories from the settled state
    @jax.jit
    def roll_pair(b):
        return (engine_rollout(m32, b, 100, batched=True).qpos,
                engine_rollout(m16, b, 100, batched=True).qpos)

    q32, q16 = roll_pair(batch)
    div = float(jnp.abs(q32 - q16).max())
    res = {
        "metric": "clutter32_rowcap192_bf16_hessian_ab",
        "f32_env_steps_per_s": round(r32, 1),
        "bf16H_env_steps_per_s": round(r16, 1),
        "speedup": round(r16 / r32, 3),
        "qpos_divergence_100steps_settled": div,
        "unit": "env_steps/s",
    }
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
