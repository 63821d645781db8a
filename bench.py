"""Benchmark: env steps/sec/chip for a 4096-env contact-rich quadruped
rollout (BASELINE.json primary metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md); the driver's
north star is >=5x MJX-on-A100 env steps/sec/chip for this workload. We use
a documented MJX-A100 estimate of 120k steps/s/chip for a Unitree-class
quadruped (order of magnitude from public MJX batch-sim benchmarks) as the
1.0x baseline, so vs_baseline >= 5.0 meets the north star.
"""

import json
import time

import jax
import jax.numpy as jnp

MJX_A100_QUADRUPED_STEPS_PER_SEC = 120_000.0

NUM_ENVS = 4096
NUM_STEPS = 100


def main():
    from ambersim_tpu.engine import make_data, step
    from ambersim_tpu.utils.io_utils import load_model_from_file

    model = load_model_from_file("models/quadruped/quadruped.xml")
    nu = model.nu

    # PD standing controller: contact-rich steady state (all 4 feet loaded)
    kp, kd = 60.0, 2.0

    def make_batch(n):
        d0 = make_data(model)
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        return jax.vmap(
            lambda k: d0.replace(qpos=d0.qpos.at[7:].add(0.05 * jax.random.normal(k, (nu,))))
        )(keys)

    from ambersim_tpu.engine.rollout import rollout as engine_rollout

    @jax.jit
    def rollout(batch):
        def ctrl_fn(d):
            return kp * (jnp.zeros(nu) - d.qpos[7:]) - kd * d.qvel[6:]

        return engine_rollout(model, batch, NUM_STEPS, ctrl_fn=ctrl_fn, batched=True)

    batch = make_batch(NUM_ENVS)
    # compile + warmup. NOTE (axon platform): block_until_ready is not a
    # reliable fence — force completion with a value readback, and time a
    # call whose input differs from the warmup's.
    warm = rollout(batch)
    float(warm.qpos[0, 2])

    t0 = time.perf_counter()
    out = rollout(warm)
    float(out.qpos[0, 2])  # hard sync
    t1 = time.perf_counter()

    steps_per_sec = NUM_ENVS * NUM_STEPS / (t1 - t0)
    # the rollout runs unsharded on one device, so per-chip = total here;
    # multi-chip runs must shard the env axis (parallel.shard_batch) before
    # dividing by the device count
    value = steps_per_sec
    print(
        json.dumps(
            {
                "metric": "quadruped_4096env_steps_per_sec_per_chip",
                "value": round(value, 1),
                "unit": "env_steps/s/chip",
                "vs_baseline": round(value / MJX_A100_QUADRUPED_STEPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
