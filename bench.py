"""Benchmark: env steps/sec/chip for a 4096-env contact-rich quadruped
rollout + a short quadruped PPO training segment (both halves of the
BASELINE.json primary metric: "env steps/sec/chip ...; PPO wall-clock").

Prints JSON lines on stdout: the primary rollout metric first
({"metric", "value", "unit", "vs_baseline"}), then a PPO-training metric
line. Diagnostic detail (phase breakdown, roofline) goes to stderr.

vs_baseline derivation
----------------------
The reference publishes no numbers (BASELINE.md); the driver's north star is
>=5x MJX-on-A100 env steps/sec/chip for this workload. The 1.0x constant,
MJX_A100_QUADRUPED_STEPS_PER_SEC = 120_000, is derived from the public MJX
training benchmark most comparable to this workload: Google DeepMind's MJX
tutorial / MuJoCo-3 release materials report on the order of 1M env steps/s
for Barkour-class quadruped PPO training batched over an 8-accelerator A100
node, i.e. ~125k env steps/s per chip; we round down to 120k. Sensitivity:
public MJX numbers for quadruped-class models at batch >=4096 span roughly
60k-240k steps/s/chip depending on ncon/solver settings, so the true
multiplier for our measured value lies within 0.5x-2x of the reported
vs_baseline. The roofline figures on stderr give a baseline-free view of
absolute efficiency on this chip.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

MJX_A100_QUADRUPED_STEPS_PER_SEC = 120_000.0

# Nominal per-chip peaks for roofline context (TPU v5e: ~197 TFLOP/s bf16
# MXU, ~819 GB/s HBM). The physics step is fp32/VPU-heavy, so the HBM
# bandwidth roofline is the meaningful ceiling; MXU MFU is reported only
# for completeness.
TPU_V5E_PEAK_BF16_FLOPS = 197e12
TPU_V5E_PEAK_HBM_GBPS = 819.0

import os

NUM_ENVS = int(os.environ.get("BENCH_NUM_ENVS", 4096))
NUM_STEPS = int(os.environ.get("BENCH_NUM_STEPS", 100))

# PPO rung (VERDICT r2 #1): short quadruped PPO segment through the full
# rollout+GAE+update loop. Sizes mirror examples/rl/quadruped/ex_locomotion.py.
PPO_NUM_ENVS = int(os.environ.get("BENCH_PPO_NUM_ENVS", 4096))
PPO_TRAIN_STEPS = int(os.environ.get("BENCH_PPO_TRAIN_STEPS", 16))
PPO_UNROLL = int(os.environ.get("BENCH_PPO_UNROLL", 20))
PPO_EPISODE = int(os.environ.get("BENCH_PPO_EPISODE", 500))
PPO_EVAL_ENVS = int(os.environ.get("BENCH_PPO_EVAL_ENVS", 64))
PPO_SKIP = os.environ.get("BENCH_SKIP_PPO", "") == "1"


def _sync(x) -> float:
    """Force completion with a value readback (block_until_ready is not a
    reliable fence on the axon platform)."""
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0])


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

    def ctrl_fn(d):
        return kp * (jnp.zeros(nu) - d.qpos[7:]) - kd * d.qvel[6:]

    @jax.jit
    def rollout(batch):
        return engine_rollout(model, batch, NUM_STEPS, ctrl_fn=ctrl_fn, batched=True)

    batch = make_batch(NUM_ENVS)
    warm = rollout(batch)
    _sync(warm.qpos)

    t0 = time.perf_counter()
    out = rollout(warm)
    _sync(out.qpos)  # hard sync
    t1 = time.perf_counter()

    steps_per_sec = NUM_ENVS * NUM_STEPS / (t1 - t0)
    # the rollout runs unsharded on one device, so per-chip = total here;
    # multi-chip runs must shard the env axis (parallel.shard_batch) before
    # dividing by the device count
    value = steps_per_sec

    # ---- diagnostics (stderr only; stdout stays a single JSON line) ----
    try:
        _diagnostics(model, batch, warm, ctrl_fn, value, t1 - t0)
    except Exception as e:  # diagnostics must never break the metric
        print(f"[bench] diagnostics skipped: {type(e).__name__}: {e}", file=sys.stderr)

    # PPO training line first; the primary rollout metric stays the LAST
    # JSON line on stdout.
    if not PPO_SKIP:
        try:
            _ppo_rung()
        except Exception as e:  # the primary metric line must survive
            print(f"[bench] PPO rung failed: {type(e).__name__}: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "quadruped_4096env_steps_per_sec_per_chip",
                "value": round(value, 1),
                "unit": "env_steps/s/chip",
                "vs_baseline": round(value / MJX_A100_QUADRUPED_STEPS_PER_SEC, 3),
            }
        ),
        flush=True,
    )


def _ppo_rung():
    """Quadruped PPO training throughput: the 'PPO wall-clock' half of the
    BASELINE metric, measured through the full rollout+GAE+update loop
    (VERDICT r2 #1). Emits a second JSON line with steady-state training
    env-steps/s/chip; time-to-first-update (incl. jit) goes in the line too.

    Workload surface mirrors the reference PPO example
    (/root/reference/examples/rl/pendulum/ex_swingup.py:25-58) at the
    BASELINE config-4 scale (quadruped, 4096 envs)."""
    from ambersim_tpu.rl.ppo import train as ppo_train
    from ambersim_tpu.rl.quadruped import QuadrupedLocomotionEnv

    num_envs = PPO_NUM_ENVS
    unroll = PPO_UNROLL
    num_minibatches = 32
    batch_size = max(num_envs // 4, 8)  # num_unrolls = 8 at the default scale
    env_steps_per_training_step = (batch_size * num_minibatches // num_envs) * unroll * num_envs
    # three measured epochs after the jit epoch (median + spread, VERDICT r3
    # #7): each progress-to-progress window must hold MANY training steps,
    # because every epoch boundary costs a handful of host<->device
    # transfers (seconds each over a tunneled TPU — measured 20s/epoch of
    # pure overhead at 1 step/epoch, which undersold training throughput 4x)
    n_steps = PPO_TRAIN_STEPS

    marks = []  # (wall time, env step count) at each progress callback

    def progress(num_steps, metrics):
        marks.append((time.perf_counter(), num_steps))

    t_start = time.perf_counter()
    ppo_train(
        environment=QuadrupedLocomotionEnv(),
        num_timesteps=n_steps * env_steps_per_training_step,
        num_evals=5,  # init eval + jit epoch + three measured epochs
        episode_length=PPO_EPISODE,
        normalize_observations=True,
        unroll_length=unroll,
        num_minibatches=num_minibatches,
        num_updates_per_batch=4,
        discounting=0.97,
        learning_rate=3e-4,
        entropy_cost=1e-2,
        num_envs=num_envs,
        num_eval_envs=PPO_EVAL_ENVS,  # tiny: keep eval out of the throughput signal
        batch_size=batch_size,
        seed=0,
        progress_fn=progress,
    )
    # marks[0] is the pre-training eval; marks[1] ends epoch 1 (includes jit);
    # steady state is epoch 2..n.
    if len(marks) < 3:
        print(
            f"[bench] PPO rung: only {len(marks)} progress marks (need >= 3 for a "
            "steady-state window) — check BENCH_PPO_TRAIN_STEPS / num_evals overrides",
            file=sys.stderr,
        )
        return
    t_first_update = marks[1][0] - t_start
    # compile attribution for the first-update latency (VERDICT r3 #6):
    # marks[0] = backend init + env reset + pre-training eval (jit+run);
    # marks[1]-marks[0] = the epoch graph's jit + first epoch run. See
    # docs/ARCHITECTURE.md "PPO training throughput" for the trace-vs-
    # compile breakdown and why the persistent cache does not help here.
    print(
        f"[bench] PPO first-update attribution: init+reset+eval-jit "
        f"{marks[0][0] - t_start:.1f}s; epoch-jit+epoch1 {marks[1][0] - marks[0][0]:.1f}s",
        file=sys.stderr,
    )
    # per-epoch steady-state rates (epochs 2..n): median is the headline,
    # min/max spread quantifies run-to-run variance (VERDICT r3 #7)
    rates = []
    for (t0, s0), (t1, s1) in zip(marks[1:-1], marks[2:]):
        if t1 > t0:
            rates.append((s1 - s0) / (t1 - t0))
    rates.sort()
    median = rates[len(rates) // 2] if len(rates) % 2 else 0.5 * (
        rates[len(rates) // 2 - 1] + rates[len(rates) // 2]
    )
    print(
        f"[bench] PPO rung: {n_steps} training steps x {env_steps_per_training_step} env steps;"
        f" time to first update (jit+epoch1) {t_first_update:.1f}s;"
        f" steady-state median {median:,.0f} env steps/s over {len(rates)} epochs"
        f" (spread {rates[0]:,.0f}-{rates[-1]:,.0f})",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "quadruped_4096env_ppo_env_steps_per_sec_per_chip",
                "value": round(median, 1),
                "unit": "env_steps/s/chip",
                "vs_baseline": round(median / MJX_A100_QUADRUPED_STEPS_PER_SEC, 3),
                "time_to_first_update_s": round(t_first_update, 1),
                "median_of_epochs": len(rates),
                "spread": [round(rates[0], 1), round(rates[-1], 1)],
            }
        ),
        flush=True,
    )


def _diagnostics(model, batch, warm, ctrl_fn, steps_per_sec, rollout_s):
    """Phase breakdown + roofline for the benchmark step (VERDICT.md #6)."""
    import functools
    import importlib

    # engine/__init__ re-exports the `forward` *function*, which shadows the
    # submodule on attribute lookup — import the module explicitly
    F = importlib.import_module("ambersim_tpu.engine.forward")
    from ambersim_tpu.engine import collision as C
    from ambersim_tpu.engine import constraint as K
    from ambersim_tpu.engine import integrate as I
    from ambersim_tpu.engine import smooth as S
    from ambersim_tpu.engine import solver as V

    d = warm
    err = sys.stderr

    # -- roofline from XLA cost analysis of one fused batched step --
    @jax.jit
    def one_step(b):
        b = b.replace(ctrl=jax.vmap(ctrl_fn)(b))
        return jax.vmap(functools.partial(F.step, model))(b)

    flops = bytes_accessed = None
    try:
        cost = one_step.lower(batch).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = cost.get("flops")
        bytes_accessed = cost.get("bytes accessed")
    except Exception as e:
        print(f"[bench] cost_analysis unavailable: {type(e).__name__}: {e}", file=err)

    if flops:
        flops_per_env_step = flops / NUM_ENVS
        achieved_flops = steps_per_sec * flops_per_env_step
        print(
            f"[bench] XLA flops/step(batch): {flops:.3e}  "
            f"({flops_per_env_step:.0f}/env-step); achieved {achieved_flops / 1e12:.3f} TFLOP/s "
            f"= {100 * achieved_flops / TPU_V5E_PEAK_BF16_FLOPS:.2f}% of v5e bf16 MXU peak "
            f"(fp32/VPU workload; MXU MFU is a loose lower bound)",
            file=err,
        )
    if bytes_accessed:
        bytes_per_env_step = bytes_accessed / NUM_ENVS
        achieved_gbps = steps_per_sec * bytes_per_env_step / 1e9
        print(
            f"[bench] XLA bytes/step(batch): {bytes_accessed:.3e}  "
            f"({bytes_per_env_step:.0f}/env-step); achieved {achieved_gbps:.1f} GB/s "
            f"= {100 * achieved_gbps / TPU_V5E_PEAK_HBM_GBPS:.1f}% of v5e HBM peak "
            f"(upper bound: cost model counts HBM+on-chip traffic)",
            file=err,
        )

    # -- measured-traffic accounting (VERDICT r2 #7, corrected r4): the
    # rollout's scan carry is the MINIMAL field set (engine/rollout.py
    # _CARRY_FIELDS: qpos/qvel/act/qacc_warmstart/time — the VERDICT r3 #10
    # audit: every other Data leaf is derived and recomputed by step(), so
    # nothing else rides the carry). The full Data pytree is reported too:
    # its derived buffers (efc rows, contacts, mass matrices) are produced
    # and consumed WITHIN a step, and at batch 4096 they exceed VMEM, so
    # they bound intermediate HBM traffic — but XLA fusion decides how much
    # actually moves; the cost-model bytes above are the honest estimate.
    from ambersim_tpu.engine.rollout import _CARRY_FIELDS

    carry_bytes = sum(
        getattr(warm, f).size * getattr(warm, f).dtype.itemsize for f in _CARRY_FIELDS
    )
    data_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(warm))
    batch_steps_per_sec = steps_per_sec / NUM_ENVS
    floor_gbps = batch_steps_per_sec * 2 * carry_bytes / 1e9
    print(
        f"[bench] scan carry (minimal fields) = {carry_bytes / 1e6:.2f} MB/batch "
        f"({carry_bytes / NUM_ENVS:.0f} B/env) => carry floor {floor_gbps:.1f} GB/s "
        f"({100 * floor_gbps / TPU_V5E_PEAK_HBM_GBPS:.2f}% of v5e HBM peak); "
        f"full Data pytree = {data_bytes / 1e6:.1f} MB/batch "
        f"({data_bytes / NUM_ENVS:.0f} B/env) of in-step intermediates",
        file=err,
    )

    # -- in-graph attribution of the REAL fused rollout (VERDICT r3 #9):
    # per-op HLO self time from the device profiler, rolled up by category
    # and source module. This is the attribution that holds — separate-jit
    # phase timings measure dispatch, not the fused step (they summed to
    # 27x the fused step time).
    try:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from benchmarks.hlo_stats import profile_rows, rollup

        @jax.jit
        def profiled(b):
            from ambersim_tpu.engine.rollout import rollout as _roll

            return _roll(model, b, 20, ctrl_fn=ctrl_fn, batched=True)

        rows = profile_rows(lambda: profiled(warm), lambda o: _sync(o.qpos))
        total_us = sum(r[0] for r in rows)
        fused_ms = 1e3 * NUM_ENVS / steps_per_sec
        print(
            f"[bench] in-graph attribution (hlo_stats, 20-step fused rollout; "
            f"device self time {total_us / 20 / 1e3:.2f} ms/step vs wall "
            f"{fused_ms:.2f} ms/step):",
            file=err,
        )
        print("[bench]   by source module:", file=err)
        for f, t in rollup(rows, 3)[:8]:
            print(
                f"[bench]   {t / 20:8.1f} us/step  {100 * t / total_us:5.1f}%  {f}",
                file=err,
            )
        print("[bench]   by op category:", file=err)
        for cat, t in rollup(rows, 1)[:6]:
            print(
                f"[bench]   {t / 20:8.1f} us/step  {100 * t / total_us:5.1f}%  {cat}",
                file=err,
            )
    except Exception as e:
        print(f"[bench] in-graph attribution unavailable: {type(e).__name__}: {e}", file=err)


if __name__ == "__main__":
    main()
