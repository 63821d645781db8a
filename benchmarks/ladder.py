"""BASELINE.md benchmark ladder — self-measured (the reference publishes no
numbers; configs from BASELINE.json):

1. pendulum, 1000-step rollout, batch 1 (CPU-class config, run on device)
2. cart-pole + 3-link arm, batch 1024, frictionless contacts
3. object-drop contact-rich scene, batch 2048
4. quadruped PD-stand, batch 4096 (the headline metric; also in bench.py)
5. humanoid contact-rich PD, batch 1024 + predictive-sampling trajopt

Prints one JSON line per rung. Timing uses chained inputs + value-readback
sync (see .claude/skills/verify/SKILL.md for why).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ambersim_tpu.engine import make_data, step
from ambersim_tpu.utils.io_utils import load_model_from_file


def _time_rollout(model, batch, nsteps, ctrl_fn=None, settle=0):
    from ambersim_tpu.engine.rollout import rollout as engine_rollout

    @jax.jit
    def roll(b):
        return engine_rollout(model, b, nsteps, ctrl_fn=ctrl_fn, batched=b.qpos.ndim > 1)

    if settle:
        # drop scenes spend their first few hundred steps mostly in flight;
        # settling first makes the timed window fully contact-rich (the
        # honest, harder workload — round 5 change, so clutter/drop numbers
        # are not comparable with rounds <= 4)
        batch = jax.jit(
            lambda b: engine_rollout(model, b, settle, ctrl_fn=ctrl_fn, batched=b.qpos.ndim > 1)
        )(batch)
    warm = roll(batch)
    float(warm.qpos.reshape(-1)[0])
    t0 = time.perf_counter()
    out = roll(warm)
    float(out.qpos.reshape(-1)[0])
    dt = time.perf_counter() - t0
    n_envs = 1 if batch.qpos.ndim == 1 else batch.qpos.shape[0]
    return n_envs * nsteps / dt


def _batch(model, n):
    d0 = make_data(model)
    if n == 1:
        return d0
    return jax.jit(jax.vmap(lambda i: d0))(jnp.arange(n))


_RECORDS = []  # every emitted line, written to the LADDER_rN.json artifact


def emit(name, value, unit="env_steps/s"):
    rec = {"metric": name, "value": round(value, 1), "unit": unit}
    _RECORDS.append(rec)
    print(json.dumps(rec), flush=True)


def write_artifact():
    """Check-in-able artifact: every README perf number traces to a dated
    run (VERDICT r4 #5). Path override via LADDER_OUT."""
    import datetime

    import mujoco

    out = os.environ.get("LADDER_OUT") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"LADDER_r{os.environ.get('LADDER_ROUND', '05')}.json",
    )
    payload = {
        "timestamp_utc": datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds"),
        "jax": jax.__version__,
        "mujoco": mujoco.__version__,
        "backend": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "records": _RECORDS,
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"[ladder] artifact written: {out}", file=sys.stderr)


def main():
    # rung 1: single pendulum 1000-step rollout
    m = load_model_from_file("models/pendulum/pendulum.xml")
    emit("pendulum_single_rollout", _time_rollout(m, _batch(m, 1), 1000))

    # rung 2: cartpole + arm3 batch 1024
    m = load_model_from_file("models/cartpole/cartpole.xml")
    emit("cartpole_1024env", _time_rollout(m, _batch(m, 1024), 200))
    m = load_model_from_file("models/arm3/arm3.xml")
    emit("arm3_1024env_frictionless", _time_rollout(m, _batch(m, 1024), 200))

    # rung 3: contact-rich drop, batch 2048
    m = load_model_from_file("models/objects/drop_scene.xml")
    emit("drop_scene_2048env", _time_rollout(m, _batch(m, 2048), 150, settle=300))

    # rung 3a: dense-mesh rock drop — a 320-vert scanned-rock hull budgeted
    # to 64 verts at compile (maxhullvert), so SAT narrowphase cost on dense
    # meshes is measured, not just untested (VERDICT r2 #3)
    m = load_model_from_file("models/rock/rock_scene.xml")
    emit("rock_drop_2048env", _time_rollout(m, _batch(m, 2048), 150, settle=300))

    # rung 3b: 32-object clutter (496 object-object candidate pairs) with
    # top-k broadphase vs exact all-pairs — the sublinear-stepping claim
    # (tests/test_broadphase.py pins correctness; this pins wall-clock).
    # Batch 256 for all clutter rungs: the nv=192 solve is compute-bound well
    # below that, and at batch 1024 the Newton working set (J alone is
    # 1.8 GB) plus the chunked-linalg relayout copies exhaust HBM.
    m_cap = load_model_from_file("models/objects/clutter32.xml", broadphase_cap=48)
    capped_256 = _time_rollout(m_cap, _batch(m_cap, 256), 100, settle=400)
    emit("clutter32_256env_broadphase_cap48", capped_256)
    m_all = load_model_from_file("models/objects/clutter32.xml")
    exact = _time_rollout(m_all, _batch(m_all, 256), 100, settle=400)
    emit("clutter32_256env_exact_allpairs", exact)
    emit("clutter32_broadphase_speedup", capped_256 / max(exact, 1e-9), unit="x")

    # rung 3c: clutter with the max_contact_points row cap on top — the
    # documented large-nv levers together (Pallas linalg at nv=192 + deepest-
    # 192-slot compaction; parity pinned by tests/test_clutter_cap.py)
    import os as _os

    _cl = os.path.join("ambersim_tpu", "models", "objects", "clutter32.xml")
    xml_cap = open(_cl).read().replace(
        "</mujoco>",
        '<custom><numeric name="max_contact_points" data="192"/></custom></mujoco>',
    )
    from ambersim_tpu.engine.setconst import set_constants as _setc
    from ambersim_tpu.mjcf import compile_spec as _cs
    from ambersim_tpu.mjcf.parser import parse_mjcf_string as _ps

    m_rc = _setc(_cs(_ps(xml_cap, base_dir=_os.path.dirname(_cl)), broadphase_cap=48))
    emit("clutter32_256env_rowcap192", _time_rollout(m_rc, _batch(m_rc, 256), 100, settle=400))

    # rung 3d: same, with the opt-in bf16 Newton Hessian assembly
    # (Option.hessian_bf16; accuracy evidence in benchmarks/clutter_bf16_ab.py)
    m_rb = m_rc.replace(opt=m_rc.opt.replace(hessian_bf16=True))
    emit("clutter32_256env_rowcap192_bf16H", _time_rollout(m_rb, _batch(m_rb, 256), 100, settle=400))

    # rung 4: quadruped PD stand, batch 4096
    m = load_model_from_file("models/quadruped/quadruped.xml")
    pd = lambda d: 60.0 * (0.0 - d.qpos[7:]) - 2.0 * d.qvel[6:]  # noqa: E731
    emit("quadruped_4096env", _time_rollout(m, _batch(m, 4096), 100, pd))

    # rung 5: humanoid PD, batch 1024 + trajopt
    m = load_model_from_file("models/humanoid/humanoid.xml")
    pd_h = lambda d: jnp.clip(200.0 * (0.0 - d.qpos[7:]) - 10.0 * d.qvel[6:], -100, 100)  # noqa: E731
    emit("humanoid_1024env", _time_rollout(m, _batch(m, 1024), 100, pd_h))

    # humanoid predictive sampling (64 samples x 8 knots)
    from ambersim_tpu.trajopt import (
        StaticGoalQuadraticCost,
        VanillaPredictiveSampler,
        VanillaPredictiveSamplerParams,
    )

    nx = m.nq + m.nv
    cost = StaticGoalQuadraticCost(
        Q=0.1 * jnp.eye(nx), Qf=10.0 * jnp.eye(nx), R=1e-4 * jnp.eye(m.nu),
        xg=jnp.concatenate([jnp.asarray(m.qpos0), jnp.zeros(m.nv)]),
    )
    ps = VanillaPredictiveSampler(model=m, cost_function=cost, nsamples=64, stdev=0.2)
    params = VanillaPredictiveSamplerParams(
        x0=jnp.concatenate([jnp.asarray(m.qpos0), jnp.zeros(m.nv)]),
        us_guess=jnp.zeros((8, m.nu)),
        rng=jax.random.PRNGKey(0),
    )
    opt = jax.jit(ps.optimize)
    xs, us = opt(params)
    float(xs[0, 0])
    t0 = time.perf_counter()
    xs, us = opt(params.replace(rng=jax.random.PRNGKey(1)))
    float(xs[0, 0])
    emit("humanoid_predictive_sampling_64x8", 1.0 / (time.perf_counter() - t0), unit="solves/s")

    # rung 5b: humanoid-balance PPO training (BASELINE config 5's
    # "contact-rich PPO" half, VERDICT r3 #4): steady-state training
    # env-steps/s through the full rollout+GAE+update loop, plus the eval
    # reward reached and total wall clock.
    if _os.environ.get("LADDER_SKIP_PPO", "") != "1":
        from ambersim_tpu.rl.humanoid import HumanoidBalanceEnv
        from ambersim_tpu.rl.ppo import train as ppo_train

        n_envs, unroll, mb = 1024, 20, 16
        env_steps_per_training_step = n_envs * unroll  # num_unrolls = 1
        n_steps = int(_os.environ.get("LADDER_PPO_TRAIN_STEPS", 24))
        marks = []

        def progress(num_steps, metrics):
            marks.append((time.perf_counter(), num_steps, metrics.get("eval/episode_reward", 0.0)))

        t0 = time.perf_counter()
        ppo_train(
            environment=HumanoidBalanceEnv(),
            num_timesteps=n_steps * env_steps_per_training_step,
            num_evals=4,
            episode_length=300,
            normalize_observations=True,
            unroll_length=unroll,
            num_minibatches=mb,
            num_updates_per_batch=4,
            discounting=0.97,
            learning_rate=3e-4,
            entropy_cost=1e-2,
            num_envs=n_envs,
            num_eval_envs=64,
            batch_size=n_envs // mb,
            seed=0,
            progress_fn=progress,
        )
        wall = time.perf_counter() - t0
        if len(marks) >= 3:
            dt = marks[-1][0] - marks[1][0]
            steps = marks[-1][1] - marks[1][1]
            emit("humanoid_balance_1024env_ppo", steps / max(dt, 1e-9))
            rec = {
                "metric": "humanoid_balance_ppo_detail",
                "eval_reward_final": round(float(marks[-1][2]), 2),
                "wall_clock_s": round(wall, 1),
                "train_steps": n_steps,
                "unit": "detail",
            }
            _RECORDS.append(rec)
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    try:
        main()
    finally:
        write_artifact()
