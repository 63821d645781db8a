"""Humanoid-balance PPO convergence run (VERDICT r4 #4).

Trains BASELINE config 5's contact-rich humanoid balance task to a
plateau on the real chip and records the eval-reward curve with ceiling
context, so the ladder's throughput rung is backed by a demonstrated
learning result (the quadruped's convergence story, reproduced here).

Ceiling: per-step reward tops out at alive_bonus (1.0) + upright (1.0)
minus small still/pose shaping; with episode_length=300 a policy that
stands the whole episode scores ~<=600, in practice ~520-580 after
shaping. A random policy falls in a few steps (reward ~10-30).

Run: python benchmarks/humanoid_converge.py [num_timesteps=40_000_000]
Writes HUMANOID_PPO_r{N}.json (N from LADDER_ROUND, default 05).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    from ambersim_tpu.rl.humanoid import HumanoidBalanceEnv
    from ambersim_tpu.rl.ppo import train as ppo_train

    total = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
    n_envs, unroll, mb = 1024, 20, 16
    curve = []
    t0 = time.perf_counter()

    def progress(num_steps, metrics):
        r = float(metrics.get("eval/episode_reward", 0.0))
        curve.append({"env_steps": int(num_steps), "wall_s": round(time.perf_counter() - t0, 1),
                      "eval_reward": round(r, 2)})
        print(f"[humanoid] {num_steps:>12,d} steps  {curve[-1]['wall_s']:7.1f}s  reward {r:8.2f}",
              flush=True)

    ppo_train(
        environment=HumanoidBalanceEnv(),
        num_timesteps=total,
        num_evals=12,
        episode_length=300,
        normalize_observations=True,
        unroll_length=unroll,
        num_minibatches=mb,
        num_updates_per_batch=4,
        discounting=0.97,
        learning_rate=3e-4,
        entropy_cost=1e-2,
        num_envs=n_envs,
        num_eval_envs=256,
        batch_size=n_envs // mb,
        seed=0,
        progress_fn=progress,
    )
    wall = time.perf_counter() - t0
    out = {
        "task": "humanoid_balance (BASELINE config 5 contact-rich PPO)",
        "num_timesteps": total,
        "episode_length": 300,
        "reward_ceiling_note": "~600 upper bound (alive 1.0 + upright 1.0 per step x 300); "
        "~520-580 achievable after still/pose shaping; random policy ~10-30",
        "final_eval_reward": curve[-1]["eval_reward"] if curve else None,
        "wall_clock_s": round(wall, 1),
        "curve": curve,
        "jax": jax.__version__,
        "device": str(jax.devices()[0]),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"HUMANOID_PPO_r{os.environ.get('LADDER_ROUND', '05')}.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[humanoid] wrote {path}")


if __name__ == "__main__":
    main()
