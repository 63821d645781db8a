"""Humanoid balance PPO at 2048 envs (BASELINE.md config 5: contact-rich
bipedal humanoid PPO). The policy learns to hold the stand pose and recover
from randomized initial pose/velocity perturbations; the task's reward
ceiling is ~alive_bonus + upright (~2.0 per control step, 1000 with
episode_length=500) minus small shaping penalties."""


# Allow running from a source checkout without pip install.
import os as _os, sys as _sys

_d = _os.path.dirname(_os.path.abspath(__file__))
while _d != "/" and not _os.path.isdir(_os.path.join(_d, "ambersim_tpu")):
    _d = _os.path.dirname(_d)
_sys.path.insert(0, _d)
import sys
import time

from ambersim_tpu.rl.humanoid import HumanoidBalanceEnv
from ambersim_tpu.rl.ppo import train as ppo_train

if __name__ == "__main__":
    num_timesteps = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    env = HumanoidBalanceEnv()
    times = [time.time()]

    def progress(num_steps, metrics):
        times.append(time.time())
        print(f"step {num_steps}: eval reward {metrics['eval/episode_reward']:.1f}", flush=True)

    make_policy, params, metrics = ppo_train(
        environment=env,
        num_timesteps=num_timesteps,
        num_evals=10,
        reward_scaling=1.0,
        episode_length=500,
        normalize_observations=True,
        unroll_length=20,
        num_minibatches=32,
        num_updates_per_batch=4,
        discounting=0.97,
        learning_rate=3e-4,
        entropy_cost=1e-2,
        num_envs=2048,
        num_eval_envs=512,
        batch_size=512,
        seed=0,
        progress_fn=progress,
    )
    print(f"time to jit: {times[1] - times[0]:.0f}s; train: {times[-1] - times[1]:.0f}s")
