"""Train PPO on pendulum swingup, then report the learned policy's reward.

Mirrors the reference example examples/rl/pendulum/ex_swingup.py:25-92
(same hyperparameter surface; viewer rollout replaced by a headless eval).
"""


# Allow running from a source checkout without pip install.
import os as _os, sys as _sys

_d = _os.path.dirname(_os.path.abspath(__file__))
while _d != "/" and not _os.path.isdir(_os.path.join(_d, "ambersim_tpu")):
    _d = _os.path.dirname(_d)
_sys.path.insert(0, _d)
import functools
import time

import jax
import jax.numpy as jnp

from ambersim_tpu.rl.pendulum import PendulumSwingupConfig, PendulumSwingupEnv
from ambersim_tpu.rl.ppo import train as ppo_train

if __name__ == "__main__":
    # 2 physics substeps per control (25 Hz actions) makes the torque-limited
    # swingup's credit assignment tractable; reaches ~-280/episode in ~6 min
    # on one v5e chip (scripted energy-shaping expert: ~-190..-370 depending
    # on the initial state distribution)
    env = PendulumSwingupEnv(PendulumSwingupConfig(physics_steps_per_control_step=2))

    train_fn = functools.partial(
        ppo_train,
        num_timesteps=20_000_000,
        num_evals=10,
        reward_scaling=0.05,
        episode_length=200,
        normalize_observations=True,
        action_repeat=1,
        unroll_length=20,
        num_minibatches=32,
        num_updates_per_batch=8,
        discounting=0.985,
        learning_rate=3e-4,
        entropy_cost=3e-3,
        num_envs=1024,
        batch_size=512,
        seed=2,
    )

    times = [time.time()]

    def progress(num_steps, metrics):
        times.append(time.time())
        print(f"step {num_steps}: eval/episode_reward = {metrics['eval/episode_reward']:.2f}", flush=True)

    make_policy, params, metrics = train_fn(environment=env, progress_fn=progress)
    print(f"time to jit: {times[1] - times[0]:.1f}s")
    print(f"time to train: {times[-1] - times[1]:.1f}s")
    print(f"final eval reward: {metrics['eval/episode_reward']:.2f}")
