"""Train pendulum swingup with each training stack — PPO, SAC, ES, ARS,
APG — through the shared (make_policy, params, metrics) / progress_fn
contract.

The reference pins this contract for PPO (examples/rl/pendulum/
ex_swingup.py:55-58); the other agents are the rest of the brax.training
family rebuilt TPU-native. Budgets here are demo-sized: enough to see every
stack learn, not to converge. Run with an agent name to train just one:

    python ex_agents.py sac
"""

# Allow running from a source checkout without pip install.
import os as _os, sys as _sys

_d = _os.path.dirname(_os.path.abspath(__file__))
while _d != "/" and not _os.path.isdir(_os.path.join(_d, "ambersim_tpu")):
    _d = _os.path.dirname(_d)
_sys.path.insert(0, _d)

import functools
import sys
import time

from ambersim_tpu.rl.pendulum import PendulumSwingupConfig, PendulumSwingupEnv
from ambersim_tpu.rl import apg, ars, es, ppo, sac

AGENTS = {
    "ppo": functools.partial(
        ppo.train,
        num_timesteps=500_000,
        num_evals=5,
        episode_length=200,
        normalize_observations=True,
        unroll_length=10,
        num_minibatches=8,
        num_updates_per_batch=4,
        discounting=0.97,
        learning_rate=3e-4,
        entropy_cost=1e-3,
        num_envs=512,
        batch_size=640,
        reward_scaling=0.1,
    ),
    "sac": functools.partial(
        sac.train,
        num_timesteps=120_000,
        num_evals=5,
        episode_length=200,
        normalize_observations=True,
        num_envs=64,
        batch_size=256,
        min_replay_size=2_048,
        max_replay_size=262_144,
        grad_updates_per_step=4,
        discounting=0.97,
        learning_rate=6e-4,
        reward_scaling=0.1,
    ),
    "es": functools.partial(
        es.train,
        episode_length=200,
        population_size=256,
        perturbation_std=0.08,
        learning_rate=0.02,
        policy_updates=120,
        num_evals=5,
    ),
    "ars": functools.partial(
        ars.train,
        episode_length=200,
        number_of_directions=64,
        top_directions=16,
        step_size=0.015,
        exploration_noise_std=0.04,
        policy_updates=120,
        num_evals=5,
        normalize_observations=True,
    ),
    "apg": functools.partial(
        apg.train,
        episode_length=200,
        num_envs=64,
        policy_updates=60,
        learning_rate=2e-3,
        max_gradient_norm=1.0,
        num_evals=5,
    ),
}

if __name__ == "__main__":
    wanted = sys.argv[1:] or list(AGENTS)
    env = PendulumSwingupEnv(PendulumSwingupConfig(physics_steps_per_control_step=2))
    for name in wanted:
        t0 = time.time()

        def progress(step, metrics, name=name, t0=t0):
            print(
                f"[{name}] {time.time() - t0:6.1f}s  step {step:>9,}  "
                f"eval reward {metrics['eval/episode_reward']:8.1f}"
            )

        print(f"=== {name.upper()} ===")
        AGENTS[name](environment=env, seed=0, progress_fn=progress)
