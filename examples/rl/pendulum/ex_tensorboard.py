"""PPO training with TensorBoard progress logging
(reference: examples/rl/pendulum/ex_tensorboard.py).

View with: tensorboard --logdir /tmp/ambersim_tpu_tb
"""


# Allow running from a source checkout without pip install.
import os as _os, sys as _sys

_d = _os.path.dirname(_os.path.abspath(__file__))
while _d != "/" and not _os.path.isdir(_os.path.join(_d, "ambersim_tpu")):
    _d = _os.path.dirname(_d)
_sys.path.insert(0, _d)
import functools

import jax

from ambersim_tpu.rl.pendulum import PendulumSwingupEnv
from ambersim_tpu.rl.ppo import train as ppo_train

if __name__ == "__main__":
    from torch.utils.tensorboard import SummaryWriter

    logdir = "/tmp/ambersim_tpu_tb"
    writer = SummaryWriter(logdir)

    def progress(num_steps, metrics):
        # cast device arrays to float before logging (reference ex_tensorboard.py:56-67)
        for key, value in metrics.items():
            writer.add_scalar(key, float(value), num_steps)
        print(f"step {num_steps}: {metrics.get('eval/episode_reward', float('nan')):.2f}")

    train_fn = functools.partial(
        ppo_train,
        num_timesteps=500_000,
        num_evals=5,
        reward_scaling=0.1,
        episode_length=200,
        normalize_observations=True,
        unroll_length=10,
        num_minibatches=16,
        num_updates_per_batch=4,
        discounting=0.96,
        learning_rate=3e-4,
        entropy_cost=1e-3,
        num_envs=512,
        batch_size=320,
        seed=0,
    )
    make_policy, params, metrics = train_fn(environment=PendulumSwingupEnv(), progress_fn=progress)
    writer.close()
    print(f"done; logs in {logdir}")
