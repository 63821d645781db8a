"""Train a swingup policy that is robust to pendulum mass and damping it has
never seen exactly: domain randomization via the trainer's randomization_fn
hook (role of brax ppo.train's randomization_fn; cf. reference trainer surface
at /root/reference/examples/rl/pendulum/ex_swingup.py:25-43).

Every parallel env simulates its own Model: `randomization_fn` returns the
base Model with the randomized numeric leaves replaced by (num_envs, ...)
batched arrays, plus an in_axes Model marking them with 0. One compilation
covers the whole randomized population.
"""


# Allow running from a source checkout without pip install.
import os as _os, sys as _sys

_d = _os.path.dirname(_os.path.abspath(__file__))
while _d != "/" and not _os.path.isdir(_os.path.join(_d, "ambersim_tpu")):
    _d = _os.path.dirname(_d)
_sys.path.insert(0, _d)
import functools

import jax
import jax.numpy as jnp

from ambersim_tpu.rl.pendulum import PendulumSwingupConfig, PendulumSwingupEnv
from ambersim_tpu.rl.ppo import train as ppo_train


def randomize_pendulum(model, rng):
    """Per-env body mass x U[0.7, 1.5] and joint damping U[0.0, 0.15]."""
    keys = rng  # (n, 2) key batch bound by the trainer
    n = keys.shape[0]
    mass_scale = 0.7 + 0.8 * jax.vmap(jax.random.uniform)(keys)
    damping = 0.15 * jax.vmap(lambda k: jax.random.uniform(jax.random.fold_in(k, 1)))(keys)
    model_v = model.replace(
        body_mass=jnp.asarray(model.body_mass) * mass_scale[:, None],
        dof_damping=jnp.broadcast_to(damping[:, None], (n,) + jnp.shape(model.dof_damping)),
    )
    in_axes = jax.tree.map(lambda _: None, model).replace(body_mass=0, dof_damping=0)
    return model_v, in_axes


if __name__ == "__main__":
    env = PendulumSwingupEnv(PendulumSwingupConfig(physics_steps_per_control_step=2))

    train_fn = functools.partial(
        ppo_train,
        num_timesteps=20_000_000,
        num_evals=10,
        reward_scaling=0.05,
        episode_length=200,
        normalize_observations=True,
        unroll_length=20,
        num_minibatches=32,
        num_updates_per_batch=8,
        discounting=0.985,
        learning_rate=3e-4,
        entropy_cost=3e-3,
        num_envs=1024,
        batch_size=512,
        seed=2,
        randomization_fn=randomize_pendulum,
    )

    def progress(step, metrics):
        print(f"  step {step:>12,}  eval reward {metrics['eval/episode_reward']:8.1f}")

    make_policy, params, metrics = train_fn(environment=env, progress_fn=progress)
    print(f"final randomized-dynamics eval reward: {metrics['eval/episode_reward']:.1f}")
