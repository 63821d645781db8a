"""Custom-architecture PPO + pickle save/load + deterministic inference
(reference: examples/rl/pendulum/ex_save_and_load.py:25-153)."""


# Allow running from a source checkout without pip install.
import os as _os, sys as _sys

_d = _os.path.dirname(_os.path.abspath(__file__))
while _d != "/" and not _os.path.isdir(_os.path.join(_d, "ambersim_tpu")):
    _d = _os.path.dirname(_d)
_sys.path.insert(0, _d)
import functools
import pickle
import sys
import tempfile

import jax
import jax.numpy as jnp

from ambersim_tpu.io import load_params, save_params
from ambersim_tpu.learning import MLP
from ambersim_tpu.rl.helpers import PPONetworksWrapper
from ambersim_tpu.rl.pendulum import PendulumSwingupEnv
from ambersim_tpu.rl.ppo import make_inference_fn
from ambersim_tpu.rl.ppo import train as ppo_train
from ambersim_tpu.rl.ppo.distributions import NormalTanhDistribution


def train(params_path: str, networks_path: str):
    env = PendulumSwingupEnv()
    wrapper = PPONetworksWrapper(
        policy_network=MLP(layer_sizes=(64, 64, 2)),  # param_size = 2 * action_size
        value_network=MLP(layer_sizes=(64, 64, 1)),
        action_distribution=NormalTanhDistribution,
    )
    network_factory = wrapper.make_ppo_networks

    make_policy, params, metrics = ppo_train(
        environment=env,
        num_timesteps=500_000,
        num_evals=3,
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
        network_factory=network_factory,
        progress_fn=lambda s, m: print(f"  step {s}: {m['eval/episode_reward']:.1f}"),
    )
    save_params(params_path, params)
    with open(networks_path, "wb") as f:
        pickle.dump(wrapper, f)
    print("saved params + pickled network wrapper")


def load_and_run(params_path: str, networks_path: str):
    env = PendulumSwingupEnv()
    with open(networks_path, "rb") as f:
        wrapper: PPONetworksWrapper = pickle.load(f)
    from ambersim_tpu.rl.ppo.running_statistics import normalize

    networks = wrapper.make_ppo_networks(
        observation_size=env.observation_size,
        action_size=env.action_size,
        preprocess_observations_fn=normalize,
    )
    params = load_params(params_path)
    policy = make_inference_fn(networks)(params, deterministic=True)

    @jax.jit
    def run_episode(rng):
        state = env.reset(rng)

        def body(carry, _):
            state, total = carry
            action, _ = policy(state.obs, jax.random.PRNGKey(0))
            state = env.step(state, action)
            return (state, total + state.reward), None

        (state, total), _ = jax.lax.scan(body, (state, jnp.zeros(())), None, length=200)
        return total

    total = run_episode(jax.random.PRNGKey(0))
    print(f"episode reward with loaded policy: {float(total):.1f}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    tmp = tempfile.mkdtemp()
    params_path, networks_path = f"{tmp}/params.pkl", f"{tmp}/networks.pkl"
    if mode in ("train", "both"):
        train(params_path, networks_path)
    if mode in ("load", "both"):
        load_and_run(params_path, networks_path)
