"""PPO network factories (role of brax.training.agents.ppo.networks +
brax.training.networks, consumed by the reference at
examples/rl/pendulum/ex_swingup.py:21-24 and ambersim/rl/helpers.py:5,79-83 —
D7 in SURVEY.md)."""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ambersim_tpu.learning.architectures import MLP
from ambersim_tpu.rl.ppo import running_statistics
from ambersim_tpu.rl.ppo.distributions import NormalTanhDistribution, ParametricDistribution


def identity_observation_preprocessor(observations, preprocessor_params):
    """No-op preprocessor (role of types.identity_observation_preprocessor,
    reference ambersim/rl/helpers.py:24)."""
    return observations


@struct.dataclass
class FeedForwardNetwork:
    init: Callable = struct.field(pytree_node=False)
    apply: Callable = struct.field(pytree_node=False)


@struct.dataclass
class PPONetworks:
    policy_network: FeedForwardNetwork = struct.field(pytree_node=False)
    value_network: FeedForwardNetwork = struct.field(pytree_node=False)
    parametric_action_distribution: ParametricDistribution = struct.field(pytree_node=False)


def make_network(module, obs_size: int, preprocess_observations_fn) -> FeedForwardNetwork:
    """Wrap a flax module with observation preprocessing into init/apply pairs
    (cf. reference rl/helpers.py:54-77)."""

    def init_fn(key):
        return module.init(key, jnp.zeros((1, obs_size)))

    def apply_fn(processor_params, params, obs):
        obs = preprocess_observations_fn(obs, processor_params)
        return module.apply(params, obs)

    return FeedForwardNetwork(init=init_fn, apply=apply_fn)


def make_ppo_networks(
    observation_size: int,
    action_size: int,
    preprocess_observations_fn=identity_observation_preprocessor,
    policy_hidden_layer_sizes: Sequence[int] = (32,) * 4,
    value_hidden_layer_sizes: Sequence[int] = (256,) * 5,
    activation=jax.nn.swish,
) -> PPONetworks:
    """Build PPO policy/value networks (brax-compatible factory signature used
    at reference ex_swingup.py:21-24)."""
    parametric_action_distribution = NormalTanhDistribution(event_size=action_size)
    policy_module = MLP(
        layer_sizes=list(policy_hidden_layer_sizes) + [parametric_action_distribution.param_size],
        activation=activation,
    )
    value_module = MLP(layer_sizes=list(value_hidden_layer_sizes) + [1], activation=activation)

    policy_network = make_network(policy_module, observation_size, preprocess_observations_fn)
    value_network_raw = make_network(value_module, observation_size, preprocess_observations_fn)
    value_network = FeedForwardNetwork(
        init=value_network_raw.init,
        apply=lambda pp, p, obs: jnp.squeeze(value_network_raw.apply(pp, p, obs), axis=-1),
    )
    return PPONetworks(
        policy_network=policy_network,
        value_network=value_network,
        parametric_action_distribution=parametric_action_distribution,
    )


def make_inference_fn(ppo_networks: PPONetworks):
    """Return make_policy(params, deterministic=False) -> policy(obs, rng)
    (contract used at reference ex_swingup.py:64-71, ex_save_and_load.py:112-114)."""

    def make_policy(params: Tuple[Any, Any], deterministic: bool = False):
        normalizer_params, policy_params = params[0], params[1]
        dist = ppo_networks.parametric_action_distribution

        def policy(observations, key_sample):
            logits = ppo_networks.policy_network.apply(normalizer_params, policy_params, observations)
            if deterministic:
                return dist.mode(logits), {}
            raw = dist.sample_no_postprocessing(logits, key_sample)
            log_prob = dist.log_prob(logits, raw)
            return dist.postprocess(raw), {"log_prob": log_prob, "raw_action": raw}

        return policy

    return make_policy
