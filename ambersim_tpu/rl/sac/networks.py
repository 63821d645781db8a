"""SAC network factories (role of brax.training.agents.sac.networks).

Twin-Q critics are a single flax MLP whose parameters are stacked on a
leading n_critics axis (vmap over init keys) and applied with vmap — one
fused pass on the MXU instead of two module calls.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ambersim_tpu.learning.architectures import MLP
from ambersim_tpu.rl.ppo.distributions import NormalTanhDistribution, ParametricDistribution
from ambersim_tpu.rl.ppo.networks import (
    FeedForwardNetwork,
    identity_observation_preprocessor,
    make_network,
)


@struct.dataclass
class SACNetworks:
    policy_network: FeedForwardNetwork = struct.field(pytree_node=False)
    q_network: FeedForwardNetwork = struct.field(pytree_node=False)
    parametric_action_distribution: ParametricDistribution = struct.field(pytree_node=False)


def make_q_network(
    obs_size: int,
    action_size: int,
    preprocess_observations_fn=identity_observation_preprocessor,
    hidden_layer_sizes: Sequence[int] = (256, 256),
    activation=jax.nn.relu,
    n_critics: int = 2,
) -> FeedForwardNetwork:
    """Q(s, a) network with `n_critics` independent heads; apply returns
    (batch, n_critics)."""
    module = MLP(layer_sizes=list(hidden_layer_sizes) + [1], activation=activation)

    def init_fn(key):
        keys = jax.random.split(key, n_critics)
        dummy = jnp.zeros((1, obs_size + action_size))
        return jax.vmap(lambda k: module.init(k, dummy))(keys)

    def apply_fn(processor_params, params, obs, actions):
        obs = preprocess_observations_fn(obs, processor_params)
        x = jnp.concatenate([obs, actions], axis=-1)
        out = jax.vmap(lambda p: module.apply(p, x))(params)  # (n_critics, batch, 1)
        return jnp.squeeze(out, axis=-1).T  # (batch, n_critics)

    return FeedForwardNetwork(init=init_fn, apply=apply_fn)


def make_sac_networks(
    observation_size: int,
    action_size: int,
    preprocess_observations_fn=identity_observation_preprocessor,
    hidden_layer_sizes: Sequence[int] = (256, 256),
    activation=jax.nn.relu,
) -> SACNetworks:
    """Build SAC policy/critic networks (brax-compatible factory signature)."""
    parametric_action_distribution = NormalTanhDistribution(event_size=action_size)
    policy_module = MLP(
        layer_sizes=list(hidden_layer_sizes) + [parametric_action_distribution.param_size],
        activation=activation,
    )
    policy_network = make_network(policy_module, observation_size, preprocess_observations_fn)
    q_network = make_q_network(
        observation_size,
        action_size,
        preprocess_observations_fn,
        hidden_layer_sizes=hidden_layer_sizes,
        activation=activation,
    )
    return SACNetworks(
        policy_network=policy_network,
        q_network=q_network,
        parametric_action_distribution=parametric_action_distribution,
    )


def make_inference_fn(sac_networks: SACNetworks):
    """Return make_policy(params, deterministic=False) -> policy(obs, rng)
    (same contract as rl.ppo.networks.make_inference_fn)."""

    def make_policy(params: Tuple[Any, Any], deterministic: bool = False):
        normalizer_params, policy_params = params[0], params[1]
        dist = sac_networks.parametric_action_distribution

        def policy(observations, key_sample):
            logits = sac_networks.policy_network.apply(normalizer_params, policy_params, observations)
            if deterministic:
                return dist.mode(logits), {}
            return dist.sample(logits, key_sample), {}

        return policy

    return make_policy
