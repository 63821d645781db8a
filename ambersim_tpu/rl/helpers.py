"""PPO network wrapper enabling pickling of custom architectures
(reference: ambersim/rl/helpers.py:10-83 `BraxPPONetworksWrapper`).

Bundles policy module + value module + action distribution class so that
save/load of a policy can reconstruct the network structure from the pickle
alone (reference usage: examples/rl/pendulum/ex_save_and_load.py:86-103)."""

from __future__ import annotations

from typing import Callable, Type

import jax
import jax.numpy as jnp
from flax import linen, struct

from ambersim_tpu.rl.ppo.distributions import ParametricDistribution
from ambersim_tpu.rl.ppo.networks import (
    FeedForwardNetwork,
    PPONetworks,
    identity_observation_preprocessor,
    make_network,
)


@struct.dataclass
class PPONetworksWrapper:
    """Pickle-able bundle of policy/value modules + action distribution."""

    policy_network: linen.Module = struct.field(pytree_node=False)
    value_network: linen.Module = struct.field(pytree_node=False)
    action_distribution: Type[ParametricDistribution] = struct.field(pytree_node=False)

    def make_ppo_networks(
        self,
        observation_size: int,
        action_size: int,
        preprocess_observations_fn: Callable = identity_observation_preprocessor,
    ) -> PPONetworks:
        """Build PPONetworks, validating output sizes by dummy-input tracing
        (reference: rl/helpers.py:40-68)."""
        dist = self.action_distribution(event_size=action_size)

        dummy = jnp.zeros((1, observation_size))
        rng = jax.random.PRNGKey(0)
        policy_out = jax.eval_shape(
            lambda: self.policy_network.apply(self.policy_network.init(rng, dummy), dummy)
        ).shape
        if policy_out[-1] != dist.param_size:
            raise ValueError(
                f"policy network output size {policy_out[-1]} does not match "
                f"distribution param_size {dist.param_size}"
            )
        value_out = jax.eval_shape(
            lambda: self.value_network.apply(self.value_network.init(rng, dummy), dummy)
        ).shape
        if value_out[-1] != 1:
            raise ValueError(f"value network must output a scalar, got size {value_out[-1]}")

        policy = make_network(self.policy_network, observation_size, preprocess_observations_fn)
        value_raw = make_network(self.value_network, observation_size, preprocess_observations_fn)
        value = FeedForwardNetwork(
            init=value_raw.init,
            apply=lambda pp, p, obs: jnp.squeeze(value_raw.apply(pp, p, obs), axis=-1),
        )
        return PPONetworks(
            policy_network=policy,
            value_network=value,
            parametric_action_distribution=dist,
        )


# reference-compatible alias (reference class name at rl/helpers.py:10)
BraxPPONetworksWrapper = PPONetworksWrapper
