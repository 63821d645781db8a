"""SAC losses (role of brax.training.agents.sac.losses): twin-Q TD critic,
reparameterized actor, and automatic entropy-temperature tuning."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ambersim_tpu.rl.sac.networks import SACNetworks


@struct.dataclass
class Transition:
    observation: jax.Array
    action: jax.Array  # raw (pre-tanh) action
    reward: jax.Array
    discount: jax.Array  # 1 - done
    truncation: jax.Array  # 1 if the episode ended by timeout
    next_observation: jax.Array


def alpha_loss(
    log_alpha: jax.Array,
    policy_params,
    normalizer_params,
    transitions: Transition,
    key: jax.Array,
    sac_networks: SACNetworks,
    target_entropy: float,
) -> jax.Array:
    """Temperature loss: alpha * E[-log pi(a|s) - target_entropy]."""
    dist = sac_networks.parametric_action_distribution
    logits = sac_networks.policy_network.apply(normalizer_params, policy_params, transitions.observation)
    raw = dist.sample_no_postprocessing(logits, key)
    log_prob = dist.log_prob(logits, raw)
    alpha = jnp.exp(log_alpha)
    return jnp.mean(alpha * jax.lax.stop_gradient(-log_prob - target_entropy))


def critic_loss(
    q_params,
    policy_params,
    normalizer_params,
    target_q_params,
    alpha: jax.Array,
    transitions: Transition,
    key: jax.Array,
    sac_networks: SACNetworks,
    reward_scaling: float,
    discounting: float,
) -> jax.Array:
    dist = sac_networks.parametric_action_distribution
    q_old = sac_networks.q_network.apply(
        normalizer_params, q_params, transitions.observation, dist.postprocess(transitions.action)
    )
    next_logits = sac_networks.policy_network.apply(
        normalizer_params, policy_params, transitions.next_observation
    )
    next_raw = dist.sample_no_postprocessing(next_logits, key)
    next_log_prob = dist.log_prob(next_logits, next_raw)
    next_q = sac_networks.q_network.apply(
        normalizer_params, target_q_params, transitions.next_observation, dist.postprocess(next_raw)
    )
    next_v = jnp.min(next_q, axis=-1) - alpha * next_log_prob
    target_q = jax.lax.stop_gradient(
        transitions.reward * reward_scaling + transitions.discount * discounting * next_v
    )
    q_error = q_old - jnp.expand_dims(target_q, -1)
    # drop timeout transitions from the TD loss: their "done" is not a real
    # absorbing state (brax truncation-mask semantics)
    mask = jnp.expand_dims(1.0 - transitions.truncation, -1)
    return 0.5 * jnp.mean(jnp.square(q_error) * mask)


def actor_loss(
    policy_params,
    q_params,
    normalizer_params,
    alpha: jax.Array,
    transitions: Transition,
    key: jax.Array,
    sac_networks: SACNetworks,
) -> jax.Array:
    dist = sac_networks.parametric_action_distribution
    logits = sac_networks.policy_network.apply(normalizer_params, policy_params, transitions.observation)
    raw = dist.sample_no_postprocessing(logits, key)
    log_prob = dist.log_prob(logits, raw)
    q_action = sac_networks.q_network.apply(
        normalizer_params, q_params, transitions.observation, dist.postprocess(raw)
    )
    min_q = jnp.min(q_action, axis=-1)
    return jnp.mean(alpha * log_prob - min_q)
