"""PPO losses: GAE + clipped surrogate (role of brax ppo losses — D6)."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Transition:
    """One env transition, time-major in rollouts: (unroll, batch, ...)."""

    observation: jax.Array
    action: jax.Array  # postprocessed action
    raw_action: jax.Array
    log_prob: jax.Array
    reward: jax.Array
    discount: jax.Array  # 0 where terminated
    truncation: jax.Array  # 1 where episode was cut by time limit
    next_observation: jax.Array


def compute_gae(
    truncation: jax.Array,
    termination: jax.Array,
    rewards: jax.Array,
    values: jax.Array,
    bootstrap_value: jax.Array,
    lambda_: float = 0.95,
    discount: float = 0.99,
):
    """Generalized advantage estimation over a time-major rollout.

    Args: all (T, B); bootstrap_value (B,). Returns (vs, advantages)."""
    truncation_mask = 1 - truncation
    values_t_plus_1 = jnp.concatenate([values[1:], bootstrap_value[None]], axis=0)
    deltas = rewards + discount * (1 - termination) * values_t_plus_1 - values
    deltas *= truncation_mask

    acc = jnp.zeros_like(bootstrap_value)

    def body(carry, xs):
        acc = carry
        delta, trunc_mask, term = xs
        acc = delta + discount * (1 - term) * trunc_mask * lambda_ * acc
        return acc, acc

    _, vs_minus_v = jax.lax.scan(
        body, acc, (deltas, truncation_mask, termination), reverse=True
    )
    vs = vs_minus_v + values
    vs_t_plus_1 = jnp.concatenate([vs[1:], bootstrap_value[None]], axis=0)
    advantages = (rewards + discount * (1 - termination) * vs_t_plus_1 - values) * truncation_mask
    return jax.lax.stop_gradient(vs), jax.lax.stop_gradient(advantages)


def compute_ppo_loss(
    params,
    normalizer_params,
    data: Transition,
    rng: jax.Array,
    ppo_networks,
    entropy_cost: float = 1e-4,
    discounting: float = 0.9,
    reward_scaling: float = 1.0,
    gae_lambda: float = 0.95,
    clipping_epsilon: float = 0.3,
    normalize_advantage: bool = True,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """Clipped-surrogate PPO loss on one minibatch of time-major rollouts."""
    policy_params, value_params = params["policy"], params["value"]
    dist = ppo_networks.parametric_action_distribution

    logits = ppo_networks.policy_network.apply(normalizer_params, policy_params, data.observation)
    baseline = ppo_networks.value_network.apply(normalizer_params, value_params, data.observation)
    bootstrap = ppo_networks.value_network.apply(
        normalizer_params, value_params, data.next_observation[-1]
    )

    rewards = data.reward * reward_scaling
    truncation = data.truncation
    termination = (1 - data.discount) * (1 - truncation)

    target_log_prob = dist.log_prob(logits, data.raw_action)
    behaviour_log_prob = data.log_prob

    vs, advantages = compute_gae(
        truncation=truncation,
        termination=termination,
        rewards=rewards,
        values=baseline,
        bootstrap_value=bootstrap,
        lambda_=gae_lambda,
        discount=discounting,
    )
    if normalize_advantage:
        advantages = (advantages - advantages.mean()) / (advantages.std() + 1e-8)

    rho = jnp.exp(target_log_prob - behaviour_log_prob)
    surrogate = rho * advantages
    surrogate_clipped = jnp.clip(rho, 1 - clipping_epsilon, 1 + clipping_epsilon) * advantages
    policy_loss = -jnp.mean(jnp.minimum(surrogate, surrogate_clipped))

    v_error = vs - baseline
    v_loss = 0.5 * 0.5 * jnp.mean(v_error * v_error)

    entropy = jnp.mean(dist.entropy(logits, rng))
    entropy_loss = -entropy_cost * entropy

    total = policy_loss + v_loss + entropy_loss
    return total, {
        "total_loss": total,
        "policy_loss": policy_loss,
        "v_loss": v_loss,
        "entropy_loss": entropy_loss,
    }
