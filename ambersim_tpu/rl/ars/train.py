"""ARS trainer (role of brax.training.agents.ars.train).

Augmented Random Search V2-t: for each of `number_of_directions` antithetic
perturbation pairs, roll out both signs for a full episode (2·N parallel
envs, one per candidate — vmapped and mesh-sharded), keep the `top_directions`
pairs by max(reward+, reward-), and step

    theta += step_size / (top_b * sigma_R) * sum_b (r+_b - r-_b) * delta_b

where sigma_R is the std of the retained rewards (the "augmented" scaling).
Observation normalization uses the running-statistics pytree shared with the
other trainers. Gradient-free: the only cross-device communication is the
psum XLA inserts for the weighted-direction sum and the normalizer update.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ambersim_tpu.rl import wrappers
from ambersim_tpu.rl.base import MjxEnv
from ambersim_tpu.rl.apg.train import make_deterministic_networks
from ambersim_tpu.rl.ppo import running_statistics
from ambersim_tpu.rl.ppo.networks import identity_observation_preprocessor, make_inference_fn


@struct.dataclass
class TrainingState:
    policy_params: Any
    normalizer_params: running_statistics.RunningStatisticsState
    train_iters: jax.Array


def train(
    environment: MjxEnv,
    episode_length: int = 1000,
    action_repeat: int = 1,
    number_of_directions: int = 60,
    top_directions: int = 20,
    step_size: float = 0.015,
    exploration_noise_std: float = 0.025,
    reward_shift: float = 0.0,
    num_eval_envs: int = 128,
    policy_updates: int = 100,
    seed: int = 0,
    num_evals: int = 1,
    normalize_observations: bool = True,
    network_factory: Callable = make_deterministic_networks,
    progress_fn: Callable[[int, Dict[str, Any]], None] = lambda *args: None,
    mesh: Optional[Mesh] = None,
    checkpoint_path: Optional[str] = None,
    restore_checkpoint_path: Optional[str] = None,
) -> Tuple[Callable, Tuple[Any, Any], Dict[str, Any]]:
    """Train a policy by augmented random search; returns (make_policy,
    (normalizer_params, policy_params), metrics)."""
    if not 0 < top_directions <= number_of_directions:
        raise ValueError("need 0 < top_directions <= number_of_directions")
    env = wrappers.wrap_for_training(environment, episode_length, action_repeat)
    obs_size = environment.observation_size
    action_size = environment.action_size
    num_candidates = 2 * number_of_directions  # antithetic pairs

    num_evals_after_init = max(num_evals - 1, 1)
    updates_per_epoch = max(1, -(-policy_updates // num_evals_after_init))
    env_steps_per_update = num_candidates * episode_length * action_repeat

    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), axis_names=("batch",))
    if num_candidates % mesh.size != 0:
        raise ValueError(
            f"2*number_of_directions ({num_candidates}) must be divisible by "
            f"mesh size ({mesh.size})"
        )
    batch_sharding = NamedSharding(mesh, P("batch"))
    replicated = NamedSharding(mesh, P())

    preprocess = (
        running_statistics.normalize if normalize_observations else identity_observation_preprocessor
    )
    ars_network = network_factory(obs_size, action_size, preprocess_observations_fn=preprocess)
    make_policy = make_inference_fn(ars_network)
    dist = ars_network.parametric_action_distribution

    key = jax.random.PRNGKey(seed)
    key, key_policy, key_eval = jax.random.split(key, 3)
    training_state = TrainingState(
        policy_params=ars_network.policy_network.init(key_policy),
        normalizer_params=running_statistics.init_state(jnp.zeros(obs_size)),
        train_iters=jnp.zeros((), jnp.int32),
    )
    if restore_checkpoint_path is not None:
        from ambersim_tpu.io.checkpoint import load_params as _load

        training_state = jax.tree.map(
            lambda t, r: jnp.asarray(r), training_state, _load(restore_checkpoint_path)
        )
    training_state = jax.device_put(training_state, replicated)

    def rollout_returns(pop_params, normalizer_params, key):
        """Episode return per candidate (one env per candidate).
        Scans the slim carry (rl/wrappers.py make_slim_carry)."""
        state = env.reset(jax.random.split(key, num_candidates))
        state = jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, batch_sharding), state)
        to_slim, from_slim = wrappers.make_slim_carry(state)

        def step(carry, _):
            slim, active, total, raw = carry
            state = from_slim(slim)
            logits = jax.vmap(
                lambda p, o: ars_network.policy_network.apply(normalizer_params, p, o)
            )(pop_params, state.obs)
            state = env.step(state, dist.mode(logits))
            total = total + (state.reward - reward_shift) * active
            raw = raw + state.reward * active
            active = active * (1 - state.done)
            return (to_slim(state), active, total, raw), state.obs

        zeros = jnp.zeros(num_candidates)
        (_, _, total, raw), obs = jax.lax.scan(
            step,
            (to_slim(state), jnp.ones(num_candidates), zeros, zeros),
            None,
            length=episode_length // action_repeat,
        )
        return total, raw, obs

    def training_step(carry, _):
        training_state, key = carry
        key, key_noise, key_roll = jax.random.split(key, 3)

        leaves, treedef = jax.tree.flatten(training_state.policy_params)
        noise_keys = jax.random.split(key_noise, len(leaves))
        deltas = jax.tree.unflatten(
            treedef,
            [
                jax.random.normal(k, (number_of_directions,) + leaf.shape, leaf.dtype)
                for k, leaf in zip(noise_keys, leaves)
            ],
        )
        # candidate layout: [theta + sigma*delta_i ; theta - sigma*delta_i]
        pop_params = jax.tree.map(
            lambda p, d: jnp.concatenate(
                [p[None] + exploration_noise_std * d, p[None] - exploration_noise_std * d]
            ),
            training_state.policy_params,
            deltas,
        )
        returns, raw_returns, obs = rollout_returns(
            pop_params, training_state.normalizer_params, key_roll
        )
        r_plus, r_minus = returns[:number_of_directions], returns[number_of_directions:]

        # V2-t selection: keep the top_directions pairs by max(r+, r-)
        scores = jnp.maximum(r_plus, r_minus)
        _, top_idx = jax.lax.top_k(scores, top_directions)
        rp, rm = r_plus[top_idx], r_minus[top_idx]
        reward_std = jnp.maximum(jnp.std(jnp.concatenate([rp, rm])), 1e-6)
        coeff = step_size / (top_directions * reward_std)

        policy_params = jax.tree.map(
            lambda p, d: p + coeff * jnp.tensordot(rp - rm, d[top_idx], axes=1),
            training_state.policy_params,
            deltas,
        )

        normalizer_params = training_state.normalizer_params
        if normalize_observations:
            normalizer_params = running_statistics.update(
                normalizer_params, obs.reshape((-1, obs.shape[-1]))
            )
        training_state = TrainingState(
            policy_params=policy_params,
            normalizer_params=normalizer_params,
            train_iters=training_state.train_iters + 1,
        )
        # Fitness metrics report RAW episode returns (reward_shift is a
        # search-shaping device, not part of the task reward); fitness_top is
        # the raw return of the shift-adjusted top pairs actually kept.
        raw_scores = jnp.maximum(
            raw_returns[:number_of_directions], raw_returns[number_of_directions:]
        )
        metrics = {
            "fitness_mean": jnp.mean(raw_returns),
            "fitness_top": jnp.mean(raw_scores[top_idx]),
            "reward_std": reward_std,
        }
        return (training_state, key), metrics

    @jax.jit
    def training_epoch(training_state, key):
        (training_state, _), metrics = jax.lax.scan(
            training_step, (training_state, key), None, length=updates_per_epoch
        )
        return training_state, jax.tree.map(jnp.mean, metrics)

    eval_env = wrappers.wrap_for_training(environment, episode_length, action_repeat)

    @jax.jit
    def run_evaluation(training_state, key):
        policy = make_policy(
            (training_state.normalizer_params, training_state.policy_params), deterministic=True
        )
        state = eval_env.reset(jax.random.split(key, num_eval_envs))

        def step(carry, _):
            state, active, total = carry
            act, _ = policy(state.obs, jax.random.PRNGKey(0))
            state = eval_env.step(state, act)
            total = total + state.reward * active
            active = active * (1 - state.done)
            return (state, active, total), None

        (_, _, total), _ = jax.lax.scan(
            step,
            (state, jnp.ones(num_eval_envs), jnp.zeros(num_eval_envs)),
            None,
            length=episode_length // action_repeat,
        )
        return jnp.mean(total)

    metrics: Dict[str, Any] = {}
    current_step = 0
    if num_evals > 1:
        metrics = {"eval/episode_reward": float(run_evaluation(training_state, key_eval))}
        progress_fn(0, metrics)

    for _ in range(num_evals_after_init):
        key, epoch_key = jax.random.split(key)
        training_state, train_metrics = training_epoch(training_state, epoch_key)
        current_step = int(training_state.train_iters) * env_steps_per_update

        key, key_eval = jax.random.split(key)
        episode_reward = run_evaluation(training_state, key_eval)
        metrics = {
            "eval/episode_reward": float(episode_reward),
            **{f"training/{k}": float(v) for k, v in train_metrics.items()},
        }
        progress_fn(current_step, metrics)
        if checkpoint_path is not None:
            from ambersim_tpu.io.checkpoint import save_params as _save

            _save(checkpoint_path, training_state)

    params = (training_state.normalizer_params, training_state.policy_params)
    return make_policy, params, metrics
