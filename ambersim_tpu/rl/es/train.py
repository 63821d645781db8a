"""Evolution Strategies trainer (role of brax.training.agents.es.train).

OpenAI-ES (Salimans et al. 2017, public algorithm): sample antithetic
parameter perturbations, score each by an episode rollout, and ascend the
fitness-weighted perturbation direction. No backprop through anything — the
whole update is rollouts + one weighted sum, so the population axis
(population_size envs, one per candidate) is sharded over the device mesh
and XLA reduces the fitness-weighted sum over ICI (SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ambersim_tpu.rl import wrappers
from ambersim_tpu.rl.base import MjxEnv
from ambersim_tpu.rl.apg.train import make_deterministic_networks
from ambersim_tpu.rl.ppo import running_statistics
from ambersim_tpu.rl.ppo.networks import identity_observation_preprocessor, make_inference_fn


@struct.dataclass
class TrainingState:
    optimizer_state: Any
    policy_params: Any
    normalizer_params: running_statistics.RunningStatisticsState
    train_iters: jax.Array


def centered_rank(fitness: jax.Array) -> jax.Array:
    """Centered-rank fitness shaping: map raw returns to [-0.5, 0.5] by rank
    (the standard OpenAI-ES transform; robust to reward scale/outliers)."""
    n = fitness.shape[0]
    ranks = jnp.argsort(jnp.argsort(fitness))
    return ranks.astype(jnp.float32) / (n - 1) - 0.5


def train(
    environment: MjxEnv,
    episode_length: int = 1000,
    action_repeat: int = 1,
    population_size: int = 128,
    perturbation_std: float = 0.1,
    learning_rate: float = 0.01,
    l2coeff: float = 0.005,
    fitness_shaping: Callable[[jax.Array], jax.Array] = centered_rank,
    num_eval_envs: int = 128,
    policy_updates: int = 100,
    seed: int = 0,
    num_evals: int = 1,
    normalize_observations: bool = False,
    network_factory: Callable = make_deterministic_networks,
    progress_fn: Callable[[int, Dict[str, Any]], None] = lambda *args: None,
    mesh: Optional[Mesh] = None,
    checkpoint_path: Optional[str] = None,
    restore_checkpoint_path: Optional[str] = None,
) -> Tuple[Callable, Tuple[Any, Any], Dict[str, Any]]:
    """Train a policy by evolution strategies; returns (make_policy,
    (normalizer_params, policy_params), metrics)."""
    if population_size % 2 != 0:
        raise ValueError("population_size must be even (mirrored sampling)")
    env = wrappers.wrap_for_training(environment, episode_length, action_repeat)
    obs_size = environment.observation_size
    action_size = environment.action_size

    num_evals_after_init = max(num_evals - 1, 1)
    updates_per_epoch = max(1, -(-policy_updates // num_evals_after_init))
    env_steps_per_update = population_size * episode_length * action_repeat

    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), axis_names=("batch",))
    if population_size % mesh.size != 0:
        raise ValueError(
            f"population_size ({population_size}) must be divisible by mesh size ({mesh.size})"
        )
    batch_sharding = NamedSharding(mesh, P("batch"))
    replicated = NamedSharding(mesh, P())

    preprocess = (
        running_statistics.normalize if normalize_observations else identity_observation_preprocessor
    )
    es_network = network_factory(obs_size, action_size, preprocess_observations_fn=preprocess)
    make_policy = make_inference_fn(es_network)
    dist = es_network.parametric_action_distribution

    optimizer = optax.adam(learning_rate=learning_rate)

    key = jax.random.PRNGKey(seed)
    key, key_policy, key_eval = jax.random.split(key, 3)
    policy_params = es_network.policy_network.init(key_policy)
    training_state = TrainingState(
        optimizer_state=optimizer.init(policy_params),
        policy_params=policy_params,
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
        """Episode return per population member (one env per member).
        Scans the slim carry (rl/wrappers.py make_slim_carry)."""
        key_reset, key_roll = jax.random.split(key)
        state = env.reset(jax.random.split(key_reset, population_size))
        state = jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, batch_sharding), state)
        to_slim, from_slim = wrappers.make_slim_carry(state)

        def step(carry, _):
            slim, active, total = carry
            state = from_slim(slim)
            logits = jax.vmap(
                lambda p, o: es_network.policy_network.apply(normalizer_params, p, o)
            )(pop_params, state.obs)
            action = dist.mode(logits)
            state = env.step(state, action)
            total = total + state.reward * active
            active = active * (1 - state.done)
            return (to_slim(state), active, total), state.obs

        (_, _, total), obs = jax.lax.scan(
            step,
            (to_slim(state), jnp.ones(population_size), jnp.zeros(population_size)),
            None,
            length=episode_length // action_repeat,
        )
        return total, obs

    def training_step(carry, _):
        training_state, key = carry
        key, key_noise, key_roll = jax.random.split(key, 3)

        # antithetic perturbations: eps for the first half, -eps mirrored
        half = population_size // 2
        leaves, treedef = jax.tree.flatten(training_state.policy_params)
        noise_keys = jax.random.split(key_noise, len(leaves))
        eps_half = [
            jax.random.normal(k, (half,) + leaf.shape, leaf.dtype)
            for k, leaf in zip(noise_keys, leaves)
        ]
        eps = jax.tree.unflatten(
            treedef, [jnp.concatenate([e, -e], axis=0) for e in eps_half]
        )
        pop_params = jax.tree.map(
            lambda p, e: p[None] + perturbation_std * e, training_state.policy_params, eps
        )

        returns, obs = rollout_returns(pop_params, training_state.normalizer_params, key_roll)
        weights = fitness_shaping(returns)

        # fitness-weighted ascent direction, l2-regularized toward 0
        grad = jax.tree.map(
            lambda e, p: -(
                jnp.tensordot(weights, e, axes=1) / (population_size * perturbation_std)
            )
            + l2coeff * p,
            eps,
            training_state.policy_params,
        )
        updates, optimizer_state = optimizer.update(
            grad, training_state.optimizer_state, training_state.policy_params
        )
        policy_params = optax.apply_updates(training_state.policy_params, updates)

        normalizer_params = training_state.normalizer_params
        if normalize_observations:
            normalizer_params = running_statistics.update(
                normalizer_params, obs.reshape((-1, obs.shape[-1]))
            )
        training_state = TrainingState(
            optimizer_state=optimizer_state,
            policy_params=policy_params,
            normalizer_params=normalizer_params,
            train_iters=training_state.train_iters + 1,
        )
        metrics = {
            "fitness_mean": jnp.mean(returns),
            "fitness_max": jnp.max(returns),
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
