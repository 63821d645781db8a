"""APG trainer (role of brax.training.agents.apg.train).

Each policy update differentiates the mean per-env episode return of an
`episode_length`-step rollout with respect to the policy parameters — the
chain rule runs through the policy MLP, the contact solve, and the
integrator (reverse-mode through `step()`, tests/test_differentiable.py).
The rollout is a lax.scan whose env batch axis is sharded over the device
mesh; XLA inserts the ICI psum for the gradient reduction (SURVEY.md §5.8).

Rematerialization: each env step is wrapped in jax.checkpoint so the
backward pass recomputes physics instead of storing every intermediate of
every step — O(T) memory in env state rather than in pipeline internals,
the standard trade of FLOPs for HBM on long differentiable rollouts.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ambersim_tpu.learning.architectures import MLP
from ambersim_tpu.rl import wrappers
from ambersim_tpu.rl.base import MjxEnv
from ambersim_tpu.rl.ppo import running_statistics
from ambersim_tpu.rl.ppo.distributions import DeterministicTanhDistribution, NormalTanhDistribution
from ambersim_tpu.rl.ppo.networks import (
    FeedForwardNetwork,
    PPONetworks,
    identity_observation_preprocessor,
    make_inference_fn,
    make_network,
)


@struct.dataclass
class TrainingState:
    optimizer_state: Any
    policy_params: Any
    normalizer_params: running_statistics.RunningStatisticsState
    train_iters: jax.Array


def make_apg_networks(
    observation_size: int,
    action_size: int,
    preprocess_observations_fn=identity_observation_preprocessor,
    hidden_layer_sizes: Sequence[int] = (32,) * 4,
    activation=jax.nn.swish,
) -> PPONetworks:
    """Policy-only network bundle (PPONetworks shape so make_inference_fn and
    the pickled-wrapper save/load flow apply unchanged; the value network is
    unused by APG)."""
    dist = NormalTanhDistribution(event_size=action_size)
    policy_module = MLP(
        layer_sizes=list(hidden_layer_sizes) + [dist.param_size], activation=activation
    )
    policy_network = make_network(policy_module, observation_size, preprocess_observations_fn)
    value_network = FeedForwardNetwork(init=lambda key: {}, apply=lambda pp, p, obs: jnp.zeros(obs.shape[:-1]))
    return PPONetworks(
        policy_network=policy_network,
        value_network=value_network,
        parametric_action_distribution=dist,
    )


def make_deterministic_networks(
    observation_size: int,
    action_size: int,
    preprocess_observations_fn=identity_observation_preprocessor,
    hidden_layer_sizes: Sequence[int] = (32,) * 4,
    activation=jax.nn.swish,
) -> PPONetworks:
    """Policy-only bundle with a deterministic tanh head (param_size ==
    action_size). Default for ES/ARS, which roll out with dist.mode: every
    perturbed parameter affects fitness (no dead log-std columns)."""
    dist = DeterministicTanhDistribution(event_size=action_size)
    policy_module = MLP(
        layer_sizes=list(hidden_layer_sizes) + [dist.param_size], activation=activation
    )
    policy_network = make_network(policy_module, observation_size, preprocess_observations_fn)
    value_network = FeedForwardNetwork(init=lambda key: {}, apply=lambda pp, p, obs: jnp.zeros(obs.shape[:-1]))
    return PPONetworks(
        policy_network=policy_network,
        value_network=value_network,
        parametric_action_distribution=dist,
    )


def train(
    environment: MjxEnv,
    episode_length: int = 1000,
    action_repeat: int = 1,
    num_envs: int = 32,
    num_eval_envs: int = 128,
    policy_updates: int = 100,
    learning_rate: float = 1e-3,
    max_gradient_norm: float = 1e9,
    seed: int = 0,
    num_evals: int = 1,
    normalize_observations: bool = False,
    deterministic_rollout: bool = True,
    network_factory: Callable = make_apg_networks,
    progress_fn: Callable[[int, Dict[str, Any]], None] = lambda *args: None,
    mesh: Optional[Mesh] = None,
    checkpoint_path: Optional[str] = None,
    restore_checkpoint_path: Optional[str] = None,
) -> Tuple[Callable, Tuple[Any, Any], Dict[str, Any]]:
    """Train a policy by analytic gradients; returns (make_policy,
    (normalizer_params, policy_params), metrics)."""
    env = wrappers.wrap_for_training(environment, episode_length, action_repeat)
    obs_size = environment.observation_size
    action_size = environment.action_size

    num_evals_after_init = max(num_evals - 1, 1)
    updates_per_epoch = max(1, -(-policy_updates // num_evals_after_init))
    env_steps_per_update = num_envs * episode_length * action_repeat

    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), axis_names=("batch",))
    if num_envs % mesh.size != 0:
        raise ValueError(f"num_envs ({num_envs}) must be divisible by mesh size ({mesh.size})")
    batch_sharding = NamedSharding(mesh, P("batch"))
    replicated = NamedSharding(mesh, P())

    preprocess = (
        running_statistics.normalize if normalize_observations else identity_observation_preprocessor
    )
    apg_network = network_factory(obs_size, action_size, preprocess_observations_fn=preprocess)
    make_policy = make_inference_fn(apg_network)
    dist = apg_network.parametric_action_distribution

    optimizer = optax.chain(
        optax.clip_by_global_norm(max_gradient_norm), optax.adam(learning_rate=learning_rate)
    )

    key = jax.random.PRNGKey(seed)
    key, key_policy, key_eval = jax.random.split(key, 3)
    policy_params = apg_network.policy_network.init(key_policy)
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

    def rollout_loss(policy_params, normalizer_params, env_state, key):
        """-mean per-env episode return, differentiated through the sim.

        The scan carries the slim state (rl/wrappers.py make_slim_carry):
        besides the forward-pass traffic, under jax.checkpoint the carry is
        a per-step RESIDUAL, so dropping the two full Data pytrees from it
        shrinks rematerialization memory by ~150x per step."""
        to_slim, from_slim = wrappers.make_slim_carry(env_state)

        @jax.checkpoint
        def env_step(carry, _):
            slim, key = carry
            env_state = from_slim(slim)
            key, key_sample = jax.random.split(key)
            logits = apg_network.policy_network.apply(normalizer_params, policy_params, env_state.obs)
            if deterministic_rollout:
                action = dist.mode(logits)
            else:
                action = dist.sample(logits, key_sample)
            env_state = env.step(env_state, action)
            return (to_slim(env_state), key), (env_state.reward, env_state.obs)

        (slim, _), (rewards, obs) = jax.lax.scan(
            env_step, (to_slim(env_state), key), None, length=episode_length // action_repeat
        )
        return -jnp.mean(jnp.sum(rewards, axis=0)), (from_slim(slim), obs)

    loss_grad = jax.value_and_grad(rollout_loss, has_aux=True)

    def training_step(carry, _):
        training_state, env_state, key = carry
        key, key_roll, key_reset = jax.random.split(key, 3)
        (loss, (_, obs)), grads = loss_grad(
            training_state.policy_params, training_state.normalizer_params, env_state, key_roll
        )
        updates, optimizer_state = optimizer.update(
            grads, training_state.optimizer_state, training_state.policy_params
        )
        policy_params = optax.apply_updates(training_state.policy_params, updates)
        normalizer_params = training_state.normalizer_params
        if normalize_observations:
            normalizer_params = running_statistics.update(
                normalizer_params, obs.reshape((-1, obs.shape[-1]))
            )
        # fresh starts each update: full-episode objective, no stale tails
        env_state = env.reset(jax.random.split(key_reset, num_envs))
        env_state = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, batch_sharding), env_state
        )
        training_state = TrainingState(
            optimizer_state=optimizer_state,
            policy_params=policy_params,
            normalizer_params=normalizer_params,
            train_iters=training_state.train_iters + 1,
        )
        grad_norm = optax.global_norm(grads)
        return (training_state, env_state, key), {"episode_loss": loss, "grad_norm": grad_norm}

    import functools

    # Pinned in/out shardings + the pre-committed initial env state below
    # keep every epoch call on ONE executable: jit keys its cache on actual
    # argument shardings, so unspecified-sharding reset outputs on call 1 vs
    # the epoch's own outputs on call 2 silently compile the epoch twice
    # (same failure measured at ~17 s/epoch on the PPO quadruped bench).
    @functools.partial(
        jax.jit,
        in_shardings=(replicated, batch_sharding, replicated),
        out_shardings=(replicated, batch_sharding, replicated),
    )
    def training_epoch(training_state, env_state, key):
        env_state = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, batch_sharding), env_state
        )
        (training_state, env_state, _), metrics = jax.lax.scan(
            training_step, (training_state, env_state, key), None, length=updates_per_epoch
        )
        return training_state, env_state, jax.tree.map(jnp.mean, metrics)

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
    key, key_envs = jax.random.split(key)
    env_state = jax.jit(env.reset)(jax.random.split(key_envs, num_envs))
    env_state = jax.device_put(env_state, batch_sharding)

    current_step = 0
    if num_evals > 1:
        metrics = {"eval/episode_reward": float(run_evaluation(training_state, key_eval))}
        progress_fn(0, metrics)

    for _ in range(num_evals_after_init):
        key, epoch_key = jax.random.split(key)
        training_state, env_state, train_metrics = training_epoch(training_state, env_state, epoch_key)
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
