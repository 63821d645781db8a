"""SAC trainer (role of brax.training.agents.sac.train).

Same contracts as `rl.ppo.train` (the surface the reference exercises at
examples/rl/pendulum/ex_swingup.py:25-58): returns
(make_policy, (normalizer_params, policy_params), metrics) and calls
progress_fn(num_steps, metrics) with an 'eval/episode_reward' key.

TPU-first scaling follows the PPO trainer: the env batch axis carries a
NamedSharding over a device mesh inside a single jit; the replay buffer and
parameters are replicated and XLA inserts ICI collectives for the gradient
reductions (SURVEY.md §5.8). Acting and learning run in the same jitted epoch
(one actor step + `grad_updates_per_step` SGD steps per iteration), so the
whole train loop is a lax.scan with no host round trips between evals.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ambersim_tpu.rl import wrappers
from ambersim_tpu.rl.base import MjxEnv
from ambersim_tpu.rl.ppo import running_statistics
from ambersim_tpu.rl.sac import losses as sac_losses
from ambersim_tpu.rl.sac import networks as sac_networks_lib
from ambersim_tpu.rl.sac import replay


@struct.dataclass
class TrainingState:
    policy_optimizer_state: Any
    policy_params: Any
    q_optimizer_state: Any
    q_params: Any
    target_q_params: Any
    alpha_optimizer_state: Any
    log_alpha: jax.Array
    normalizer_params: running_statistics.RunningStatisticsState
    train_iters: jax.Array  # int32; env steps derived on host (no overflow)


def train(
    environment: MjxEnv,
    num_timesteps: int = 1_000_000,
    episode_length: int = 1000,
    action_repeat: int = 1,
    num_envs: int = 128,
    num_eval_envs: int = 128,
    learning_rate: float = 1e-4,
    discounting: float = 0.9,
    seed: int = 0,
    batch_size: int = 256,
    num_evals: int = 1,
    normalize_observations: bool = False,
    reward_scaling: float = 1.0,
    tau: float = 0.005,
    min_replay_size: int = 0,
    max_replay_size: int = 1_000_000,
    grad_updates_per_step: int = 1,
    network_factory: Callable = sac_networks_lib.make_sac_networks,
    progress_fn: Callable[[int, Dict[str, Any]], None] = lambda *args: None,
    mesh: Optional[Mesh] = None,
    checkpoint_path: Optional[str] = None,
    restore_checkpoint_path: Optional[str] = None,
) -> Tuple[Callable, Tuple[Any, Any], Dict[str, Any]]:
    """Train a SAC agent; returns (make_policy, (normalizer_params,
    policy_params), metrics)."""
    env = wrappers.wrap_for_training(environment, episode_length, action_repeat)
    obs_size = environment.observation_size
    action_size = environment.action_size

    env_steps_per_actor_step = num_envs * action_repeat
    num_prefill_actor_steps = max(-(-min_replay_size // num_envs), 1)
    prefill_env_steps = num_prefill_actor_steps * env_steps_per_actor_step
    num_evals_after_init = max(num_evals - 1, 1)
    num_training_steps_per_epoch = max(
        1,
        -(-(num_timesteps - prefill_env_steps) // (env_steps_per_actor_step * num_evals_after_init)),
    )

    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), axis_names=("batch",))
    if num_envs % mesh.size != 0:
        raise ValueError(f"num_envs ({num_envs}) must be divisible by mesh size ({mesh.size})")
    batch_sharding = NamedSharding(mesh, P("batch"))
    replicated = NamedSharding(mesh, P())

    def shard_env_state(state):
        return jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, batch_sharding), state)

    preprocess = (
        running_statistics.normalize
        if normalize_observations
        else sac_networks_lib.identity_observation_preprocessor
    )
    sac_network = network_factory(obs_size, action_size, preprocess_observations_fn=preprocess)
    make_policy = sac_networks_lib.make_inference_fn(sac_network)
    dist = sac_network.parametric_action_distribution
    target_entropy = -0.5 * action_size  # brax SAC default

    policy_optimizer = optax.adam(learning_rate=learning_rate)
    q_optimizer = optax.adam(learning_rate=learning_rate)
    alpha_optimizer = optax.adam(learning_rate=3e-4)

    key = jax.random.PRNGKey(seed)
    key, key_policy, key_q, key_env, key_eval = jax.random.split(key, 5)

    policy_params = sac_network.policy_network.init(key_policy)
    q_params = sac_network.q_network.init(key_q)
    log_alpha = jnp.zeros(())
    training_state = TrainingState(
        policy_optimizer_state=policy_optimizer.init(policy_params),
        policy_params=policy_params,
        q_optimizer_state=q_optimizer.init(q_params),
        q_params=q_params,
        target_q_params=q_params,
        alpha_optimizer_state=alpha_optimizer.init(log_alpha),
        log_alpha=log_alpha,
        normalizer_params=running_statistics.init_state(jnp.zeros(obs_size)),
        train_iters=jnp.zeros((), jnp.int32),
    )
    if restore_checkpoint_path is not None:
        from ambersim_tpu.io.checkpoint import load_params as _load

        restored = _load(restore_checkpoint_path)
        training_state = jax.tree.map(lambda t, r: jnp.asarray(r), training_state, restored)
    training_state = jax.device_put(training_state, replicated)

    dummy_transition = sac_losses.Transition(
        observation=jnp.zeros((obs_size,)),
        action=jnp.zeros((action_size,)),
        reward=jnp.zeros(()),
        discount=jnp.zeros(()),
        truncation=jnp.zeros(()),
        next_observation=jnp.zeros((obs_size,)),
    )
    buffer_state = replay.init(max_replay_size, dummy_transition)
    buffer_state = jax.device_put(buffer_state, replicated)

    alpha_grad = jax.value_and_grad(
        functools.partial(
            sac_losses.alpha_loss, sac_networks=sac_network, target_entropy=target_entropy
        )
    )
    critic_grad = jax.value_and_grad(
        functools.partial(
            sac_losses.critic_loss,
            sac_networks=sac_network,
            reward_scaling=reward_scaling,
            discounting=discounting,
        )
    )
    actor_grad = jax.value_and_grad(
        functools.partial(sac_losses.actor_loss, sac_networks=sac_network)
    )

    def sgd_step(carry, _):
        training_state, buffer_state, key = carry
        key, key_sample, key_alpha, key_critic, key_actor = jax.random.split(key, 5)
        transitions = replay.sample(buffer_state, key_sample, batch_size)

        aloss, alpha_grads = alpha_grad(
            training_state.log_alpha,
            training_state.policy_params,
            training_state.normalizer_params,
            transitions,
            key_alpha,
        )
        alpha_updates, alpha_opt_state = alpha_optimizer.update(
            alpha_grads, training_state.alpha_optimizer_state
        )
        log_alpha = optax.apply_updates(training_state.log_alpha, alpha_updates)
        alpha = jnp.exp(log_alpha)

        closs, q_grads = critic_grad(
            training_state.q_params,
            training_state.policy_params,
            training_state.normalizer_params,
            training_state.target_q_params,
            alpha,
            transitions,
            key_critic,
        )
        q_updates, q_opt_state = q_optimizer.update(q_grads, training_state.q_optimizer_state)
        q_params = optax.apply_updates(training_state.q_params, q_updates)
        target_q_params = jax.tree.map(
            lambda t, p: t * (1 - tau) + p * tau, training_state.target_q_params, q_params
        )

        ploss, policy_grads = actor_grad(
            training_state.policy_params,
            training_state.q_params,
            training_state.normalizer_params,
            alpha,
            transitions,
            key_actor,
        )
        policy_updates, policy_opt_state = policy_optimizer.update(
            policy_grads, training_state.policy_optimizer_state
        )
        policy_params = optax.apply_updates(training_state.policy_params, policy_updates)

        new_training_state = training_state.replace(
            policy_optimizer_state=policy_opt_state,
            policy_params=policy_params,
            q_optimizer_state=q_opt_state,
            q_params=q_params,
            target_q_params=target_q_params,
            alpha_optimizer_state=alpha_opt_state,
            log_alpha=log_alpha,
        )
        metrics = {"critic_loss": closs, "actor_loss": ploss, "alpha_loss": aloss, "alpha": alpha}
        return (new_training_state, buffer_state, key), metrics

    def actor_step(training_state, env_state, buffer_state, key, random_actions: bool):
        key, key_sample = jax.random.split(key)
        if random_actions:
            raw = jax.random.normal(key_sample, (num_envs, action_size))
            action = dist.postprocess(raw)
        else:
            logits = sac_network.policy_network.apply(
                training_state.normalizer_params, training_state.policy_params, env_state.obs
            )
            raw = dist.sample_no_postprocessing(logits, key_sample)
            action = dist.postprocess(raw)
        next_state = env.step(env_state, action)
        transitions = sac_losses.Transition(
            observation=env_state.obs,
            action=raw,
            reward=next_state.reward,
            discount=1 - next_state.done,
            truncation=next_state.info["truncation"],
            next_observation=next_state.obs,
        )
        normalizer_params = training_state.normalizer_params
        if normalize_observations:
            normalizer_params = running_statistics.update(normalizer_params, transitions.observation)
        training_state = training_state.replace(normalizer_params=normalizer_params)
        buffer_state = replay.insert(buffer_state, transitions)
        return training_state, next_state, buffer_state, key

    # Both per-env-step scans carry the wrapped State with a minimal slim
    # carry (rl/wrappers.py make_slim_carry: the AutoReset cache is
    # scan-invariant and hoisted; only dynamic Data fields ride the carry).
    @jax.jit
    def prefill(training_state, env_state, buffer_state, key):
        env_state = shard_env_state(env_state)
        to_slim, from_slim = wrappers.make_slim_carry(env_state)

        def body(carry, _):
            training_state, slim, buffer_state, key = carry
            training_state, env_state, buffer_state, key = actor_step(
                training_state, from_slim(slim), buffer_state, key, random_actions=True
            )
            return (training_state, to_slim(env_state), buffer_state, key), None

        (training_state, slim, buffer_state, _), _ = jax.lax.scan(
            body,
            (training_state, to_slim(env_state), buffer_state, key),
            None,
            length=num_prefill_actor_steps,
        )
        return training_state, from_slim(slim), buffer_state

    def training_step(carry, _, *, from_slim, to_slim):
        training_state, slim, buffer_state, key = carry
        key, key_act, key_sgd = jax.random.split(key, 3)
        training_state, env_state, buffer_state, _ = actor_step(
            training_state, from_slim(slim), buffer_state, key_act, random_actions=False
        )
        (training_state, buffer_state, _), metrics = jax.lax.scan(
            sgd_step, (training_state, buffer_state, key_sgd), None, length=grad_updates_per_step
        )
        training_state = training_state.replace(train_iters=training_state.train_iters + 1)
        return (training_state, to_slim(env_state), buffer_state, key), jax.tree.map(jnp.mean, metrics)

    @jax.jit
    def training_epoch(training_state, env_state, buffer_state, key):
        env_state = shard_env_state(env_state)
        to_slim, from_slim = wrappers.make_slim_carry(env_state)
        step_fn = functools.partial(training_step, from_slim=from_slim, to_slim=to_slim)
        (training_state, slim, buffer_state, _), metrics = jax.lax.scan(
            step_fn,
            (training_state, to_slim(env_state), buffer_state, key),
            None,
            length=num_training_steps_per_epoch,
        )
        return training_state, from_slim(slim), buffer_state, jax.tree.map(jnp.mean, metrics)

    eval_env = wrappers.wrap_for_training(environment, episode_length, action_repeat)

    @jax.jit
    def run_evaluation(training_state, key):
        policy = make_policy(
            (training_state.normalizer_params, training_state.policy_params), deterministic=True
        )
        keys = jax.random.split(key, num_eval_envs)
        state = eval_env.reset(keys)

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

    # ---------------- main loop (host) ----------------
    metrics: Dict[str, Any] = {}
    key, key_envs, key_prefill = jax.random.split(key, 3)
    env_state = jax.jit(env.reset)(jax.random.split(key_envs, num_envs))
    training_state, env_state, buffer_state = prefill(
        training_state, env_state, buffer_state, key_prefill
    )

    current_step = prefill_env_steps
    if num_evals > 1:
        episode_reward = run_evaluation(training_state, key_eval)
        metrics = {"eval/episode_reward": float(episode_reward)}
        progress_fn(0, metrics)

    for _ in range(num_evals_after_init):
        key, epoch_key = jax.random.split(key)
        training_state, env_state, buffer_state, train_metrics = training_epoch(
            training_state, env_state, buffer_state, epoch_key
        )
        current_step = prefill_env_steps + int(training_state.train_iters) * env_steps_per_actor_step

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
