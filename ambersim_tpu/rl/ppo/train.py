"""PPO trainer (role of brax.training.agents.ppo.train — D6 in SURVEY.md).

Hyperparameter surface matches the reference's usage
(reference: examples/rl/pendulum/ex_swingup.py:25-43): num_timesteps,
num_evals, reward_scaling, episode_length, normalize_observations,
action_repeat, unroll_length, num_minibatches, num_updates_per_batch,
discounting, learning_rate, entropy_cost, num_envs, batch_size,
network_factory, seed; returns (make_inference_fn, params, metrics) and calls
progress_fn(num_steps, metrics) with an 'eval/episode_reward' key
(ex_swingup.py:48-58).

TPU-first scaling: instead of brax's pmap/psum, the env batch axis carries a
NamedSharding over a device mesh inside a single jit — XLA partitions the
rollout across chips and inserts ICI collectives for the gradient/statistics
reductions (SURVEY.md §5.8).
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ambersim_tpu.rl import wrappers
from ambersim_tpu.rl.base import MjxEnv
from ambersim_tpu.rl.ppo import losses as ppo_losses
from ambersim_tpu.rl.ppo import networks as ppo_networks_lib
from ambersim_tpu.rl.ppo import running_statistics


@struct.dataclass
class TrainingState:
    optimizer_state: Any
    params: Dict[str, Any]
    normalizer_params: running_statistics.RunningStatisticsState
    # count of completed training steps (int32-safe: env steps are derived on
    # host as train_iters * env_step_per_training_step, so no 2.1B overflow)
    train_iters: jax.Array


def train(
    environment: MjxEnv,
    num_timesteps: int = 1_000_000,
    episode_length: int = 1000,
    action_repeat: int = 1,
    num_envs: int = 1024,
    num_eval_envs: int = 128,
    learning_rate: float = 1e-4,
    entropy_cost: float = 1e-4,
    discounting: float = 0.9,
    seed: int = 0,
    unroll_length: int = 10,
    batch_size: int = 32,
    num_minibatches: int = 16,
    num_updates_per_batch: int = 2,
    num_evals: int = 1,
    normalize_observations: bool = False,
    reward_scaling: float = 1.0,
    gae_lambda: float = 0.95,
    clipping_epsilon: float = 0.3,
    normalize_advantage: bool = True,
    network_factory: Callable = ppo_networks_lib.make_ppo_networks,
    progress_fn: Callable[[int, Dict[str, Any]], None] = lambda *args: None,
    mesh: Optional[Mesh] = None,
    checkpoint_path: Optional[str] = None,
    restore_checkpoint_path: Optional[str] = None,
    randomization_fn: Optional[Callable] = None,
) -> Tuple[Callable, Tuple[Any, Any], Dict[str, Any]]:
    """Train a PPO agent; returns (make_inference_fn(ppo_networks) partial,
    (normalizer_params, policy_params), metrics).

    `randomization_fn(model, rng) -> (model_v, in_axes)` gives every parallel
    env its own randomized Model (brax's domain-randomization hook): `rng` is
    a (num_envs, 2) key batch bound by the trainer, `model_v` stacks the
    randomized numeric leaves on a leading axis, `in_axes` marks them with 0
    (None elsewhere). Eval envs draw their own randomized batch.
    """
    rand_key = jax.random.PRNGKey(seed ^ 0x5EED)
    train_rand_fn = eval_rand_fn = None
    if randomization_fn is not None:
        k1, k2 = jax.random.split(rand_key)
        train_rand_fn = functools.partial(randomization_fn, rng=jax.random.split(k1, num_envs))
        eval_rand_fn = functools.partial(randomization_fn, rng=jax.random.split(k2, num_eval_envs))
    env = wrappers.wrap_for_training(
        environment, episode_length, action_repeat, randomization_fn=train_rand_fn
    )
    obs_size = environment.observation_size
    action_size = environment.action_size

    if (batch_size * num_minibatches) % num_envs != 0:
        raise ValueError("batch_size * num_minibatches must be divisible by num_envs")
    num_unrolls = batch_size * num_minibatches // num_envs
    env_step_per_training_step = num_envs * unroll_length * num_unrolls * action_repeat
    num_evals_after_init = max(num_evals - 1, 1)
    num_training_steps_per_epoch = max(
        1, -(-num_timesteps // (env_step_per_training_step * num_evals_after_init))
    )

    # device mesh for data parallelism over the env axis
    if mesh is None:
        devices = jax.devices()
        mesh = Mesh(np.array(devices), axis_names=("batch",))
    if num_envs % mesh.size != 0:
        raise ValueError(f"num_envs ({num_envs}) must be divisible by mesh size ({mesh.size})")
    batch_sharding = NamedSharding(mesh, P("batch"))
    replicated = NamedSharding(mesh, P())

    def shard_env_state(state):
        return jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, batch_sharding), state)

    preprocess = (
        running_statistics.normalize if normalize_observations else ppo_networks_lib.identity_observation_preprocessor
    )
    ppo_network = network_factory(obs_size, action_size, preprocess_observations_fn=preprocess)
    make_policy = ppo_networks_lib.make_inference_fn(ppo_network)

    optimizer = optax.adam(learning_rate=learning_rate)

    key = jax.random.PRNGKey(seed)
    key, key_policy, key_value, key_env, key_eval = jax.random.split(key, 5)

    init_params = {
        "policy": ppo_network.policy_network.init(key_policy),
        "value": ppo_network.value_network.init(key_value),
    }
    training_state = TrainingState(
        optimizer_state=optimizer.init(init_params),
        params=init_params,
        normalizer_params=running_statistics.init_state(jnp.zeros(obs_size)),
        train_iters=jnp.zeros((), jnp.int32),
    )
    if restore_checkpoint_path is not None:
        from ambersim_tpu.io.checkpoint import load_params as _load

        restored = _load(restore_checkpoint_path)
        training_state = jax.tree.map(lambda t, r: jnp.asarray(r), training_state, restored)
    training_state = jax.device_put(training_state, replicated)

    # Slim rollout carry (the VERDICT r3 #10 audit, applied to training):
    # measured 519k -> 625k env steps/s on the 4096-env quadruped PPO rung.
    # See rl/wrappers.py make_slim_carry for the design.
    def generate_unroll(carry, _):
        training_state, env_state, key = carry
        policy = make_policy((training_state.normalizer_params, training_state.params["policy"]))
        to_slim, from_slim = wrappers.make_slim_carry(env_state)

        def env_step(carry, _):
            slim, key = carry
            env_state = from_slim(slim)
            key, key_sample = jax.random.split(key)
            action, extras = policy(env_state.obs, key_sample)
            next_state = env.step(env_state, action)
            transition = ppo_losses.Transition(
                observation=env_state.obs,
                action=action,
                raw_action=extras["raw_action"],
                log_prob=extras["log_prob"],
                reward=next_state.reward,
                discount=1 - next_state.done,
                truncation=next_state.info["truncation"],
                next_observation=next_state.obs,
            )
            return (to_slim(next_state), key), transition

        (slim, key), data = jax.lax.scan(
            env_step, (to_slim(env_state), key), None, length=unroll_length
        )
        return (training_state, from_slim(slim), key), data

    def minibatch_step(carry, data: ppo_losses.Transition):
        optimizer_state, params, normalizer_params, key = carry
        key, key_loss = jax.random.split(key)
        loss_fn = functools.partial(
            ppo_losses.compute_ppo_loss,
            normalizer_params=normalizer_params,
            data=data,
            rng=key_loss,
            ppo_networks=ppo_network,
            entropy_cost=entropy_cost,
            discounting=discounting,
            reward_scaling=reward_scaling,
            gae_lambda=gae_lambda,
            clipping_epsilon=clipping_epsilon,
            normalize_advantage=normalize_advantage,
        )
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, optimizer_state = optimizer.update(grads, optimizer_state, params)
        params = optax.apply_updates(params, updates)
        return (optimizer_state, params, normalizer_params, key), metrics

    def sgd_epoch(carry, _):
        optimizer_state, params, normalizer_params, data, key = carry
        key, key_perm, key_grad = jax.random.split(key, 3)
        # data: (T, total_batch, ...) with total_batch = num_unrolls * num_envs
        total_batch = num_unrolls * num_envs
        # Shard-LOCAL permutation: a single global permutation makes every
        # minibatch slice cross device boundaries, and GSPMD lowers the
        # shuffle to an all-gather of the whole rollout buffer per minibatch
        # (measured by benchmarks/multichip_audit.py — tens of MB per step at
        # bench shapes). Permuting within each device's shard and building
        # minibatches with equal per-shard representation keeps the gather
        # local (envs are iid, so this is statistically equivalent — it is
        # exactly what the reference's brax pmap design does per device).
        S = mesh.size if (total_batch % mesh.size == 0 and batch_size % mesh.size == 0) else 1
        L = total_batch // S
        perms = jax.vmap(lambda k: jax.random.permutation(k, L))(
            jax.random.split(key_perm, S)
        )  # (S, L)

        def shuffle(x):
            # (T, total, ...) -> (num_minibatches, T, batch_size, ...)
            T = x.shape[0]
            xs = x.reshape((T, S, L) + x.shape[2:])
            idx = perms.reshape((1, S, L) + (1,) * (x.ndim - 2))
            xs = jnp.take_along_axis(xs, idx, axis=2)
            xs = xs.reshape((T, S, num_minibatches, batch_size // S) + x.shape[2:])
            xs = jnp.moveaxis(xs, 2, 0)  # (mb, T, S, bs//S, ...)
            return xs.reshape((num_minibatches, T, batch_size) + x.shape[2:])

        shuffled = jax.tree.map(shuffle, data)
        (optimizer_state, params, normalizer_params, key_grad), metrics = jax.lax.scan(
            minibatch_step, (optimizer_state, params, normalizer_params, key_grad), shuffled
        )
        return (optimizer_state, params, normalizer_params, data, key), metrics

    def training_step(carry, _):
        training_state, env_state, key = carry
        key, key_sgd, key_unroll = jax.random.split(key, 3)

        (training_state, env_state, _), data = jax.lax.scan(
            generate_unroll, (training_state, env_state, key_unroll), None, length=num_unrolls
        )
        # data: (num_unrolls, T, num_envs, ...) -> time-major (T, num_envs*num_unrolls, ...)
        # ENV-major merge: folding the unroll axis INSIDE the sharded env axis
        # would interleave shards and GSPMD all-gathers the whole rollout
        # buffer to rearrange it (measured 34.7 MB/epoch at 512 envs by
        # benchmarks/multichip_audit.py). With envs outermost the merged axis
        # inherits the batch sharding and the merge is local. Column order
        # within the batch axis is immaterial downstream (each column is one
        # unroll's trajectory; the sgd shuffle re-permutes anyway).
        data = jax.tree.map(
            lambda x: jnp.moveaxis(x, 0, 2).reshape(
                (x.shape[1], num_envs * num_unrolls) + x.shape[3:]
            ),
            data,
        )

        normalizer_params = training_state.normalizer_params
        if normalize_observations:
            normalizer_params = running_statistics.update(normalizer_params, data.observation)

        (optimizer_state, params, _, _, _), metrics = jax.lax.scan(
            sgd_epoch,
            (training_state.optimizer_state, training_state.params, normalizer_params, data, key_sgd),
            None,
            length=num_updates_per_batch,
        )
        new_training_state = TrainingState(
            optimizer_state=optimizer_state,
            params=params,
            normalizer_params=normalizer_params,
            train_iters=training_state.train_iters + 1,
        )
        metrics = jax.tree.map(jnp.mean, metrics)
        return (new_training_state, env_state, key), metrics

    # Pin argument/result shardings: without them, call 1 sees uncommitted/
    # UnspecifiedValue args (fresh from env.reset + host init) while call 2
    # sees the concrete shardings of call 1's outputs — a DIFFERENT jit cache
    # key, so the entire epoch graph silently compiles twice (measured
    # ~17 s/epoch of pure recompile on the quadruped bench — the dominant
    # cost of the PPO rung before this fix).
    @functools.partial(
        jax.jit,
        in_shardings=(replicated, batch_sharding, replicated),
        out_shardings=(replicated, batch_sharding, replicated),
    )
    def training_epoch(training_state, env_state, key):
        env_state = shard_env_state(env_state)
        (training_state, env_state, _), metrics = jax.lax.scan(
            training_step, (training_state, env_state, key), None, length=num_training_steps_per_epoch
        )
        return training_state, env_state, jax.tree.map(jnp.mean, metrics)

    # ---------------- evaluation ----------------
    eval_env = wrappers.wrap_for_training(
        environment, episode_length, action_repeat, randomization_fn=eval_rand_fn
    )

    @jax.jit
    def run_evaluation(training_state, key):
        policy = make_policy(
            (training_state.normalizer_params, training_state.params["policy"]), deterministic=True
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
    key, key_envs = jax.random.split(key)
    env_keys = jax.random.split(key_envs, num_envs)

    # Audit hook (benchmarks/multichip_audit.py): compile the partitioned
    # training epoch WITHOUT running it and dump the optimized (post-GSPMD)
    # HLO — the collectives it contains are the multi-chip scaling evidence
    # when real multi-chip hardware is unavailable.
    import os as _os

    _lower_out = _os.environ.get("AMBERSIM_PPO_LOWER_ONLY")
    if _lower_out:
        state_sds = jax.eval_shape(env.reset, env_keys)
        state_sds = jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=batch_sharding), state_sds
        )
        compiled = training_epoch.lower(training_state, state_sds, key).compile()
        with open(_lower_out, "w") as f:
            f.write(compiled.as_text())
        return make_policy, (training_state.normalizer_params, training_state.params["policy"]), {
            "lowered_to": _lower_out
        }

    # Overlap the first-use compiles (the time-to-first-update lever,
    # VERDICT r4 #1): reset, the pre-training eval, and the epoch are three
    # independent jit graphs whose XLA compiles release the GIL, so a worker
    # thread compiling+running the initial eval runs concurrently with the
    # main thread's reset + epoch trace/compile. Tracing itself stays
    # effectively serial (GIL), but the engine jaxpr is shared through the
    # module-level step/forward pjit caches, so the traces are cheap; the
    # compiles — the dominant cost — overlap. Results are identical: the
    # initial eval depends only on the initial training_state.
    current_step = 0
    eval_box: list = []

    def _initial_eval():
        try:
            eval_box.append(("ok", run_evaluation(training_state, key_eval)))
        except BaseException as e:  # re-raised on the main thread
            eval_box.append(("err", e))

    env_state = jax.jit(env.reset)(env_keys)
    # Commit the initial env state to the epoch's exact input sharding:
    # jit keys its executable cache on the ACTUAL argument shardings even
    # when in_shardings is pinned, so a first call with unspecified-sharding
    # reset outputs and a second call with the epoch's own outputs compile
    # TWO identical executables (measured ~17 s/epoch extra on the
    # quadruped bench; jax 0.9.0).
    env_state = jax.device_put(env_state, batch_sharding)

    eval_thread = None
    if num_evals > 1:
        import threading

        # start after reset: its trace warmed the engine pjit caches, so the
        # eval trace is cheap and its compile overlaps the epoch's
        eval_thread = threading.Thread(target=_initial_eval, daemon=True)
        eval_thread.start()

    first_epoch = True
    for _ in range(num_evals_after_init):
        key, epoch_key = jax.random.split(key)
        training_state, env_state, train_metrics = training_epoch(training_state, env_state, epoch_key)
        if first_epoch:
            first_epoch = False
            if eval_thread is not None:
                # join AFTER dispatching the epoch: its compile overlapped the
                # eval's; report the step-0 eval before the epoch's progress
                eval_thread.join()
                status, payload = eval_box[0]
                if status == "err":
                    raise payload
                metrics = {"eval/episode_reward": float(payload)}
                progress_fn(0, metrics)

        key, key_eval = jax.random.split(key)
        episode_reward = run_evaluation(training_state, key_eval)
        # ONE batched device_get for every per-epoch scalar: each individual
        # float()/int() readback is a separate host<->device round trip,
        # which costs seconds on a tunneled TPU (measured ~20 s/epoch of
        # pure transfer overhead with the per-scalar spelling)
        host = jax.device_get(
            {"iters": training_state.train_iters, "eval": episode_reward, "train": train_metrics}
        )
        current_step = int(host["iters"]) * env_step_per_training_step
        metrics = {
            "eval/episode_reward": float(host["eval"]),
            **{f"training/{k}": float(v) for k, v in host["train"].items()},
        }
        progress_fn(current_step, metrics)
        if checkpoint_path is not None:
            from ambersim_tpu.io.checkpoint import save_params as _save

            _save(checkpoint_path, training_state)

    params = (training_state.normalizer_params, training_state.params["policy"])
    return make_policy, params, metrics
