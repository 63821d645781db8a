"""Decompose the PPO training-step wall clock on the real chip (VERDICT r3 #1).

The bench PPO rung sits at ~117k env steps/s while the raw physics rollout
runs 2.98M steps/s — a ~6.4x tax. This script times each constituent as its
own jitted program at the bench shapes (4096 envs, unroll 20, 8 unrolls,
32 minibatches x 4 epochs):

  B. bare-physics rollout at the same substep count (floor)
  A. env-stack rollout (wrapped env.step scan, policy inference, transitions)
  C. SGD phase (shuffle + 128 minibatch grad updates) on synthetic data
  D. evaluation episode (num_eval_envs x episode_length)
  E. per-epoch host readback (device_get of the metrics dict)

Each phase prints (flushed) as soon as it's measured; scan lengths are one
unroll (20 steps) — per-step cost is what matters, the bench's 160-step scan
only amortizes fixed overhead further.

Run:  python -u benchmarks/ppo_profile.py 2>&1 | tee /tmp/ppo_profile.log
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_ENVS = int(os.environ.get("BENCH_PPO_NUM_ENVS", 4096))
UNROLL = int(os.environ.get("BENCH_PPO_UNROLL", 20))
NUM_MINIBATCHES = 32
NUM_UPDATES = 4
BATCH_SIZE = max(NUM_ENVS // 4, 8)
NUM_UNROLLS = BATCH_SIZE * NUM_MINIBATCHES // NUM_ENVS
EPISODE = int(os.environ.get("BENCH_PPO_EPISODE", 500))
EVAL_ENVS = int(os.environ.get("BENCH_PPO_EVAL_ENVS", 64))
PHASES = os.environ.get("PPO_PROFILE_PHASES", "BACDE")


def _sync(x) -> float:
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0])


def _time(fn, *args, reps=3):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def say(msg):
    print(msg, flush=True)


def main():
    from ambersim_tpu.rl import wrappers
    from ambersim_tpu.rl.ppo import losses as ppo_losses
    from ambersim_tpu.rl.ppo import networks as ppo_networks_lib
    from ambersim_tpu.rl.ppo import running_statistics
    from ambersim_tpu.rl.quadruped import QuadrupedLocomotionEnv
    import optax

    environment = QuadrupedLocomotionEnv()
    env = wrappers.wrap_for_training(environment, EPISODE, 1)
    obs_size = environment.observation_size
    action_size = environment.action_size

    ppo_network = ppo_networks_lib.make_ppo_networks(
        obs_size, action_size, preprocess_observations_fn=running_statistics.normalize
    )
    make_policy = ppo_networks_lib.make_inference_fn(ppo_network)
    optimizer = optax.adam(3e-4)

    key = jax.random.PRNGKey(0)
    params = {
        "policy": ppo_network.policy_network.init(jax.random.PRNGKey(1)),
        "value": ppo_network.value_network.init(jax.random.PRNGKey(2)),
    }
    norm_params = running_statistics.init_state(jnp.zeros(obs_size))
    opt_state = optimizer.init(params)

    t0 = time.perf_counter()
    env_keys = jax.random.split(key, NUM_ENVS)
    env_state = jax.jit(env.reset)(env_keys)
    _sync(env_state.obs)
    say(f"[profile] env reset (jit+run): {time.perf_counter() - t0:.1f}s")

    n_ctrl = UNROLL  # one unroll per timed scan

    # ---- B. bare-physics floor ----
    if "B" in PHASES:
        from ambersim_tpu.engine.rollout import rollout as engine_rollout

        model = environment.model
        nsub = environment._physics_steps_per_control_step
        d0 = env_state.pipeline_state

        @jax.jit
        def bare(batch):
            return engine_rollout(model, batch, n_ctrl * nsub, batched=True)

        t_bare = _time(lambda b: bare(b).qpos, d0)
        say(
            f"B. bare physics {n_ctrl * nsub} substeps: {1e3 * t_bare:8.1f} ms"
            f"  ({NUM_ENVS * n_ctrl / t_bare:,.0f} ctrl steps/s equiv)"
        )

    # ---- A. env-stack rollout ----
    if "A" in PHASES:
        def env_step(carry, _):
            state, key = carry
            key, key_sample = jax.random.split(key)
            policy = make_policy((norm_params, params["policy"]))
            action, extras = policy(state.obs, key_sample)
            next_state = env.step(state, action)
            transition = ppo_losses.Transition(
                observation=state.obs,
                action=action,
                raw_action=extras["raw_action"],
                log_prob=extras["log_prob"],
                reward=next_state.reward,
                discount=1 - next_state.done,
                truncation=next_state.info["truncation"],
                next_observation=next_state.obs,
            )
            return (next_state, key), transition

        @jax.jit
        def rollout_phase(state, key):
            (state, _), data = jax.lax.scan(env_step, (state, key), None, length=n_ctrl)
            return state, data

        t_roll = _time(lambda s, k: rollout_phase(s, k)[0].obs, env_state, key)
        say(
            f"A. env-stack rollout {n_ctrl} ctrl steps: {1e3 * t_roll:8.1f} ms"
            f"  ({NUM_ENVS * n_ctrl / t_roll:,.0f} env steps/s)"
        )

        @jax.jit
        def rollout_notrans(state, key):
            def step_only(carry, _):
                state, key = carry
                key, key_sample = jax.random.split(key)
                policy = make_policy((norm_params, params["policy"]))
                action, _ = policy(state.obs, key_sample)
                return (env.step(state, action), key), None

            (state, _), _ = jax.lax.scan(step_only, (state, key), None, length=n_ctrl)
            return state

        t_nt = _time(lambda s, k: rollout_notrans(s, k).obs, env_state, key)
        say(
            f"A2. ... without transition outputs: {1e3 * t_nt:8.1f} ms"
            f"  ({NUM_ENVS * n_ctrl / t_nt:,.0f} env steps/s)"
        )

    # ---- C. SGD phase on synthetic data (cost is value-independent) ----
    if "C" in PHASES:
        T, TB = UNROLL, NUM_UNROLLS * NUM_ENVS
        data = ppo_losses.Transition(
            observation=jnp.zeros((T, TB, obs_size)),
            action=jnp.zeros((T, TB, action_size)),
            raw_action=jnp.zeros((T, TB, action_size)),
            log_prob=jnp.zeros((T, TB)),
            reward=jnp.zeros((T, TB)),
            discount=jnp.ones((T, TB)),
            truncation=jnp.zeros((T, TB)),
            next_observation=jnp.zeros((T, TB, obs_size)),
        )

        def minibatch_step(carry, mb):
            opt_state, params, key = carry
            key, key_loss = jax.random.split(key)
            loss_fn = functools.partial(
                ppo_losses.compute_ppo_loss,
                normalizer_params=norm_params,
                data=mb,
                rng=key_loss,
                ppo_networks=ppo_network,
                entropy_cost=1e-2,
                discounting=0.97,
                reward_scaling=1.0,
                gae_lambda=0.95,
                clipping_epsilon=0.3,
                normalize_advantage=True,
            )
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (opt_state, params, key), metrics

        @jax.jit
        def sgd_phase(opt_state, params, data, key):
            def sgd_epoch(carry, _):
                opt_state, params, key = carry
                key, key_perm, key_grad = jax.random.split(key, 3)
                perm = jax.random.permutation(key_perm, TB)

                def shuffle(x):
                    x = jnp.take(x, perm, axis=1)
                    x = x.reshape((x.shape[0], NUM_MINIBATCHES, BATCH_SIZE) + x.shape[2:])
                    return x.swapaxes(0, 1)

                shuffled = jax.tree.map(shuffle, data)
                (opt_state, params, key_grad), metrics = jax.lax.scan(
                    minibatch_step, (opt_state, params, key_grad), shuffled
                )
                return (opt_state, params, key), metrics

            (opt_state, params, _), _ = jax.lax.scan(
                sgd_epoch, (opt_state, params, key), None, length=NUM_UPDATES
            )
            return params

        t_sgd = _time(
            lambda o, p, d, k: jax.tree.leaves(sgd_phase(o, p, d, k))[0],
            opt_state, params, data, key,
        )
        say(f"C. SGD phase ({NUM_UPDATES}x{NUM_MINIBATCHES} minibatches over {T}x{TB}): {1e3 * t_sgd:8.1f} ms")

    # ---- D. evaluation ----
    if "D" in PHASES:
        @jax.jit
        def run_eval(key):
            policy = make_policy((norm_params, params["policy"]), deterministic=True)
            keys = jax.random.split(key, EVAL_ENVS)
            state = env.reset(keys)

            def step(carry, _):
                state, active, total = carry
                act, _ = policy(state.obs, jax.random.PRNGKey(0))
                state = env.step(state, act)
                total = total + state.reward * active
                active = active * (1 - state.done)
                return (state, active, total), None

            (_, _, total), _ = jax.lax.scan(
                step, (state, jnp.ones(EVAL_ENVS), jnp.zeros(EVAL_ENVS)), None, length=EPISODE
            )
            return jnp.mean(total)

        t_eval = _time(run_eval, jax.random.PRNGKey(3))
        say(f"D. eval episode ({EVAL_ENVS} envs x {EPISODE} steps): {1e3 * t_eval:8.1f} ms")

    # ---- E. host readback ----
    if "E" in PHASES:
        metrics_dev = {
            "iters": jnp.ones((), jnp.int32),
            "eval": jnp.ones(()),
            "train": {f"k{i}": jnp.ones(()) for i in range(8)},
        }
        t0 = time.perf_counter()
        for _ in range(3):
            jax.device_get(metrics_dev)
        t_get = (time.perf_counter() - t0) / 3
        say(f"E. per-epoch device_get of metrics: {1e3 * t_get:8.1f} ms")


if __name__ == "__main__":
    main()
