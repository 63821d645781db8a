"""PPO trainer tests: smoke run with the reference's hyperparameter surface,
running statistics correctness, checkpoint round trip."""

import numpy as np

import jax
import jax.numpy as jnp

from ambersim_tpu.io import load_params, save_params
from ambersim_tpu.rl.pendulum import PendulumSwingupEnv
from ambersim_tpu.rl.ppo import train
from ambersim_tpu.rl.ppo import running_statistics
import pytest


def test_running_statistics_matches_numpy():
    rng = np.random.default_rng(0)
    data = rng.standard_normal((50, 4)).astype(np.float32) * 3 + 1
    state = running_statistics.init_state(jnp.zeros(4))
    state = running_statistics.update(state, jnp.asarray(data[:30]))
    state = running_statistics.update(state, jnp.asarray(data[30:]))
    np.testing.assert_allclose(np.asarray(state.mean), data.mean(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state.std), data.std(0), rtol=1e-4)
    normed = running_statistics.normalize(jnp.asarray(data), state)
    np.testing.assert_allclose(np.asarray(normed).mean(0), 0.0, atol=1e-5)


@pytest.mark.slow
def test_ppo_smoke_and_checkpoint(tmp_path):
    """Tiny-budget train run: full pipeline executes, metrics finite,
    policy usable after checkpoint round trip."""
    env = PendulumSwingupEnv()
    progress_calls = []

    make_policy, params, metrics = train(
        environment=env,
        num_timesteps=2048,
        num_evals=2,
        reward_scaling=0.1,
        episode_length=50,
        normalize_observations=True,
        action_repeat=1,
        unroll_length=8,
        num_minibatches=4,
        num_updates_per_batch=2,
        discounting=0.95,
        learning_rate=3e-4,
        entropy_cost=1e-3,
        num_envs=16,
        num_eval_envs=8,
        batch_size=16,
        seed=0,
        progress_fn=lambda step, m: progress_calls.append((step, m)),
    )
    assert len(progress_calls) == 2
    assert "eval/episode_reward" in progress_calls[-1][1]
    assert np.isfinite(progress_calls[-1][1]["eval/episode_reward"])
    assert np.isfinite(metrics["training/total_loss"])

    # checkpoint round trip (reference ex_save_and_load.py:85-114 flow)
    path = tmp_path / "params.pkl"
    save_params(path, params)
    params2 = load_params(path)
    policy = make_policy(params2, deterministic=True)
    obs = jnp.zeros(3)
    action, _ = jax.jit(policy)(obs, jax.random.PRNGKey(0))
    assert action.shape == (1,)
    assert np.all(np.abs(np.asarray(action)) <= 1.0)


@pytest.mark.slow
def test_ppo_checkpoint_resume(tmp_path):
    """Mid-training checkpoint/resume: restored state continues training."""
    env = PendulumSwingupEnv()
    ckpt = str(tmp_path / "ts.pkl")
    common = dict(
        environment=env, num_timesteps=1024, num_evals=2, episode_length=20,
        unroll_length=4, num_minibatches=2, num_updates_per_batch=1,
        num_envs=8, num_eval_envs=4, batch_size=8, seed=0,
        normalize_observations=True,
    )
    train(**common, checkpoint_path=ckpt)
    import os
    assert os.path.exists(ckpt)
    # resume: should start from the saved env_steps and keep training
    make_policy, params, metrics = train(**common, restore_checkpoint_path=ckpt)
    assert np.isfinite(metrics["eval/episode_reward"])


def test_domain_randomization_wrapper():
    """Per-env randomized models: one compilation, distinct dynamics per env
    (brax DomainRandomizationVmapWrapper semantics)."""
    from ambersim_tpu.rl.wrappers import wrap_for_training

    env = PendulumSwingupEnv()
    B = 4
    base = env.model

    def randomization_fn(model, rng=jax.random.split(jax.random.PRNGKey(3), B)):
        scale = 1.0 + 0.8 * jax.vmap(jax.random.uniform)(rng)  # mass in [1x, 1.8x]
        # batch ONLY the randomized leaf; everything else stays unbatched
        model_v = model.replace(body_mass=jnp.asarray(model.body_mass) * scale[:, None])
        in_axes = jax.tree.map(lambda _: None, model).replace(body_mass=0)
        return model_v, in_axes

    wrapped = wrap_for_training(env, episode_length=10, randomization_fn=randomization_fn)
    keys = jnp.stack([jax.random.PRNGKey(7)] * B)  # identical init state per env
    state = jax.jit(wrapped.reset)(keys)
    act = jnp.ones((B, env.action_size))
    stp = jax.jit(wrapped.step)
    for _ in range(5):
        state = stp(state, act)
    qvel = np.asarray(state.pipeline_state.qvel[:, 0])
    # same init + same action but different masses -> distinct trajectories
    assert len(np.unique(qvel)) == B, qvel


@pytest.mark.slow
def test_ppo_train_with_randomization_fn():
    """Trainer-level randomization_fn hook (brax ppo.train parity)."""
    env = PendulumSwingupEnv()

    def randomization_fn(model, rng):
        scale = 1.0 + 0.5 * jax.vmap(jax.random.uniform)(rng)
        model_v = model.replace(body_mass=jnp.asarray(model.body_mass) * scale[:, None])
        in_axes = jax.tree.map(lambda _: None, model).replace(body_mass=0)
        return model_v, in_axes

    make_policy, params, metrics = train(
        environment=env, num_timesteps=512, num_evals=1, episode_length=16,
        unroll_length=4, num_minibatches=2, num_updates_per_batch=1,
        num_envs=8, num_eval_envs=4, batch_size=8, seed=1,
        normalize_observations=True, randomization_fn=randomization_fn,
    )
    assert np.isfinite(metrics["eval/episode_reward"])
