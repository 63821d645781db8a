"""ARS trainer tests: the V2-t update rule on a quadratic toy (selection +
reward-std scaling), and a tiny-budget end-to-end run (slow)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _ars_update(x, target, key, n_dirs=32, top_b=8, sigma=0.1, alpha=0.05):
    """One ARS V2-t step on f(x) = -|x - target|^2 (mirrors rl/ars/train.py)."""
    deltas = jax.random.normal(key, (n_dirs,) + x.shape)
    rp = -jnp.sum((x[None] + sigma * deltas - target) ** 2, axis=-1)
    rm = -jnp.sum((x[None] - sigma * deltas - target) ** 2, axis=-1)
    scores = jnp.maximum(rp, rm)
    _, top = jax.lax.top_k(scores, top_b)
    rps, rms = rp[top], rm[top]
    std = jnp.maximum(jnp.std(jnp.concatenate([rps, rms])), 1e-6)
    return x + alpha / (top_b * std) * jnp.tensordot(rps - rms, deltas[top], axes=1)


def test_ars_update_descends_quadratic():
    target = jnp.array([1.0, -2.0, 0.5])
    x = jnp.zeros(3)
    key = jax.random.PRNGKey(0)
    d0 = float(jnp.linalg.norm(x - target))
    for i in range(60):
        key, k = jax.random.split(key)
        x = _ars_update(x, target, k)
    d1 = float(jnp.linalg.norm(x - target))
    assert d1 < 0.25 * d0


def test_ars_validates_top_directions():
    from ambersim_tpu.rl.ars import train
    from ambersim_tpu.rl.pendulum import PendulumSwingupEnv

    with pytest.raises(ValueError):
        train(PendulumSwingupEnv(), number_of_directions=4, top_directions=8, policy_updates=1)


@pytest.mark.slow
def test_ars_smoke_pendulum():
    """Tiny-budget ARS run on pendulum swingup: executes end to end with
    normalization on, metrics finite, returned policy bounded."""
    from ambersim_tpu.rl.ars import train
    from ambersim_tpu.rl.pendulum import PendulumSwingupEnv

    progress = []
    make_policy, params, metrics = train(
        environment=PendulumSwingupEnv(),
        episode_length=24,
        number_of_directions=8,
        top_directions=4,
        step_size=0.02,
        exploration_noise_std=0.05,
        num_eval_envs=8,
        policy_updates=4,
        num_evals=2,
        normalize_observations=True,
        seed=0,
        progress_fn=lambda step, m: progress.append((step, m)),
    )
    assert len(progress) == 2
    assert np.isfinite(metrics["eval/episode_reward"])
    assert np.isfinite(metrics["training/fitness_mean"])
    act, _ = make_policy(params, deterministic=True)(jnp.zeros((1, 3)), jax.random.PRNGKey(0))
    assert np.all(np.abs(np.asarray(act)) <= 1.0)
