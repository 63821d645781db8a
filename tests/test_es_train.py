"""ES trainer tests: fitness shaping, antithetic update direction on a
quadratic toy, and a tiny-budget end-to-end run (slow)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ambersim_tpu.rl.es import centered_rank, train


def test_centered_rank_shaping():
    f = jnp.array([10.0, -3.0, 5.0, 1000.0])
    w = np.asarray(centered_rank(f))
    # rank order preserved, range [-0.5, 0.5], zero-sum, outlier-robust
    assert w.argmax() == 3 and w.argmin() == 1
    np.testing.assert_allclose(w.sum(), 0.0, atol=1e-6)
    np.testing.assert_allclose(sorted(w), [-0.5, -1 / 6, 1 / 6, 0.5], atol=1e-6)


def test_es_ascends_quadratic_fitness():
    """The core ES estimator (antithetic noise + centered ranks) must move a
    parameter vector toward the optimum of f(x) = -|x - x*|^2."""
    target = jnp.array([1.0, -2.0, 0.5])
    x = jnp.zeros(3)
    key = jax.random.PRNGKey(0)
    sigma, lr, pop = 0.1, 0.5, 64
    for _ in range(150):
        key, kn = jax.random.split(key)
        eps_half = jax.random.normal(kn, (pop // 2, 3))
        eps = jnp.concatenate([eps_half, -eps_half])
        fitness = -jnp.sum((x[None] + sigma * eps - target) ** 2, axis=-1)
        w = centered_rank(fitness)
        g = jnp.tensordot(w, eps, axes=1) / (pop * sigma)
        x = x + lr * g
        # rank weights have constant magnitude near the optimum, so the
        # iterate orbits at a radius ~ lr*|g|; decay lr to collapse the orbit
        lr *= 0.98
    assert float(jnp.linalg.norm(x - target)) < 0.2


@pytest.mark.slow
def test_es_smoke_pendulum():
    """Tiny-budget ES run on pendulum swingup: executes end to end, fitness
    metrics finite, returned policy bounded."""
    progress = []
    make_policy, params, metrics = train(
        environment=__import__(
            "ambersim_tpu.rl.pendulum", fromlist=["PendulumSwingupEnv"]
        ).PendulumSwingupEnv(),
        episode_length=24,
        population_size=16,
        perturbation_std=0.05,
        learning_rate=0.02,
        num_eval_envs=8,
        policy_updates=4,
        num_evals=2,
        seed=0,
        progress_fn=lambda step, m: progress.append((step, m)),
    )
    assert len(progress) == 2
    assert np.isfinite(metrics["eval/episode_reward"])
    assert np.isfinite(metrics["training/fitness_mean"])
    act, _ = make_policy(params, deterministic=True)(jnp.zeros((1, 3)), jax.random.PRNGKey(0))
    assert np.all(np.abs(np.asarray(act)) <= 1.0)
