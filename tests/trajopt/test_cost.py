"""Quadratic cost tests (mirrors reference tests/trajopt/test_cost.py:10-55:
cost vs loop ground truth, analytic grad/hess vs autodiff via super())."""

import jax
import jax.numpy as jnp
import numpy as np

from ambersim_tpu.trajopt.base import CostFunction
from ambersim_tpu.trajopt.cost import StaticGoalQuadraticCost


def _make_cost(n=3, m=2, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    Q = jnp.asarray(A @ A.T + n * np.eye(n), jnp.float32)
    B = rng.standard_normal((n, n))
    Qf = jnp.asarray(B @ B.T + n * np.eye(n), jnp.float32)
    C = rng.standard_normal((m, m))
    R = jnp.asarray(C @ C.T + m * np.eye(m), jnp.float32)
    xg = jnp.asarray(rng.standard_normal(n), jnp.float32)
    return StaticGoalQuadraticCost(Q=Q, Qf=Qf, R=R, xg=xg)


def test_cost_vs_loop():
    cost = _make_cost()
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.standard_normal((6, 3)), jnp.float32)
    us = jnp.asarray(rng.standard_normal((5, 2)), jnp.float32)
    expected = 0.0
    for k in range(5):
        dx = np.asarray(xs[k] - cost.xg)
        expected += dx @ np.asarray(cost.Q) @ dx
        expected += np.asarray(us[k]) @ np.asarray(cost.R) @ np.asarray(us[k])
    dx = np.asarray(xs[-1] - cost.xg)
    expected += dx @ np.asarray(cost.Qf) @ dx
    np.testing.assert_allclose(float(cost.cost(xs, us)), expected, rtol=1e-4)


def test_analytic_grad_matches_autodiff():
    cost = _make_cost(seed=2)
    rng = np.random.default_rng(3)
    xs = jnp.asarray(rng.standard_normal((6, 3)), jnp.float32)
    us = jnp.asarray(rng.standard_normal((5, 2)), jnp.float32)
    gx, gu = cost.grad(xs, us)
    gx_ad, gu_ad = CostFunction.grad(cost, xs, us)  # autodiff default via parent
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ad), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(gu_ad), rtol=1e-4, atol=1e-5)


def test_analytic_hess_matches_autodiff():
    cost = _make_cost(seed=4)
    rng = np.random.default_rng(5)
    xs = jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)
    us = jnp.asarray(rng.standard_normal((3, 2)), jnp.float32)
    hxx, huu, hxu = cost.hess(xs, us)
    hxx_ad, huu_ad, hxu_ad = CostFunction.hess(cost, xs, us)
    np.testing.assert_allclose(np.asarray(hxx), np.asarray(hxx_ad), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(huu), np.asarray(huu_ad), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hxu), np.asarray(hxu_ad), rtol=1e-4, atol=1e-5)
