"""MLP tests (mirrors reference tests/test_mlp.py:11-76: shape, exact
parameter count, pickle round-trip determinism)."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np

from ambersim_tpu.learning import MLP


def test_shapes_and_param_count():
    sizes = (16, 32, 8)
    mlp = MLP(layer_sizes=sizes)
    params = mlp.init(jax.random.PRNGKey(0), jnp.zeros((1, 5)))
    out = mlp.apply(params, jnp.zeros((7, 5)))
    assert out.shape == (7, 8)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    expected = (5 * 16 + 16) + (16 * 32 + 32) + (32 * 8 + 8)
    assert n_params == expected


def test_no_bias_param_count():
    mlp = MLP(layer_sizes=(4, 2), bias=False)
    params = mlp.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    assert sum(x.size for x in jax.tree.leaves(params)) == 3 * 4 + 4 * 2


def test_pickle_round_trip():
    mlp = MLP(layer_sizes=(8, 8, 2), activate_final=False)
    params = mlp.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 3))
    y = mlp.apply(params, x)
    mlp2 = pickle.loads(pickle.dumps(mlp))
    y2 = mlp2.apply(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2))
