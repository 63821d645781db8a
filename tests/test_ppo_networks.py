"""PPO network contract tests (mirrors reference tests/test_ppo_networks.py:
14-90: size-mismatch raises, pickle round-trip preserving structure)."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ambersim_tpu.learning import MLP
from ambersim_tpu.rl.helpers import PPONetworksWrapper
from ambersim_tpu.rl.ppo.distributions import NormalTanhDistribution
from ambersim_tpu.rl.ppo.networks import make_inference_fn


def test_output_size_validation():
    # action_size=2 -> param_size=4; policy outputs 3 -> mismatch
    wrapper = PPONetworksWrapper(
        policy_network=MLP(layer_sizes=(16, 3)),
        value_network=MLP(layer_sizes=(16, 1)),
        action_distribution=NormalTanhDistribution,
    )
    with pytest.raises(ValueError):
        wrapper.make_ppo_networks(observation_size=3, action_size=2)

    wrapper_bad_value = PPONetworksWrapper(
        policy_network=MLP(layer_sizes=(16, 4)),
        value_network=MLP(layer_sizes=(16, 2)),
        action_distribution=NormalTanhDistribution,
    )
    with pytest.raises(ValueError):
        wrapper_bad_value.make_ppo_networks(observation_size=3, action_size=2)


def test_pickle_round_trip_inference():
    wrapper = PPONetworksWrapper(
        policy_network=MLP(layer_sizes=(16, 2)),
        value_network=MLP(layer_sizes=(16, 1)),
        action_distribution=NormalTanhDistribution,
    )
    networks = wrapper.make_ppo_networks(observation_size=3, action_size=1)
    params = networks.policy_network.init(jax.random.PRNGKey(0))
    norm_params = None

    wrapper2 = pickle.loads(pickle.dumps(wrapper))
    networks2 = wrapper2.make_ppo_networks(observation_size=3, action_size=1)

    obs = jax.random.normal(jax.random.PRNGKey(1), (4, 3))
    policy = make_inference_fn(networks)((norm_params, params), deterministic=True)
    policy2 = make_inference_fn(networks2)((norm_params, params), deterministic=True)
    a1, _ = policy(obs, jax.random.PRNGKey(2))
    a2, _ = policy2(obs, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))
    assert np.all(np.abs(np.asarray(a1)) <= 1.0)  # tanh squash


def test_distribution_basics():
    dist = NormalTanhDistribution(event_size=2)
    assert dist.param_size == 4
    params = jnp.array([0.3, -0.2, 0.0, 0.5])
    s = dist.sample(params, jax.random.PRNGKey(0))
    assert s.shape == (2,) and np.all(np.abs(np.asarray(s)) < 1.0)
    mode = dist.mode(params)
    np.testing.assert_allclose(np.asarray(mode), np.tanh([0.3, -0.2]), atol=1e-6)
    raw = dist.sample_no_postprocessing(params, jax.random.PRNGKey(0))
    lp = dist.log_prob(params, raw)
    assert np.isfinite(float(lp))
