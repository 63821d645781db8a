"""SAC stack tests: replay-buffer semantics, twin-Q network contract,
loss gradients, and a tiny-budget end-to-end train run (slow)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ambersim_tpu.rl.sac import losses as sac_losses
from ambersim_tpu.rl.sac import make_sac_networks, make_inference_fn, train
from ambersim_tpu.rl.sac import replay


def test_replay_ring_buffer_semantics():
    state = replay.init(8, {"x": jnp.zeros(2)})
    batch = {"x": jnp.arange(10.0).reshape(5, 2)}
    state = replay.insert(state, batch)
    assert int(state.size) == 5 and int(state.insert_position) == 5
    # second insert wraps: slots 5,6,7,0,1 overwritten
    state = replay.insert(state, jax.tree.map(lambda x: x + 100, batch))
    assert int(state.size) == 8 and int(state.insert_position) == 2
    np.testing.assert_allclose(np.asarray(state.data["x"][0]), [106.0, 107.0])
    np.testing.assert_allclose(np.asarray(state.data["x"][2]), [4.0, 5.0])  # survivor
    sampled = replay.sample(state, jax.random.PRNGKey(0), 16)
    assert sampled["x"].shape == (16, 2)


def test_twin_q_network_and_policy_shapes():
    nets = make_sac_networks(observation_size=3, action_size=2)
    key = jax.random.PRNGKey(0)
    qp = nets.q_network.init(key)
    obs = jnp.ones((7, 3))
    act = jnp.ones((7, 2))
    q = nets.q_network.apply(None, qp, obs, act)
    assert q.shape == (7, 2)  # (batch, n_critics)
    # twin heads are independently initialized
    assert not np.allclose(np.asarray(q[:, 0]), np.asarray(q[:, 1]))
    pp = nets.policy_network.init(key)
    policy = make_inference_fn(nets)((None, pp), deterministic=True)
    a, _ = policy(obs, key)
    assert a.shape == (7, 2)
    assert np.all(np.abs(np.asarray(a)) <= 1.0)  # tanh-squashed


def test_sac_losses_finite_grads():
    nets = make_sac_networks(observation_size=3, action_size=2)
    key = jax.random.PRNGKey(1)
    kp, kq, kt = jax.random.split(key, 3)
    pp, qp = nets.policy_network.init(kp), nets.q_network.init(kq)
    n = 16
    trans = sac_losses.Transition(
        observation=jax.random.normal(kt, (n, 3)),
        action=jax.random.normal(kt, (n, 2)),
        reward=jnp.ones(n),
        discount=jnp.ones(n),
        truncation=jnp.zeros(n),
        next_observation=jax.random.normal(kp, (n, 3)),
    )
    closs, cg = jax.value_and_grad(sac_losses.critic_loss)(
        qp, pp, None, qp, jnp.asarray(0.2), trans, key,
        sac_networks=nets, reward_scaling=1.0, discounting=0.99,
    )
    ploss, pg = jax.value_and_grad(sac_losses.actor_loss)(
        pp, qp, None, jnp.asarray(0.2), trans, key, sac_networks=nets
    )
    aloss, ag = jax.value_and_grad(sac_losses.alpha_loss)(
        jnp.zeros(()), pp, None, trans, key, sac_networks=nets, target_entropy=-1.0
    )
    for v in (closs, ploss, aloss, ag):
        assert np.isfinite(np.asarray(v)).all()
    for g in jax.tree.leaves(cg) + jax.tree.leaves(pg):
        assert np.isfinite(np.asarray(g)).all()
    # truncated transitions drop out of the TD loss entirely
    trans_tr = trans.replace(truncation=jnp.ones(n))
    closs_tr = sac_losses.critic_loss(
        qp, pp, None, qp, jnp.asarray(0.2), trans_tr, key,
        sac_networks=nets, reward_scaling=1.0, discounting=0.99,
    )
    assert float(closs_tr) == 0.0


@pytest.mark.slow
def test_sac_smoke_and_checkpoint(tmp_path):
    """Tiny-budget SAC run on pendulum swingup: pipeline executes end to end,
    metrics finite, checkpoint written and restorable."""
    from ambersim_tpu.rl.pendulum import PendulumSwingupEnv

    progress_calls = []
    ckpt = str(tmp_path / "sac_ckpt.pkl")
    make_policy, params, metrics = train(
        environment=PendulumSwingupEnv(),
        num_timesteps=512,
        episode_length=32,
        num_envs=8,
        num_eval_envs=8,
        batch_size=32,
        min_replay_size=64,
        max_replay_size=2048,
        grad_updates_per_step=2,
        num_evals=2,
        normalize_observations=True,
        learning_rate=3e-4,
        discounting=0.95,
        seed=0,
        checkpoint_path=ckpt,
        progress_fn=lambda step, m: progress_calls.append((step, m)),
    )
    assert len(progress_calls) == 2
    assert np.isfinite(progress_calls[-1][1]["eval/episode_reward"])
    assert np.isfinite(metrics["training/critic_loss"])

    policy = make_policy(params, deterministic=True)
    act, _ = policy(jnp.zeros((1, 3)), jax.random.PRNGKey(0))
    assert act.shape == (1, 1)

    # restore resumes from the written checkpoint
    make_policy2, params2, _ = train(
        environment=PendulumSwingupEnv(),
        num_timesteps=128,
        episode_length=16,
        num_envs=8,
        num_eval_envs=8,
        batch_size=16,
        min_replay_size=16,
        max_replay_size=512,
        num_evals=1,
        seed=1,
        restore_checkpoint_path=ckpt,
    )
    act2, _ = make_policy2(params2, deterministic=True)(jnp.zeros((1, 3)), jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(act2)).all()
