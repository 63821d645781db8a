"""Env layer tests: pendulum swingup semantics, wrappers, registry."""

import jax
import jax.numpy as jnp
import numpy as np

from ambersim_tpu.rl import get_environment, register_environment
from ambersim_tpu.rl.pendulum import PendulumSwingupConfig, PendulumSwingupEnv
from ambersim_tpu.rl.wrappers import wrap_for_training
import pytest


def test_env_reset_step():
    env = PendulumSwingupEnv()
    assert env.observation_size == 3
    assert env.action_size == 1
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert state.obs.shape == (3,)
    np.testing.assert_allclose(
        state.obs[0] ** 2 + state.obs[1] ** 2, 1.0, atol=1e-5
    )  # (cos, sin) consistent
    state2 = jax.jit(env.step)(state, jnp.array([0.5]))
    assert float(state2.reward) <= 0.0  # quadratic cost is non-positive
    assert float(state2.pipeline_state.time) > 0.0


def test_reward_max_at_upright():
    env = PendulumSwingupEnv()
    state = env.reset(jax.random.PRNGKey(0))
    up = state.pipeline_state.replace(
        qpos=jnp.array([jnp.pi]), qvel=jnp.zeros(1), ctrl=jnp.zeros(1)
    )
    assert abs(float(env.compute_reward(up, {}))) < 1e-8
    down = up.replace(qpos=jnp.zeros(1))
    assert float(env.compute_reward(down, {})) < -9.0  # ~ -pi^2


def test_wrappers_autoreset_and_episode():
    env = wrap_for_training(PendulumSwingupEnv(), episode_length=5)
    rng = jax.random.split(jax.random.PRNGKey(0), 4)
    state = jax.jit(env.reset)(rng)
    assert state.obs.shape == (4, 3)
    step = jax.jit(env.step)
    for i in range(5):
        state = step(state, jnp.zeros((4, 1)))
    np.testing.assert_array_equal(np.asarray(state.done), np.ones(4))  # episode end
    state = step(state, jnp.zeros((4, 1)))
    np.testing.assert_array_equal(np.asarray(state.done), np.zeros(4))  # auto-reset


def test_registry():
    register_environment("pendulum_swingup", PendulumSwingupEnv)
    env = get_environment("pendulum_swingup")
    assert isinstance(env, PendulumSwingupEnv)
    try:
        get_environment("nope")
        assert False
    except KeyError:
        pass


@pytest.mark.slow
def test_engine_rollout_matches_step_loop():
    """engine.rollout's minimal-carry scan must equal explicit stepping."""
    from ambersim_tpu.engine import make_data, step
    from ambersim_tpu.engine.rollout import rollout
    from ambersim_tpu.utils.io_utils import load_model_from_file

    m = load_model_from_file("models/cartpole/cartpole.xml")
    d = make_data(m).replace(qpos=jnp.array([0.1, 2.0]))
    ctrl_fn = lambda dd: 0.5 * jnp.ones(1)  # noqa: E731
    out = jax.jit(lambda d: rollout(m, d, 50, ctrl_fn=ctrl_fn))(d)
    ref = d
    stepper = jax.jit(lambda dd: step(m, dd.replace(ctrl=jnp.array([0.5]))))
    for _ in range(50):
        ref = stepper(ref)
    np.testing.assert_allclose(np.asarray(out.qpos), np.asarray(ref.qpos), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.qvel), np.asarray(ref.qvel), rtol=1e-5, atol=1e-5)

    # batched
    batch = jax.vmap(lambda q: make_data(m).replace(qpos=q))(jnp.linspace(0, 1, 4)[:, None] * jnp.ones(2))
    outb = jax.jit(lambda b: rollout(m, b, 10, batched=True))(batch)
    assert outb.qpos.shape == (4, 2)


def test_state_streamer_single_transfer():
    from ambersim_tpu.engine import make_data
    from ambersim_tpu.utils.io_utils import load_model_from_file
    from ambersim_tpu.viewer import StateStreamer

    m = load_model_from_file("models/quadruped/quadruped.xml")
    batch = jax.vmap(lambda i: make_data(m))(jnp.arange(64))
    batch = batch.replace(qpos=batch.qpos.at[:, 2].add(jnp.arange(64) * 0.01))
    streamer = StateStreamer(m, env_indices=[0, 7, 63])
    qpos, qvel = streamer.fetch(batch)
    assert qpos.shape == (3, m.nq) and qvel.shape == (3, m.nv)
    np.testing.assert_allclose(qpos[1, 2] - qpos[0, 2], 0.07, atol=1e-6)
    np.testing.assert_allclose(qpos[2, 2] - qpos[0, 2], 0.63, atol=1e-5)


def test_domain_randomization_vmap_over_model():
    """Numeric model params are traced leaves: vmap over per-env body masses
    (domain randomization) without recompilation (types.py design note)."""
    from ambersim_tpu.engine import make_data, step
    from ambersim_tpu.utils.io_utils import load_model_from_file

    m = load_model_from_file("models/pendulum/pendulum.xml")
    B = 8
    masses = jnp.stack([jnp.asarray(m.body_mass) * s for s in jnp.linspace(0.5, 2.0, B)])
    models = jax.vmap(lambda mass: m.replace(body_mass=mass))(masses)
    batch = jax.vmap(lambda i: make_data(m).replace(qpos=jnp.array([1.0]), ctrl=jnp.array([1.0])))(jnp.arange(B))

    @jax.jit
    def stepped(models, batch):
        return jax.vmap(step)(models, batch)

    out = stepped(models, batch)
    accs = np.asarray(out.qvel[:, 0])
    # each env sees different dynamics; with fixed torque, heavier pendulums
    # fall harder toward gravity (monotone more-negative qvel)
    assert np.all(np.diff(accs) < 0), accs
    assert len(np.unique(accs)) == B


@pytest.mark.slow
def test_quadruped_terrain_env():
    """Terrain locomotion env: programmatic hfield scene builds, the stand
    pose survives 60 PD control steps on rough ground, and the env batches."""
    from ambersim_tpu.rl import get_environment

    env = get_environment("quadruped_terrain")
    st = jax.jit(env.reset)(jax.random.PRNGKey(0))
    stp = jax.jit(env.step)
    for i in range(60):
        st = stp(st, 0.1 * jnp.sin(0.3 * i) * jnp.ones(env.action_size))
    assert float(st.done) == 0.0  # still standing on the terrain
    assert 0.15 < float(st.pipeline_state.qpos[2]) < 0.4
    stB = jax.jit(jax.vmap(env.reset))(jax.random.split(jax.random.PRNGKey(1), 64))
    stB = jax.jit(jax.vmap(env.step))(stB, jnp.zeros((64, env.action_size)))
    assert stB.obs.shape == (64, env.observation_size)


@pytest.mark.slow
def test_humanoid_balance_env():
    """Balance env: registered, standing survives 60 zero-action control
    steps (the PD mapping routes actuators through the skeleton's
    transmission tables — actuator order != qpos order on this model), falls
    terminate, and the env batches."""
    from ambersim_tpu.rl import get_environment

    env = get_environment("humanoid_balance")
    st = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert st.obs.shape == (env.observation_size,)
    stp = jax.jit(env.step)
    for _ in range(60):
        st = stp(st, jnp.zeros(env.action_size))
    assert float(st.done) == 0.0  # PD hold keeps it upright
    assert 0.6 < float(st.pipeline_state.qpos[2]) < 0.9
    # knock it over: large constant action saturates into a fall
    st2 = jax.jit(env.reset)(jax.random.PRNGKey(1))
    for _ in range(120):
        st2 = stp(st2, jnp.ones(env.action_size))
    assert float(st2.done) == 1.0 or float(st2.pipeline_state.qpos[2]) < 0.6
    stB = jax.jit(jax.vmap(env.reset))(jax.random.split(jax.random.PRNGKey(2), 32))
    stB = jax.jit(jax.vmap(env.step))(stB, jnp.zeros((32, env.action_size)))
    assert stB.obs.shape == (32, env.observation_size)
