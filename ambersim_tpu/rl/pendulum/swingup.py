"""Pendulum swingup task (reference: ambersim/rl/pendulum/swingup.py:14-123).

Task semantics match the reference exactly: observation (cos q, sin q, qd);
reward -(w_q * wrap(q - pi)^2 + w_qd * qd^2 + w_u * u^2); uniform random
initialization; optional Gaussian observation noise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ambersim_tpu import ROOT
from ambersim_tpu.rl.base import MjxEnv, State
from ambersim_tpu.utils.io_utils import load_model_from_file


@struct.dataclass
class PendulumSwingupConfig:
    """Config for the swingup task (cf. reference swingup.py:15-36)."""

    model_path: str = struct.field(pytree_node=False, default=ROOT + "/models/pendulum/pendulum.xml")
    # reward weights
    q_weight: float = 1.0
    qd_weight: float = 0.1
    u_weight: float = 0.001
    # initial state ranges
    q_init_min: float = -3.14159
    q_init_max: float = 3.14159
    qd_init_min: float = -1.0
    qd_init_max: float = 1.0
    # observation noise std (0 disables)
    obs_noise_std: float = 0.0
    physics_steps_per_control_step: int = 1


class PendulumSwingupEnv(MjxEnv):
    """Swing the torque-limited pendulum upright (cf. reference swingup.py:39-123)."""

    def __init__(self, config: PendulumSwingupConfig | None = None):
        self.config = config or PendulumSwingupConfig()
        model = load_model_from_file(self.config.model_path)
        super().__init__(model, self.config.physics_steps_per_control_step)

    def compute_obs(self, data, info):
        q, qd = data.qpos[0], data.qvel[0]
        obs = jnp.array([jnp.cos(q), jnp.sin(q), qd])
        if self.config.obs_noise_std > 0 and "rng" in info:
            rng, sub = jax.random.split(info["rng"])
            obs = obs + self.config.obs_noise_std * jax.random.normal(sub, obs.shape)
            info["rng"] = rng
        return obs

    def compute_reward(self, data, info):
        q, qd = data.qpos[0], data.qvel[0]
        u = data.ctrl[0]
        # wrap angle error to (-pi, pi] around the upright position
        err = jnp.mod(q - jnp.pi, 2 * jnp.pi)
        err = jnp.where(err > jnp.pi, err - 2 * jnp.pi, err)
        c = self.config
        return -(c.q_weight * err**2 + c.qd_weight * qd**2 + c.u_weight * u**2)

    def reset(self, rng: jax.Array) -> State:
        rng, rq, rqd = jax.random.split(rng, 3)
        c = self.config
        qpos = jax.random.uniform(rq, (self.model.nq,), minval=c.q_init_min, maxval=c.q_init_max)
        qvel = jax.random.uniform(rqd, (self.model.nv,), minval=c.qd_init_min, maxval=c.qd_init_max)
        data = self.pipeline_init(qpos, qvel)
        info = {"rng": rng, "step": jnp.zeros(())}
        obs = self.compute_obs(data, info)
        reward, done = jnp.zeros(()), jnp.zeros(())
        metrics = {"reward": reward}
        return State(data, obs, reward, done, metrics, info)

    def step(self, state: State, action: jax.Array) -> State:
        data = self.pipeline_step(state.pipeline_state, action)
        obs = self.compute_obs(data, state.info)
        reward = self.compute_reward(data, state.info)
        done = jnp.zeros(())
        state.metrics.update(reward=reward)
        state.info.update(step=state.info["step"] + 1)
        return state.replace(pipeline_state=data, obs=obs, reward=reward, done=done)
