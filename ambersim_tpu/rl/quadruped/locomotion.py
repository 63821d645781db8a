"""Quadruped velocity-tracking locomotion task (contact-rich PPO benchmark,
BASELINE.md config 4: "Quadruped (Unitree-class) PPO training, 4096 envs").

Standard velocity-command locomotion reward shaped like the common
Unitree/anymal RL recipes: track a forward velocity command, stay upright,
penalize energy and vertical/angular motion; terminate on falls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ambersim_tpu import ROOT
from ambersim_tpu.rl.base import MjxEnv, State
from ambersim_tpu.utils.io_utils import load_model_from_file


@struct.dataclass
class QuadrupedLocomotionConfig:
    model_path: str = struct.field(pytree_node=False, default=ROOT + "/models/quadruped/quadruped.xml")
    # commanded forward velocity (m/s)
    target_vel: float = 0.5
    # reward weights
    vel_weight: float = 2.0
    upright_weight: float = 0.5
    height_weight: float = 1.0
    energy_weight: float = 2e-4
    lateral_weight: float = 0.5
    angvel_weight: float = 0.05
    action_scale: float = 0.4
    # termination
    min_height: float = 0.12
    max_tilt: float = 0.6  # max |1 - quat_w-ish| tilt proxy
    # init noise
    joint_noise: float = 0.08
    physics_steps_per_control_step: int = 4


class QuadrupedLocomotionEnv(MjxEnv):
    """Track a forward velocity command on flat ground."""

    def __init__(self, config: QuadrupedLocomotionConfig | None = None):
        self.config = config or QuadrupedLocomotionConfig()
        model = load_model_from_file(self.config.model_path)
        super().__init__(model, self.config.physics_steps_per_control_step)
        import numpy as np

        self._default_pose = np.asarray(model.qpos0)[7:]

    def compute_obs(self, data, info):
        # base orientation (gravity direction in body frame), base velocities,
        # joint positions (offset from stand), joint velocities, last action
        from ambersim_tpu.core import math as am

        quat = data.qpos[3:7]
        gravity_body = am.rotate_inv(jnp.array([0.0, 0.0, -1.0]), quat)
        lin_vel = am.rotate_inv(data.qvel[:3], quat)  # translation dofs: world frame
        ang_vel = data.qvel[3:6]  # free-joint rotation dofs are already body-frame
        return jnp.concatenate(
            [
                gravity_body,
                lin_vel,
                ang_vel,
                data.qpos[7:] - jnp.asarray(self._default_pose),
                data.qvel[6:] * 0.1,
                info.get("last_action", jnp.zeros(self.model.nu)),
            ]
        )

    def compute_reward(self, data, info):
        c = self.config
        vx = data.qvel[0]
        vel_r = c.vel_weight * jnp.exp(-4.0 * (vx - c.target_vel) ** 2)
        # upright: world z axis of the body
        from ambersim_tpu.core import math as am

        up = am.rotate(jnp.array([0.0, 0.0, 1.0]), data.qpos[3:7])
        upright_r = c.upright_weight * up[2]
        height_pen = -c.height_weight * (data.qpos[2] - 0.27) ** 2
        energy_pen = -c.energy_weight * jnp.sum(data.actuator_force**2)
        lateral_pen = -c.lateral_weight * (data.qvel[1] ** 2 + 0.3 * data.qvel[2] ** 2)
        angvel_pen = -c.angvel_weight * jnp.sum(data.qvel[3:6] ** 2)
        return vel_r + upright_r + height_pen + energy_pen + lateral_pen + angvel_pen

    def _done(self, data):
        c = self.config
        from ambersim_tpu.core import math as am

        up = am.rotate(jnp.array([0.0, 0.0, 1.0]), data.qpos[3:7])
        fallen = (data.qpos[2] < c.min_height) | (up[2] < 1.0 - c.max_tilt)
        return fallen.astype(jnp.float32)

    def reset(self, rng: jax.Array) -> State:
        c = self.config
        rng, r1, r2 = jax.random.split(rng, 3)
        qpos = jnp.asarray(self.model.qpos0)
        qpos = qpos.at[7:].add(c.joint_noise * jax.random.normal(r1, (self.model.nu,)))
        qvel = jnp.zeros(self.model.nv).at[:6].add(0.05 * jax.random.normal(r2, (6,)))
        data = self.pipeline_init(qpos, qvel)
        info = {"rng": rng, "last_action": jnp.zeros(self.model.nu)}
        obs = self.compute_obs(data, info)
        return State(data, obs, jnp.zeros(()), jnp.zeros(()), {"reward": jnp.zeros(())}, info)

    def step(self, state: State, action: jax.Array) -> State:
        c = self.config
        # action = offset from the standing pose, PD-converted to torques by
        # the position-style mapping (kp on the motor side keeps ctrl small)
        target = jnp.asarray(self._default_pose) + c.action_scale * action
        data = state.pipeline_state
        kp, kd = 24.0, 0.8
        ctrl = kp * (target - data.qpos[7:]) - kd * data.qvel[6:]
        data = self.pipeline_step(data, ctrl)
        state.info.update(last_action=action)
        obs = self.compute_obs(data, state.info)
        reward = self.compute_reward(data, state.info)
        done = self._done(data)
        state.metrics.update(reward=reward)
        return state.replace(pipeline_state=data, obs=obs, reward=reward, done=done)
