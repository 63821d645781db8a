"""Humanoid balance task (contact-rich PPO benchmark, BASELINE.md config 5:
"Bipedal humanoid/exoskeleton lab model: contact-rich PPO ...").

Stand upright under randomized initial pose/velocity perturbations: keep the
pelvis at nominal height, the torso vertical, and the base still, with energy
and action-rate shaping; terminate on falls. The action is a joint-position
offset from the standing pose, converted to motor torques by a per-joint PD
mapping (the actuator order differs from the qpos order on this model, so the
mapping goes through the skeleton's transmission tables).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ambersim_tpu import ROOT
from ambersim_tpu.rl.base import MjxEnv, State
from ambersim_tpu.utils.io_utils import load_model_from_file


@struct.dataclass
class HumanoidBalanceConfig:
    model_path: str = struct.field(pytree_node=False, default=ROOT + "/models/humanoid/humanoid.xml")
    # reward weights
    upright_weight: float = 1.0
    height_weight: float = 2.0
    still_weight: float = 0.4
    pose_weight: float = 0.3
    energy_weight: float = 5e-5
    action_rate_weight: float = 0.05
    alive_bonus: float = 1.0
    # geometry
    stand_height: float = 0.75
    # termination
    min_height: float = 0.45
    max_tilt: float = 0.5  # terminate when torso up-z drops below 1 - max_tilt
    # init noise
    joint_noise: float = 0.12
    vel_noise: float = 0.25
    action_scale: float = 0.35
    physics_steps_per_control_step: int = 5
    kp: float = 60.0
    kd: float = 2.5


class HumanoidBalanceEnv(MjxEnv):
    """Stand upright; recover from randomized initial perturbations."""

    def __init__(self, config: HumanoidBalanceConfig | None = None):
        self.config = config or HumanoidBalanceConfig()
        model = load_model_from_file(self.config.model_path)
        super().__init__(model, self.config.physics_steps_per_control_step)
        s = model.skel
        # actuator i drives joint trnid[i]; hinge joints: one qpos/dof each
        jids = np.asarray(s.actuator_trnid)
        self._act_qadr = np.asarray(s.jnt_qposadr)[jids]
        self._act_dadr = np.asarray(s.jnt_dofadr)[jids]
        self._default_pose = np.asarray(model.qpos0)[self._act_qadr]

    def compute_obs(self, data, info):
        from ambersim_tpu.core import math as am

        quat = data.qpos[3:7]
        gravity_body = am.rotate_inv(jnp.array([0.0, 0.0, -1.0]), quat)
        lin_vel = am.rotate_inv(data.qvel[:3], quat)
        ang_vel = data.qvel[3:6]  # free-joint rotation dofs are body-frame
        return jnp.concatenate(
            [
                gravity_body,
                lin_vel,
                ang_vel,
                jnp.array([data.qpos[2] - self.config.stand_height]),
                data.qpos[7:] - jnp.asarray(self.model.qpos0)[7:],
                data.qvel[6:] * 0.1,
                info.get("last_action", jnp.zeros(self.model.nu)),
            ]
        )

    def compute_reward(self, data, info):
        c = self.config
        from ambersim_tpu.core import math as am

        up = am.rotate(jnp.array([0.0, 0.0, 1.0]), data.qpos[3:7])
        upright_r = c.upright_weight * up[2]
        height_r = -c.height_weight * (data.qpos[2] - c.stand_height) ** 2
        still_r = -c.still_weight * (jnp.sum(data.qvel[:3] ** 2) + 0.3 * jnp.sum(data.qvel[3:6] ** 2))
        pose_r = -c.pose_weight * jnp.mean((data.qpos[7:] - jnp.asarray(self.model.qpos0)[7:]) ** 2)
        energy_r = -c.energy_weight * jnp.sum(data.actuator_force**2)
        act = info.get("last_action", jnp.zeros(self.model.nu))
        prev = info.get("prev_action", jnp.zeros(self.model.nu))
        rate_r = -c.action_rate_weight * jnp.mean((act - prev) ** 2)
        return c.alive_bonus + upright_r + height_r + still_r + pose_r + energy_r + rate_r

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
        qpos = qpos.at[7:].add(c.joint_noise * jax.random.normal(r1, (self.model.nq - 7,)))
        qvel = jnp.zeros(self.model.nv).at[:6].add(c.vel_noise * jax.random.normal(r2, (6,)))
        data = self.pipeline_init(qpos, qvel)
        nu = self.model.nu
        info = {"rng": rng, "last_action": jnp.zeros(nu), "prev_action": jnp.zeros(nu)}
        obs = self.compute_obs(data, info)
        return State(data, obs, jnp.zeros(()), jnp.zeros(()), {"reward": jnp.zeros(())}, info)

    def step(self, state: State, action: jax.Array) -> State:
        c = self.config
        target = jnp.asarray(self._default_pose) + c.action_scale * action
        data = state.pipeline_state
        ctrl = c.kp * (target - data.qpos[jnp.asarray(self._act_qadr)]) - c.kd * data.qvel[
            jnp.asarray(self._act_dadr)
        ]
        data = self.pipeline_step(data, ctrl)
        state.info.update(prev_action=state.info["last_action"], last_action=action)
        obs = self.compute_obs(data, state.info)
        reward = self.compute_reward(data, state.info)
        done = self._done(data)
        state.metrics.update(reward=reward)
        return state.replace(pipeline_state=data, obs=obs, reward=reward, done=done)
