"""Environment API: State container + MjxEnv base class.

API mirrors the reference's ambersim/rl/base.py:14-153 (State with
pipeline_state/obs/reward/done/metrics/info; MjxEnv with reset/step/
compute_obs/compute_reward/pipeline_init/pipeline_step/dt/observation_size/
action_size/backend) so reference users can migrate env subclasses directly.
The physics pipeline underneath is our TPU-native engine instead of MJX.
"""

from __future__ import annotations

import abc
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ambersim_tpu.core.types import Data, Model
from ambersim_tpu.engine.forward import forward_jit as _forward
from ambersim_tpu.engine import make_data
from ambersim_tpu.engine import step as _step


@struct.dataclass
class State:
    """Env state: physics Data plus RL quantities (cf. reference rl/base.py:14-32)."""

    pipeline_state: Data
    obs: jax.Array
    reward: jax.Array
    done: jax.Array
    metrics: Dict[str, jax.Array] = struct.field(default_factory=dict)
    info: Dict[str, Any] = struct.field(default_factory=dict)


class MjxEnv(abc.ABC):
    """Abstract environment whose physics engine is the ambersim_tpu pipeline
    (cf. reference rl/base.py:35-153)."""

    def __init__(self, model: Model, physics_steps_per_control_step: int = 1):
        self.model = model
        self._physics_steps_per_control_step = physics_steps_per_control_step

    # reference exposes the device model as `sys` (rl/base.py:52)
    @property
    def sys(self) -> Model:
        return self.model

    def pipeline_init(self, qpos: jax.Array, qvel: jax.Array, ctrl: Optional[jax.Array] = None) -> Data:
        """Initialize physics state and run forward (cf. rl/base.py:81-86)."""
        data = make_data(self.model)
        data = data.replace(qpos=qpos, qvel=qvel)
        if ctrl is not None:
            data = data.replace(ctrl=ctrl)
        return _forward(self.model, data)

    def pipeline_step(self, data: Data, ctrl: jax.Array) -> Data:
        """Step physics for all substeps (cf. rl/base.py:88-96).

        Uses the minimal-carry rollout: scanning the full Data pytree copies
        every derived buffer (efc rows, contacts, mass matrices) per substep,
        which costs real HBM bandwidth at batch 4096+ (~2x step time on the
        quadruped benchmark)."""
        from ambersim_tpu.engine.rollout import rollout

        data = data.replace(ctrl=ctrl)
        return rollout(self.model, data, self._physics_steps_per_control_step)

    @property
    def dt(self) -> jax.Array:
        """Control timestep (cf. rl/base.py:55-58)."""
        return self.model.opt.timestep * self._physics_steps_per_control_step

    @property
    def observation_size(self) -> int:
        """Computed by tracing reset (cf. rl/base.py:60-65)."""
        rng = jax.random.PRNGKey(0)
        shape = jax.eval_shape(self.reset, rng).obs.shape
        return int(shape[-1])

    @property
    def action_size(self) -> int:
        return self.model.nu

    @property
    def backend(self) -> str:
        return "ambersim_tpu"

    @property
    def unwrapped(self) -> "MjxEnv":
        return self

    @abc.abstractmethod
    def reset(self, rng: jax.Array) -> State:
        ...

    @abc.abstractmethod
    def step(self, state: State, action: jax.Array) -> State:
        ...

    def compute_obs(self, data: Data, info: Dict[str, Any]) -> jax.Array:
        raise NotImplementedError

    def compute_reward(self, data: Data, info: Dict[str, Any]) -> jax.Array:
        raise NotImplementedError
