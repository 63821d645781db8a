"""Training wrappers: episode termination, auto-reset, vmap batching
(role of brax.envs.wrappers.training used implicitly by the reference's PPO
training; D5 in SURVEY.md §2.2)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ambersim_tpu.rl.base import MjxEnv, State


class Wrapper(MjxEnv):
    def __init__(self, env: MjxEnv):
        self.env = env

    def reset(self, rng: jax.Array) -> State:
        return self.env.reset(rng)

    def step(self, state: State, action: jax.Array) -> State:
        return self.env.step(state, action)

    @property
    def model(self):
        return self.env.model

    @model.setter
    def model(self, value):  # pragma: no cover
        self.env.model = value

    @property
    def dt(self):
        return self.env.dt

    @property
    def observation_size(self) -> int:
        return self.env.observation_size

    @property
    def action_size(self) -> int:
        return self.env.action_size

    @property
    def unwrapped(self) -> MjxEnv:
        return self.env.unwrapped


class EpisodeWrapper(Wrapper):
    """Terminate episodes after `episode_length` control steps, with
    `action_repeat` physics-control substeps per env step."""

    def __init__(self, env: MjxEnv, episode_length: int, action_repeat: int = 1):
        super().__init__(env)
        self.episode_length = episode_length
        self.action_repeat = action_repeat

    def reset(self, rng: jax.Array) -> State:
        state = self.env.reset(rng)
        state.info["steps"] = jnp.zeros(())
        state.info["truncation"] = jnp.zeros(())
        return state

    def step(self, state: State, action: jax.Array) -> State:
        def f(state, _):
            return self.env.step(state, action), None

        state, _ = jax.lax.scan(f, state, None, length=self.action_repeat)
        # brax semantics: steps counts physics control steps, so episode_length
        # means the same thing regardless of action_repeat
        steps = state.info["steps"] + self.action_repeat
        one = jnp.ones_like(state.done)
        done = jnp.where(steps >= self.episode_length, one, state.done)
        state.info["truncation"] = jnp.where(steps >= self.episode_length, 1 - state.done, jnp.zeros(()))
        state.info["steps"] = steps
        return state.replace(done=done)


class AutoResetWrapper(Wrapper):
    """Reset to the cached first state when an episode ends (brax-style)."""

    def reset(self, rng: jax.Array) -> State:
        state = self.env.reset(rng)
        state.info["first_pipeline_state"] = state.pipeline_state
        state.info["first_obs"] = state.obs
        return state

    def step(self, state: State, action: jax.Array) -> State:
        if "steps" in state.info:
            steps = state.info["steps"]
            steps = jnp.where(state.done, jnp.zeros_like(steps), steps)
            state.info.update(steps=steps)
        state = state.replace(done=jnp.zeros_like(state.done))
        state = self.env.step(state, action)

        def where_done(x, y):
            done = state.done
            if done.shape and x.ndim and done.shape[0] == x.shape[0]:
                done = done.reshape(done.shape + (1,) * (x.ndim - 1))
            return jnp.where(done, x, y)

        pipeline_state = jax.tree.map(where_done, state.info["first_pipeline_state"], state.pipeline_state)
        obs = where_done(state.info["first_obs"], state.obs)
        return state.replace(pipeline_state=pipeline_state, obs=obs)


class VmapWrapper(Wrapper):
    """Batch the env over a leading axis."""

    def __init__(self, env: MjxEnv, batch_size: int | None = None):
        super().__init__(env)
        self.batch_size = batch_size

    def reset(self, rng: jax.Array) -> State:
        if self.batch_size is not None and rng.ndim == 1:
            rng = jax.random.split(rng, self.batch_size)
        return jax.vmap(self.env.reset)(rng)

    def step(self, state: State, action: jax.Array) -> State:
        return jax.vmap(self.env.step)(state, action)


class DomainRandomizationVmapWrapper(Wrapper):
    """Batch the env over a leading axis where EACH ENV HAS ITS OWN MODEL
    (domain randomization; role of brax's DomainRandomizationVmapWrapper used
    via the reference trainer's `randomization_fn` hook).

    `randomization_fn(model) -> (model_v, in_axes)`: `model_v` is the base
    Model with ONLY the randomized leaves replaced by batched arrays with a
    new leading env axis (`model.replace(field=batched)`; other leaves stay
    unbatched), and `in_axes` is a Model pytree with 0 on randomized leaves
    and None elsewhere (`jax.tree.map(lambda _: None, model).replace(field=0)`).
    Numeric Model fields are traced pytree leaves (core/types.py design
    note), so the batch shares ONE compilation across all randomized models.
    """

    def __init__(self, env: MjxEnv, randomization_fn):
        super().__init__(env)
        self.model_v, self.in_axes = randomization_fn(self.env.model)

    def _with_model(self, model):
        # rebind at trace time: the tracer-leaf model flows through reset/step
        self.env.unwrapped.model = model
        return self.env

    def reset(self, rng: jax.Array) -> State:
        def reset_fn(model, rng):
            return self._with_model(model).reset(rng)

        return jax.vmap(reset_fn, in_axes=[self.in_axes, 0])(self.model_v, rng)

    def step(self, state: State, action: jax.Array) -> State:
        def step_fn(model, s, a):
            return self._with_model(model).step(s, a)

        return jax.vmap(step_fn, in_axes=[self.in_axes, 0, 0])(self.model_v, state, action)


def make_slim_carry(env_state: State, extra_fields: tuple = ()):
    """(to_slim, from_slim) pair for scanning wrapped env state with a
    minimal carry.

    CONTRACT: every Data field NOT in the carry is frozen to its value in
    the scan-initial template. Derived buffers (efc rows, contacts, mass
    matrices) are recomputed by step() so freezing them is free — but
    *input* fields step() reads without recomputing (`xfrc_applied`,
    `qfrc_applied`, `ctrl` outside the action path) are frozen too: an env
    that applies perturbation forces inside step() must pass them via
    `extra_fields` or its writes are silently dropped. `mocap_pos`/
    `mocap_quat` are carried automatically whenever the model has mocap
    bodies (static shape check).

    lax.scan copies its carry every iteration, and a wrapped State drags TWO
    full Data pytrees through it: the live physics state and AutoReset's
    cached reset state in `info` (~32.7 kB/env each on the quadruped vs
    ~0.2 kB of actually-dynamic fields). The cache is scan-INVARIANT — it is
    hoisted out of the carry entirely (closed over) — and the live Data is
    carried as its dynamic fields only, reconstituted from a template each
    step: every derived buffer (efc rows, contacts, mass matrices) is
    recomputed by step() anyway. This is engine/rollout.py's minimal-carry
    design one level up; measured +20% on the 4096-env quadruped PPO rung.

    Build the pair INSIDE the jit from the scan's initial state, carry
    `to_slim(state)`, and call `from_slim` before each env.step."""
    template = env_state.pipeline_state
    hoisted = {
        k: env_state.info[k]
        for k in ("first_pipeline_state", "first_obs")
        if k in env_state.info
    }
    slim_fields = ("qpos", "qvel", "act", "qacc_warmstart", "time")
    # nmocap > 0 is a static shape property: carry mocap targets whenever the
    # model has mocap bodies, since envs drive them per-step by construction
    if getattr(template, "mocap_pos", None) is not None and template.mocap_pos.shape[-2] > 0:
        slim_fields = slim_fields + ("mocap_pos", "mocap_quat")
    slim_fields = slim_fields + tuple(f for f in extra_fields if f not in slim_fields)

    def to_slim(state: State):
        return (
            tuple(getattr(state.pipeline_state, f) for f in slim_fields),
            state.replace(
                pipeline_state=None,
                info={k: v for k, v in state.info.items() if k not in hoisted},
            ),
        )

    def from_slim(slim) -> State:
        dyn, state = slim
        return state.replace(
            pipeline_state=template.replace(**dict(zip(slim_fields, dyn))),
            info={**state.info, **hoisted},
        )

    return to_slim, from_slim


def wrap_for_training(
    env: MjxEnv, episode_length: int, action_repeat: int = 1, randomization_fn=None
) -> MjxEnv:
    """Standard training stack: episode -> vmap -> autoreset (brax order).
    With `randomization_fn`, the vmap stage carries per-env randomized models."""
    env = EpisodeWrapper(env, episode_length, action_repeat)
    if randomization_fn is None:
        env = VmapWrapper(env)
    else:
        env = DomainRandomizationVmapWrapper(env, randomization_fn)
    env = AutoResetWrapper(env)
    return env
