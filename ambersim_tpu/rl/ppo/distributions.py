"""Parametric action distributions (role of brax.training.distribution,
consumed by the reference at ambersim/rl/helpers.py and
examples ex_save_and_load.py:40 — D7 in SURVEY.md).

NormalTanhDistribution: a diagonal Gaussian squashed through tanh, with
param_size = 2 * event_size (mean, log_std) — matching the size contract the
reference validates (ambersim/rl/helpers.py:48-50).
"""

from __future__ import annotations

import abc

import jax
import jax.numpy as jnp

_MIN_STD = 0.001
_LOG2 = 0.6931471805599453


class ParametricDistribution(abc.ABC):
    """Distribution over actions parameterized by a network output vector."""

    def __init__(self, param_size: int, event_size: int, reparametrizable: bool = True):
        self._param_size = param_size
        self._event_size = event_size
        self._reparametrizable = reparametrizable

    @property
    def param_size(self) -> int:
        return self._param_size

    @property
    def event_size(self) -> int:
        return self._event_size

    @abc.abstractmethod
    def sample_no_postprocessing(self, parameters: jax.Array, seed: jax.Array) -> jax.Array:
        ...

    @abc.abstractmethod
    def log_prob(self, parameters: jax.Array, raw_actions: jax.Array) -> jax.Array:
        ...

    @abc.abstractmethod
    def postprocess(self, raw_actions: jax.Array) -> jax.Array:
        ...

    @abc.abstractmethod
    def mode(self, parameters: jax.Array) -> jax.Array:
        ...

    @abc.abstractmethod
    def entropy(self, parameters: jax.Array, seed: jax.Array) -> jax.Array:
        ...

    def sample(self, parameters: jax.Array, seed: jax.Array) -> jax.Array:
        return self.postprocess(self.sample_no_postprocessing(parameters, seed))


class DeterministicTanhDistribution(ParametricDistribution):
    """tanh(loc) with no noise head: param_size == event_size.

    For derivative-free trainers (ES/ARS) that roll out with dist.mode, a
    Gaussian head wastes half the perturbation dimensions — the log-std
    columns can never affect fitness and only dilute the search. This head
    makes every perturbed parameter influence the rollout."""

    def __init__(self, event_size: int):
        super().__init__(param_size=event_size, event_size=event_size)

    def sample_no_postprocessing(self, parameters, seed):
        return parameters

    def mode(self, parameters):
        return jnp.tanh(parameters)

    def postprocess(self, raw_actions):
        return jnp.tanh(raw_actions)

    def log_prob(self, parameters, raw_actions):
        # Degenerate (point-mass) distribution: log-density is not defined;
        # zeros keep the inference-fn contract without implying a measure.
        return jnp.zeros(parameters.shape[:-1])

    def entropy(self, parameters, seed):
        return jnp.zeros(parameters.shape[:-1])


class NormalTanhDistribution(ParametricDistribution):
    """tanh(Normal(mean, std)) with softplus std floor."""

    def __init__(self, event_size: int, min_std: float = _MIN_STD, var_scale: float = 1.0):
        super().__init__(param_size=2 * event_size, event_size=event_size)
        self._min_std = min_std
        self._var_scale = var_scale

    def _loc_scale(self, parameters: jax.Array):
        loc, scale = jnp.split(parameters, 2, axis=-1)
        scale = (jax.nn.softplus(scale) + self._min_std) * self._var_scale
        return loc, scale

    def sample_no_postprocessing(self, parameters, seed):
        loc, scale = self._loc_scale(parameters)
        return loc + scale * jax.random.normal(seed, loc.shape)

    def mode(self, parameters):
        loc, _ = self._loc_scale(parameters)
        return jnp.tanh(loc)

    def postprocess(self, raw_actions):
        return jnp.tanh(raw_actions)

    def log_prob(self, parameters, raw_actions):
        """log prob of postprocessed action, evaluated at raw (pre-tanh) action."""
        loc, scale = self._loc_scale(parameters)
        log_unnormalized = -0.5 * jnp.square((raw_actions - loc) / scale)
        log_normalization = 0.5 * jnp.log(2.0 * jnp.pi) + jnp.log(scale)
        log_det_jacobian = 2.0 * (_LOG2 - raw_actions - jax.nn.softplus(-2.0 * raw_actions))
        return jnp.sum(log_unnormalized - log_normalization - log_det_jacobian, axis=-1)

    def entropy(self, parameters, seed):
        """Sample-based entropy of the squashed distribution."""
        loc, scale = self._loc_scale(parameters)
        raw = loc + scale * jax.random.normal(seed, loc.shape)
        log_det_jacobian = 2.0 * (_LOG2 - raw - jax.nn.softplus(-2.0 * raw))
        base_entropy = 0.5 + 0.5 * jnp.log(2.0 * jnp.pi) + jnp.log(scale)
        return jnp.sum(base_entropy + log_det_jacobian, axis=-1)
