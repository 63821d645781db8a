"""Environment registry (role of brax.envs registry used by the reference at
examples/rl/pendulum/ex_swingup.py:17-18)."""

from __future__ import annotations

from typing import Callable, Dict, Type

from ambersim_tpu.rl.base import MjxEnv

_REGISTRY: Dict[str, Callable[..., MjxEnv]] = {}


def register_environment(name: str, env_class: Callable[..., MjxEnv]) -> None:
    _REGISTRY[name] = env_class


def get_environment(name: str, **kwargs) -> MjxEnv:
    if name not in _REGISTRY:
        raise KeyError(f"unknown environment '{name}'; registered: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def registered_environments() -> list:
    return sorted(_REGISTRY)
