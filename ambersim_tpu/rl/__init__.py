"""RL environment layer + PPO training stack.

Covers the reference's ambersim/rl (env base, helpers, pendulum task) and the
Brax dependencies it leans on (env registry/wrappers D5, PPO trainer D6,
networks/distributions D7, running statistics D8, checkpoint I/O D9).
"""

from ambersim_tpu.rl.base import MjxEnv, State  # noqa: F401
from ambersim_tpu.rl.registry import get_environment, register_environment  # noqa: F401
