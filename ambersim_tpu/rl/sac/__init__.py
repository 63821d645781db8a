"""TPU-native SAC training stack (role of brax.training.agents.sac).

The reference's training dependency (brax.training) ships SAC alongside PPO;
this module provides the same capability for off-policy tasks, with the same
(make_policy, params, metrics) / progress_fn contracts as `rl.ppo.train`
(reference contract: examples/rl/pendulum/ex_swingup.py:55-58).
"""

from ambersim_tpu.rl.sac.networks import (  # noqa: F401
    SACNetworks,
    make_inference_fn,
    make_sac_networks,
)
from ambersim_tpu.rl.sac.train import train  # noqa: F401
