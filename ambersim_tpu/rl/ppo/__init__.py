"""TPU-native PPO training stack (role of brax.training.agents.ppo, D6-D8)."""

from ambersim_tpu.rl.ppo.networks import (  # noqa: F401
    FeedForwardNetwork,
    PPONetworks,
    make_inference_fn,
    make_ppo_networks,
)
from ambersim_tpu.rl.ppo.train import train  # noqa: F401
