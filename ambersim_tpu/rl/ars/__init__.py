"""TPU-native Augmented Random Search training stack (role of
brax.training.agents.ars).

ARS-V2t (Mania et al. 2018, public algorithm): antithetic parameter
directions scored by full-episode rollouts, an update from only the top-b
directions, scaled by the reward standard deviation, with running obs
normalization. Like ES, the direction axis is a batch axis sharded over the
device mesh. Same (make_policy, params, metrics) / progress_fn contracts as
`rl.ppo.train`.
"""

from ambersim_tpu.rl.ars.train import train  # noqa: F401
