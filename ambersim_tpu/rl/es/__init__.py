"""TPU-native Evolution Strategies training stack (role of
brax.training.agents.es).

OpenAI-ES with mirrored sampling and centered-rank fitness shaping. The
population axis is just another batch axis: every perturbed policy rolls out
in its own env, vmapped and sharded over the device mesh — zero-gradient,
embarrassingly parallel, the best-case shape for ICI scaling. Same
(make_policy, params, metrics) / progress_fn contracts as `rl.ppo.train`.
"""

from ambersim_tpu.rl.es.train import centered_rank, train  # noqa: F401
