"""TPU-native APG training stack (role of brax.training.agents.apg).

Analytic policy gradients: backpropagate episode reward directly through the
differentiable physics step (`engine/linalg.differentiable_dispatch`) instead
of estimating gradients from sampled returns. Same (make_policy, params,
metrics) / progress_fn contracts as `rl.ppo.train` and `rl.sac.train`.
"""

from ambersim_tpu.rl.apg.train import make_apg_networks, train  # noqa: F401
