from ambersim_tpu.rl.humanoid.balance import HumanoidBalanceConfig, HumanoidBalanceEnv  # noqa: F401
