from ambersim_tpu.rl.pendulum.swingup import PendulumSwingupConfig, PendulumSwingupEnv  # noqa: F401
