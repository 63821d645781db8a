from ambersim_tpu.rl.quadruped.locomotion import QuadrupedLocomotionConfig, QuadrupedLocomotionEnv  # noqa: F401
