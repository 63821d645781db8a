from ambersim_tpu.learning.architectures import MLP  # noqa: F401
