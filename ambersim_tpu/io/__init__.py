from ambersim_tpu.io.checkpoint import load_params, save_params  # noqa: F401
