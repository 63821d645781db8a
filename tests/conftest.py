"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Physics parity tests compare against the MuJoCo C engine on host (the role
the reference delegates to MuJoCo; see SURVEY.md §4), and mesh-sharding tests
need multiple devices, which virtual CPU devices provide without hardware.

Note: in this environment the JAX_PLATFORMS env var is overridden by the
platform plugin, so we force the platform through jax.config instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # older jax: fall back to XLA flag (must precede backend init)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: the suite is compile-bound on CPU (single
# core in CI), and most wall time is re-tracing identical programs across
# runs. Cache compiled executables on disk so repeat runs (local iteration,
# CI re-runs) skip XLA compilation entirely.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass  # older jax without the persistent-cache config: compile as usual
