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

# NOTE: do NOT enable jax's persistent compilation cache here
# (jax_compilation_cache_dir): on this jax version (0.9.0) writing certain
# CPU executables to the cache segfaults the interpreter mid-suite
# (compilation_cache.put_executable_and_time, observed on
# test_models_parity rollouts). Warm-run speed is not worth a flaky suite.

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_jax_executables():
    """Free compiled executables between test modules.

    The same jax 0.9.0 XLA:CPU fragility that rules out the persistent cache
    above also segfaults `backend_compile_and_load` when a single process
    accumulates the whole suite's worth of live executables (reproducible at
    ~the 122nd test; each half of the suite passes in isolation). Dropping
    jit caches per module keeps the live-executable count bounded. Costs a
    few re-compiles for cross-module shared programs; the alternative is a
    flaky suite."""
    yield
    jax.clear_caches()
    gc.collect()
