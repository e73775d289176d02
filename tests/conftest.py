"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The standard JAX fake-backend trick (SURVEY.md §4): tests exercise the same
sharded pjit programs that run on a real TPU pod, on host CPU devices.

Note: this environment's TPU plugin force-appends itself to
``jax_platforms`` at import, overriding the ``JAX_PLATFORMS`` env var — so
the config API is used instead (must run before the backend initializes).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # backend already initialized (e.g. single-test debugging)

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
