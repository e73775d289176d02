"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The standard JAX fake-backend trick (SURVEY.md §4): tests exercise the same
sharded pjit/shard_map programs that run on a real TPU pod, on host CPU
devices.  Must run before the first ``import jax``.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
