"""Test harness config: force CPU with 8 virtual devices (multi-chip sharding
tests run on a virtual mesh) and enable x64 so float64 parity checks work.

Note: the TPU platform plugin in this environment ignores the JAX_PLATFORMS
env var, so the backend is pinned via jax.config *before* first use.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
