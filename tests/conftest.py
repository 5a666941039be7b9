"""Test env: force CPU JAX with a virtual 8-device mesh (SURVEY.md §4d).

The container's axon TPU plugin forces jax_platforms="axon,cpu" at import
time, overriding the JAX_PLATFORMS env var — so we must override the config
*after* importing jax, before any backend initializes.  Must run before any
test module imports jax.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
