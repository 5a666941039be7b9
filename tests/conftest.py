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

# the persistent XLA compile cache must stay OFF in the test process:
# LoadedExecutable.serialize() segfaults in long-lived processes that
# have accumulated a few hundred compiled programs (reproduced 3/3 at
# ~test 230 on this jaxlib; fine in fresh processes) — the daemon and
# bench keep the cache (engine_tpu._enable_compilation_cache checks
# this variable)
os.environ.setdefault("AV1TPU_NO_COMPILE_CACHE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _jax_cache_pressure_relief():
    """Free compiled executables between test modules.

    The XLA CPU client segfaults when compiling a NEW program late in a
    long-lived process that has accumulated a few hundred live
    executables (reproduced 3/3 at ~90% of the suite, in
    backend_compile_and_load on the main thread with all other threads
    idle; the same compile succeeds in a fresh process).  Dropping the
    jit caches after each module keeps the live-executable count
    bounded; modules re-trace their own shapes anyway."""
    yield
    jax.clear_caches()
