"""Test harness: force CPU with 8 virtual devices so sharding tests run
without TPU hardware, and keep everything deterministic.

Note: this environment may register a TPU PJRT plugin from sitecustomize
before pytest starts, so env vars alone are too late — we switch the platform
via jax.config after import instead (the CPU client is created lazily, so the
XLA_FLAGS device-count knob still applies).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

# Persistent (disk) compilation cache: the per-module clear_caches below
# protects against compiler segfaults but forces recompiles of programs
# shared across modules (the odometry step alone is ~60 s of CPU compile);
# with the disk cache those recompiles become cheap deserializations —
# including within a single cold run of the suite.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound the in-process compiler/executable cache growth: with the whole
    suite in one process, the XLA CPU compiler has been observed to segfault
    when compiling new programs against a large accumulated cache (same
    program compiles fine in a fresh process). Clearing per module keeps
    every module's compile environment small at the cost of some recompiles.
    """
    yield
    jax.clear_caches()
