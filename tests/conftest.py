"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4).

Must run before the first `import jax` anywhere in the test session.
"""

import os

# The container's sitecustomize force-registers the axon TPU plugin and pins
# JAX_PLATFORMS=axon; plain env vars are therefore not enough — override both
# the env and the live jax config before any backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

# NOTE: deliberately NO persistent compilation cache here. The XLA:CPU AOT
# cache was observed to SEGFAULT inside
# jax compilation_cache.get_executable_and_time mid-suite on this
# container (even for same-machine, same-session entries), matching its
# "+prefer-no-scatter not supported on the host machine ... SIGILL"
# loader warnings. Compile time is paid per run instead
# (utils/cache.py keeps the cache for the TPU backend only).

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _release_xla_executables_between_modules():
    """Free compiled executables after each test module.

    Every XLA:CPU executable holds several mmap'd regions; one process
    running the whole suite accumulates them monotonically and SEGFAULTS /
    SIGABRTs when it exhausts vm.max_map_count (65530 — measured: the
    crash lands exactly at ~65.2k mappings, mid-compile or mid-cache-read,
    ~32% into the suite). Clearing between modules bounds the per-module
    map footprint; cross-module program reuse is minimal so the recompile
    cost is negligible."""
    yield
    jax.clear_caches()
