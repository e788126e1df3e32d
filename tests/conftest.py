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

# Persistent compilation cache: repeated suite runs (driver, judge, local
# iteration) skip minutes of XLA:CPU compiles. Keyed by the host CPU's
# feature flags — XLA:CPU AOT artifacts compiled on a different machine
# type load with feature-mismatch warnings and can SIGILL, so a cache dir
# from another host must never be reused.
try:
    import hashlib

    with open("/proc/cpuinfo") as _f:
        _flags = next((ln for ln in _f if ln.startswith("flags")), "")
    _tag = hashlib.sha1(_flags.encode()).hexdigest()[:10]
    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/icp4dradar_jax_cache_cpu_{_tag}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
