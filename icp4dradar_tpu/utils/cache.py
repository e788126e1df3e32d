"""Persistent XLA compilation cache setup shared by bench/eval scripts.

TPU ONLY. The XLA:CPU AOT cache is disabled outright: loading CPU cache
entries on this container emits machine-feature-mismatch warnings
("+prefer-no-scatter is not supported on the host machine ... could lead
to execution errors such as SIGILL") and was observed to SEGFAULT inside
jax compilation_cache.get_executable_and_time mid-test-suite — even for
entries written by the same machine in the same session. TPU cache
entries are keyed by the device target and have been reliable across
rounds (they cut the ~9-minute tunnel compile of bench.py to seconds).
"""

from __future__ import annotations


def setup_compilation_cache(min_compile_secs: float = 2.0) -> str:
    import jax

    if jax.default_backend() == "cpu":
        return ""  # see module docstring: CPU AOT cache segfaults here
    path = "/tmp/icp4dradar_jax_cache"
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass
    return path
