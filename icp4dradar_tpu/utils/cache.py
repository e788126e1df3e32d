"""Persistent XLA compilation cache setup shared by bench/eval scripts.

CPU artifacts are keyed by the host CPU's feature flags: XLA:CPU AOT
results compiled on a different machine type load with feature-mismatch
warnings and can SIGILL (observed when /tmp cache dirs survive container
reschedules across host types). TPU artifacts go to the plain dir — they
are keyed by the device target, not host features.
"""

from __future__ import annotations


def setup_compilation_cache(min_compile_secs: float = 2.0) -> str:
    import hashlib

    import jax

    if jax.default_backend() == "cpu":
        try:
            with open("/proc/cpuinfo") as f:
                flags = next((ln for ln in f if ln.startswith("flags")), "")
        except OSError:
            flags = ""
        tag = hashlib.sha1(flags.encode()).hexdigest()[:10]
        path = f"/tmp/icp4dradar_jax_cache_cpu_{tag}"
    else:
        path = "/tmp/icp4dradar_jax_cache"
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass
    return path
