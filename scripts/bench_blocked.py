#!/usr/bin/env python
"""Measure blocked vs per-frame scan-to-map tracking on the real TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    from icp4dradar_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import numpy as np

    from icp4dradar_tpu.config import PipelineConfig
    from icp4dradar_tpu.io import SyntheticSequence
    from icp4dradar_tpu.io.scan import stack_scans
    from icp4dradar_tpu.models import run_scan_to_map, run_scan_to_map_blocked
    from icp4dradar_tpu.utils import ate_rmse

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    F = 64
    cfg = PipelineConfig()
    seq = SyntheticSequence(
        num_frames=F, max_points=2048, num_landmarks=5000,
        world_extent=120.0, max_range=80.0, dynamic_fraction=0.1,
        speed=1.0, turn_rate=0.02, seed=0,
    )
    scans = jax.device_put(stack_scans([seq.scan(k) for k in range(F)]))
    jax.block_until_ready(scans.xyz)
    gt = seq.poses[:, :3, 3]

    def bench(name, fn):
        f = jax.jit(fn)
        t0 = time.time()
        out = f(scans)
        jax.block_until_ready(out)
        print(f"{name}: compile+run {time.time()-t0:.1f}s", file=sys.stderr)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = f(scans)
            jax.block_until_ready(out)
            best = min(best, time.time() - t0)
        ate = ate_rmse(np.asarray(out)[:, :3, 3], gt, align=False)
        print(f"{name}: {best*1e3/F:.2f} ms/frame ({F/best:.1f} scans/s), "
              f"ATE {ate:.4f} m", file=sys.stderr)

    bench("per-frame", lambda s: run_scan_to_map(s, cfg)[1].world_T)
    for K in (4, 8, 16):
        bench(f"block={K}",
              lambda s, K=K: run_scan_to_map_blocked(s, cfg, block=K)[1].world_T)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
