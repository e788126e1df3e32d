#!/usr/bin/env python
"""Experiment: VGICP iteration counts + motion-prior variants in blocked
scan-to-map tracking. Measures (a) how many GN sweeps the while_loop runs
per frame today, (b) whether a constant-velocity rotation prior (carry the
previous frame's refined delta) cuts them, (c) end-to-end ms/frame impact.

Usage: python scripts/exp_iters.py [--cpu] [--frames 64] [--block 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--block", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from icp4dradar_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import numpy as np

    from icp4dradar_tpu.config import PipelineConfig
    from icp4dradar_tpu.io import SyntheticSequence
    from icp4dradar_tpu.io.scan import stack_scans
    from icp4dradar_tpu.models.scan_to_map import run_scan_to_map_blocked
    from icp4dradar_tpu.utils import ate_rmse

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    F = args.frames
    cfg = PipelineConfig()
    seq = SyntheticSequence(
        num_frames=F, max_points=2048, num_landmarks=5000,
        world_extent=120.0, max_range=80.0, dynamic_fraction=0.1,
        speed=1.0, turn_rate=0.02, seed=0,
    )
    scans = jax.device_put(stack_scans([seq.scan(k) for k in range(F)]))
    jax.block_until_ready(scans.xyz)

    def bench(tag, fn):
        run = jax.jit(fn)
        out = run(scans)
        jax.block_until_ready(out[0])
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = run(scans)
            jax.block_until_ready(out[0])
            ts.append(time.time() - t0)
        dt = min(ts)
        poses, fit, iters = out
        ate = ate_rmse(np.asarray(poses)[:, :3, 3], seq.poses[:F, :3, 3],
                       align=False)
        it = np.asarray(iters)
        print(f"{tag}: {dt*1e3/F:.2f} ms/frame ({F/dt:.0f} scans/s) "
              f"ATE {ate:.4f} m  iters mean {it.mean():.1f} "
              f"max {it.max()} tail-mean {it[args.block:].mean():.1f}")
        return dt

    for cv_rot in (False, True):
        def fn(s, cv=cv_rot):
            st, o = run_scan_to_map_blocked(
                s, cfg, block=args.block, use_const_velocity_rot=cv)
            return o.world_T, o.fitness, o.iterations
        bench(f"block={args.block} cv_rot={cv_rot}", fn)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
