#!/usr/bin/env python
"""Headline benchmark: scan-to-scan radar odometry throughput on one chip.

Runs the full icp4radar-equivalent pipeline (Doppler RANSAC + static split +
LSQ ego velocity + 10-iteration point-to-point ICP + pose composition) over a
synthetic 2048-point/scan sequence, entirely inside one lax.scan dispatch.

Sequence lengths are sized so the ~25 ms axon-tunnel dispatch latency is
amortized below ~3% of the measurement (the r1-r3 lengths of 64-256 frames
carried a hidden 0.1-0.4 ms/frame dispatch tax — round-4 correction, see
docs/PERFORMANCE.md).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "scans/s", "vs_baseline": N}

Baseline anchor: the reference publishes no throughput numbers (BASELINE.md);
its frame loop is capped at 100 Hz (`ros::Rate r(100.0)`,
src/iterative_closest_point.cpp:258), so vs_baseline = value / 100.
"""

import json
import os
import sys
import time

import numpy as np

FRAMES = 1024
MAX_POINTS = 2048
BASELINE_SCANS_PER_SEC = 100.0  # reference frame-loop rate cap

# Cold-cache staging: each jit program costs minutes of tunnel compile when
# the persistent cache misses (measured 533 s for all three in r2). The
# secondary/tertiary programs are stderr-only diagnostics — skip them when
# the elapsed wall-clock crosses this budget so the PRIMARY JSON line always
# lands inside the driver's window.
BENCH_BUDGET_S = float(os.environ.get("ICP4D_BENCH_BUDGET_S", "240"))
_START = time.time()


def _within_budget(stage: str) -> bool:
    elapsed = time.time() - _START
    if elapsed > BENCH_BUDGET_S:
        print(f"skipping {stage}: {elapsed:.0f}s elapsed > "
              f"{BENCH_BUDGET_S:.0f}s budget (cold-compile guard; rerun "
              f"with a warm cache or raise ICP4D_BENCH_BUDGET_S)",
              file=sys.stderr)
        return False
    return True


def main() -> int:
    import jax

    # persistent compilation cache: repeated bench invocations (the driver
    # runs this every round) skip the slow tunnel compile
    from icp4dradar_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache(min_compile_secs=5)

    from icp4dradar_tpu.config import PipelineConfig
    from icp4dradar_tpu.io import SyntheticSequence
    from icp4dradar_tpu.io.scan import stack_scans
    from icp4dradar_tpu.models import run_scan_to_scan
    from icp4dradar_tpu.utils import ate_rmse

    print(f"backend: {jax.default_backend()} devices: {jax.devices()}",
          file=sys.stderr)

    seq = SyntheticSequence(
        num_frames=FRAMES, max_points=MAX_POINTS, num_landmarks=5000,
        world_extent=120.0, max_range=80.0, dynamic_fraction=0.1,
        speed=1.0, turn_rate=0.02, seed=0,
    )
    t0 = time.time()
    scans = stack_scans([seq.scan(k) for k in range(FRAMES)])
    scans = jax.device_put(scans)
    jax.block_until_ready(scans.xyz)
    print(f"data gen: {time.time()-t0:.1f}s", file=sys.stderr)

    cfg = PipelineConfig()
    run = jax.jit(
        lambda s: run_scan_to_scan(s, cfg, use_doppler_prior=True).world_T
    )

    # NOTE on timing: jax.block_until_ready is a NO-OP through the axon
    # tunnel (measured returning in 0.1 ms while the computation takes
    # 113 ms) — every timed section must materialize a (small) output to
    # host via np.asarray, which faithfully waits for the computation.
    t0 = time.time()
    poses = np.asarray(run(scans))
    print(f"compile + first run: {time.time()-t0:.1f}s", file=sys.stderr)

    # steady-state timing (best of 5; axon tunnel adds run-to-run jitter)
    times = []
    for _ in range(5):
        t0 = time.time()
        poses = np.asarray(run(scans))
        times.append(time.time() - t0)
    dt = min(times)
    scans_per_sec = FRAMES / dt

    ate = ate_rmse(np.asarray(poses)[:, :3, 3], seq.poses[:, :3, 3],
                   align=False)
    print(f"steady-state: {dt*1e3:.1f} ms for {FRAMES} frames "
          f"({scans_per_sec:.1f} scans/s), sanity ATE {ate:.3f} m",
          file=sys.stderr)

    # secondary: flagship scan-to-map VGICP tracking (blocked runner: one
    # sector query + one batched insert per 8 frames; see
    # models/scan_to_map.py::run_scan_to_map_blocked)
    if _within_budget("secondary scan_to_map"):
      try:
        from icp4dradar_tpu.models import run_scan_to_map_blocked

        F2 = 256
        scans2 = jax.tree.map(lambda x: x[:F2], scans)
        run2 = jax.jit(
            lambda s: run_scan_to_map_blocked(
                s, cfg, block=8, use_const_velocity_rot=True)[1].world_T)
        poses2 = np.asarray(run2(scans2))
        times2 = []
        for _ in range(2):          # best-of-2: tunnel jitter can double a
            t0 = time.time()        # single sample (measured 2.3 -> 6 ms)
            poses2 = np.asarray(run2(scans2))
            times2.append(time.time() - t0)
        dt2 = min(times2)
        ate2 = ate_rmse(np.asarray(poses2)[:, :3, 3], seq.poses[:F2, :3, 3],
                        align=False)
        print(f"secondary scan_to_map: {dt2*1e3/F2:.2f} ms/frame "
              f"({F2/dt2:.1f} scans/s), ATE {ate2:.3f} m", file=sys.stderr)
      except Exception as e:  # secondary must never break the primary metric
        print(f"secondary scan_to_map failed: {e}", file=sys.stderr)

    # tertiary: multi-stream serving throughput (B sequences, private maps)
    if _within_budget("tertiary batched scan_to_map"):
      try:
        from icp4dradar_tpu.models import run_scan_to_map_batch

        B, F3 = 4, 256
        scans3 = jax.tree.map(
            lambda x: jax.numpy.stack([x[b * F3:(b + 1) * F3] for b in range(B)]),
            scans,
        )
        run3 = jax.jit(lambda s: run_scan_to_map_batch(
            s, cfg, block=8, use_const_velocity_rot=True)[1].world_T)
        np.asarray(run3(scans3))
        t0 = time.time()
        np.asarray(run3(scans3))
        dt3 = time.time() - t0
        print(f"tertiary batched scan_to_map: B={B} streams, "
              f"{B * F3 / dt3:.1f} aggregate scans/s "
              f"({dt3 * 1e3 / F3:.2f} ms/frame-step)", file=sys.stderr)
      except Exception as e:
        print(f"tertiary batched scan_to_map failed: {e}", file=sys.stderr)

    # roofline: achieved vs v5e peak for the three hot kernels, with the
    # binding wall named (utils/roofline.py documents peaks + FLOP models)
    if jax.default_backend() == "tpu" and _within_budget("roofline"):
      try:
        from icp4dradar_tpu.utils import roofline

        for rep in roofline.measure_hot_kernels(reps=256, best_of=2):
            print("roofline " + roofline.format_report(rep), file=sys.stderr)
      except Exception as e:
        print(f"roofline stage failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "scan_to_scan_odometry_scans_per_sec",
        "value": round(scans_per_sec, 2),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_sec / BASELINE_SCANS_PER_SEC, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
