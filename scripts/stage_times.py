"""Per-stage time budget for the flagship scan-to-map frame, measured
with the round-4 corrected harness: every stage runs `reps` times inside
ONE dispatch with a carried data dependence (XLA cannot hoist or overlap
iterations), and the measured empty-chain floor is subtracted. This gives
true per-stage costs free of the ~25 ms axon-tunnel dispatch latency that
inflated r3's standalone-dispatch numbers (docs/PERFORMANCE.md r4 note).

Usage: python scripts/stage_times.py [--reps 256] [--out docs/stage_times_r5.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=256)
    p.add_argument("--out", default="docs/stage_times_r5.json")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from icp4dradar_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache(min_compile_secs=5)

    from icp4dradar_tpu.config import PipelineConfig
    from icp4dradar_tpu.io import SyntheticSequence
    from icp4dradar_tpu.mapping.voxel_hash import (
        voxel_map_create, voxel_map_insert, voxel_map_forget_far,
        voxel_map_sector_search_with_stats,
    )
    from icp4dradar_tpu.ops.vgicp_fused import (
        radar_point_covariances_packed, vgicp_iteration,
        vgicp_iteration_frozen,
    )
    from icp4dradar_tpu.preprocess.reve import estimate_ego_velocity
    from icp4dradar_tpu.registration.vgicp import vgicp_align

    cfg = PipelineConfig()
    vmcfg, gicp = cfg.voxel_map, cfg.gicp
    reps = args.reps

    # build a realistic mid-sequence state: 10 frames into the map
    seq = SyntheticSequence(num_frames=12, max_points=2048,
                            num_landmarks=5000, world_extent=120.0,
                            max_range=80.0, seed=0)
    vm = voxel_map_create(vmcfg.capacity, vmcfg.voxel_size, vmcfg.max_probes)
    warm = jax.jit(lambda vm, xyz, m, i: voxel_map_insert(vm, xyz, m, i))
    import numpy as _np
    for k in range(10):
        s = seq.scan(k)
        world = _np.asarray(s.xyz) + _np.asarray(seq.poses[k][:3, 3])[None, :]
        vm = warm(vm, jnp.asarray(world), s.mask, s.intensity)
    vm = jax.block_until_ready(vm)
    scan = seq.scan(10)
    center = jnp.asarray(seq.poses[10][:3, 3])
    key = jax.random.key(0)

    # frozen submap for isolated registration stages
    _, submask, sub_n, sub_mean, sub_cov = jax.jit(
        lambda vm, c: voxel_map_sector_search_with_stats(
            vm, c, vmcfg.sector_radius, jnp.asarray(0.0), 180.0,
            vmcfg.submap_max_points))(vm, center)
    sub_mean_c = sub_mean - center[None, :]
    cov6 = radar_point_covariances_packed(
        scan.xyz, gicp.sigma_range, gicp.sigma_azimuth, gicp.sigma_elevation)
    T0 = jnp.eye(4, dtype=jnp.float32)
    best0 = vgicp_iteration(
        T0, scan.xyz, scan.mask, cov6, sub_mean_c, sub_cov, submask,
        max_correspondence_dist=gicp.max_correspondence_dist,
        cov_eps=gicp.cov_epsilon, tgt_count=sub_n, return_best=True)[5]

    def timed(step, *xs, best_of=5):
        """step(perturb_scalar, *xs) -> scalar; chained through the carry."""
        @jax.jit
        def run(*xs):
            def body(acc, _):
                # *1e-30, not *0.0: XLA may fold x*0 when it can prove
                # finiteness, which would break the dependence chain
                return acc + step(acc * 1e-30, *xs) * 1e-30, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
            return acc
        np.asarray(run(*xs))
        ts = []
        for _ in range(best_of):
            t0 = time.time()
            np.asarray(run(*xs))
            ts.append(time.time() - t0)
        return min(ts) / reps

    floor = timed(lambda e: e, )
    rows = {}

    def report(name, dt):
        ms = (dt - floor) * 1e3
        rows[name] = round(ms, 4)
        print(f"{name:<28} {ms:8.4f} ms", file=sys.stderr)

    print(f"floor: {floor*1e3:.4f} ms/rep", file=sys.stderr)

    report("reve", timed(
        lambda e, s, k: jnp.sum(estimate_ego_velocity(
            s.replace(xyz=s.xyz + e), k, cfg.reve).velocity),
        scan, key))

    report("src_covariances", timed(
        lambda e, s: jnp.sum(radar_point_covariances_packed(
            s.xyz + e, gicp.sigma_range, gicp.sigma_azimuth,
            gicp.sigma_elevation)),
        scan))

    report("sector_query_stats", timed(
        lambda e, vm, c: jnp.sum(voxel_map_sector_search_with_stats(
            vm, c + e, vmcfg.sector_radius, jnp.asarray(0.0), 180.0,
            vmcfg.submap_max_points)[3]),
        vm, center))

    report("vgicp_sweep_1", timed(
        lambda e, T, sx, sm, c6, tm_, tc, tk: vgicp_iteration(
            T.at[0, 3].add(e), sx, sm, c6, tm_, tc, tk,
            max_correspondence_dist=gicp.max_correspondence_dist,
            cov_eps=gicp.cov_epsilon, tgt_count=sub_n,
            return_best=True)[2],
        T0, scan.xyz, scan.mask, cov6, sub_mean_c, sub_cov, submask))

    report("vgicp_frozen_1", timed(
        lambda e, T, sx, sm, c6, b: vgicp_iteration_frozen(
            T.at[0, 3].add(e), sx, sm, c6, b,
            max_correspondence_dist=gicp.max_correspondence_dist,
            cov_eps=gicp.cov_epsilon)[2],
        T0, scan.xyz, scan.mask, cov6, best0))

    # init from the true pose: in-pipeline registration starts from a
    # prediction within ~0.1 m, not from identity 10 m away (an identity
    # seed here measured 19 ms of non-representative GN iterations)
    T_pred = jnp.asarray(seq.poses[10], jnp.float32)
    report("vgicp_align_full", timed(
        lambda e, sx, sm, c6, tm_, tc, tk, Tp: jnp.sum(vgicp_align(
            sx + e, tm_, tc, sm, tk, src_cov6=c6, init_transform=Tp,
            cfg=gicp, tgt_count=sub_n).transform),
        scan.xyz, scan.mask, cov6, sub_mean, sub_cov, submask, T_pred))

    # r5 frame-parallel blocked registration: ONE joint GN for 8 frames
    # against the frozen submap (vgicp_align_block) — compare against
    # 8 x vgicp_align_full to see the orchestration amortization
    from icp4dradar_tpu.registration.vgicp import vgicp_align_block

    B = 8
    preds8 = jnp.stack([
        jnp.asarray(seq.poses[10], jnp.float32).at[0, 3].add(0.05 * k)
        for k in range(B)])
    scans8 = jnp.stack([scan.xyz + 0.01 * k for k in range(B)])
    masks8 = jnp.broadcast_to(scan.mask, (B,) + scan.mask.shape)
    cov8 = jnp.broadcast_to(cov6, (B,) + cov6.shape)
    report("vgicp_align_block8", timed(
        lambda e, sx, sm, c6, tm_, tc, tk, Tp: jnp.sum(vgicp_align_block(
            sx + e, tm_, tc, sm, tk, c6, Tp,
            cfg=gicp, tgt_count=sub_n)[0].transform),
        scans8, masks8, cov8, sub_mean, sub_cov, submask, preds8))

    report("insert", timed(
        lambda e, vm, s, c: jnp.sum(voxel_map_insert(
            vm, s.xyz + c[None, :] + e, s.mask, s.intensity).occupied),
        vm, scan, center))

    report("insert_16k_block", timed(
        lambda e, vm, s, c: jnp.sum(voxel_map_insert(
            vm, (s + c[None, :] + e).reshape(-1, 3),
            jnp.ones(s.shape[0] * s.shape[1], jnp.float32)).occupied),
        vm, scans8, center))

    # default forget_radius is inf (disabled); time a realistic finite one
    report("forget_far_160m", timed(
        lambda e, vm, c: jnp.sum(voxel_map_forget_far(
            vm, c + e, 2.0 * vmcfg.sector_radius).occupied),
        vm, center))

    out = {"bench": "stage_times_r5", "backend": jax.default_backend(),
           "reps": reps, "floor_ms": round(floor * 1e3, 4),
           "stages_ms": rows,
           "note": ("carried-chain in-jit timing, floor-subtracted; "
                    "per-frame blocked-mode budget = reve + src_cov + "
                    "sweep/frozen mix + (sector+insert+forget)/block")}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
