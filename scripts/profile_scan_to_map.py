#!/usr/bin/env python
"""Stage-level timing for the scan-to-map tracked-frame step on the real TPU.

Times each stage of models/scan_to_map.py::scan_to_map_step in isolation by
lax.scan-ing ONLY that stage over a prebuilt sequence (per-dispatch latency
through the axon tunnel is ~25 ms, so everything must run inside one jit):

  insert      voxel_map_insert of F frames into one map
  sector      voxel_map_sector_search_with_stats per frame (fixed map)
  vgicp       vgicp_align per frame (fixed submap)
  reve        estimate_ego_velocity per frame
  full        the complete scan_to_map_step

Usage: python scripts/profile_scan_to_map.py [--frames 64] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
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

    from icp4dradar_tpu.config import PipelineConfig
    from icp4dradar_tpu.geom import se3_apply
    from icp4dradar_tpu.geom.so3 import matrix_to_rpy
    from icp4dradar_tpu.io import SyntheticSequence
    from icp4dradar_tpu.io.scan import stack_scans
    from icp4dradar_tpu.mapping import voxel_map_insert
    from icp4dradar_tpu.mapping.voxel_hash import (
        voxel_map_sector_search_with_stats,
    )
    from icp4dradar_tpu.models.scan_to_map import (
        run_scan_to_map,
        scan_to_map_init,
    )
    from icp4dradar_tpu.ops.vgicp_fused import radar_point_covariances_packed
    from icp4dradar_tpu.preprocess.reve import estimate_ego_velocity
    from icp4dradar_tpu.registration.vgicp import vgicp_align

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    F = args.frames
    cfg = PipelineConfig()
    vmcfg = cfg.voxel_map

    seq = SyntheticSequence(
        num_frames=F, max_points=2048, num_landmarks=5000,
        world_extent=120.0, max_range=80.0, dynamic_fraction=0.1,
        speed=1.0, turn_rate=0.02, seed=0,
    )
    scans = jax.device_put(stack_scans([seq.scan(k) for k in range(F)]))
    gt = jnp.asarray(seq.poses)
    keys = jax.random.split(jax.random.key(0), F)
    jax.block_until_ready(scans.xyz)

    # Prebuilt map (run the real pipeline once) + a fixed submap/pose for the
    # isolated registration stage.
    state, outs = jax.jit(lambda s: run_scan_to_map(s, cfg))(scans)
    jax.block_until_ready(state.vmap.points)
    vmap0 = state.vmap
    pose0 = outs.world_T[F // 2]
    heading0 = matrix_to_rpy(pose0[:3, :3])[2]
    sub, submask, sub_n, smean, scov = voxel_map_sector_search_with_stats(
        vmap0, pose0[:3, 3], vmcfg.sector_radius, heading0,
        vmcfg.sector_half_angle_deg, vmcfg.submap_max_points,
    )
    jax.block_until_ready(smean)

    def timeit(name, fn, *xs):
        f = jax.jit(fn)
        out = f(*xs)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = f(*xs)
            jax.block_until_ready(out)
            best = min(best, time.time() - t0)
        print(f"{name:>10}: {best * 1e3 / F:7.3f} ms/frame  "
              f"({best * 1e3:8.2f} ms total)", file=sys.stderr)
        return best

    # --- insert: F sequential inserts into one growing map
    def insert_only(scans):
        def step(vm, scan):
            world = se3_apply(pose0, scan.xyz)
            return voxel_map_insert(vm, world, scan.mask, scan.intensity), 0
        init = scan_to_map_init(cfg).vmap
        vm, _ = jax.lax.scan(step, init, scans)
        return vm.occupied

    # --- sector query per frame against the fixed prebuilt map
    def sector_only(centers):
        def step(_, c):
            out = voxel_map_sector_search_with_stats(
                vmap0, c, vmcfg.sector_radius, heading0,
                vmcfg.sector_half_angle_deg, vmcfg.submap_max_points,
            )
            return 0, out[3].sum()
        _, s = jax.lax.scan(step, 0, centers)
        return s

    # --- vgicp registration per frame against the fixed submap
    def vgicp_only(scans):
        def step(_, scan):
            c6 = radar_point_covariances_packed(
                scan.xyz, cfg.gicp.sigma_range, cfg.gicp.sigma_azimuth,
                cfg.gicp.sigma_elevation)
            g = vgicp_align(scan.xyz, smean, scov, scan.mask, submask,
                            src_cov6=c6, init_transform=pose0, cfg=cfg.gicp,
                            tgt_count=sub_n)
            return 0, g.transform
        _, t = jax.lax.scan(step, 0, scans)
        return t

    # --- REVE per frame
    def reve_only(scans, keys):
        def step(_, inp):
            scan, k = inp
            est = estimate_ego_velocity(scan, k, cfg.reve)
            return 0, est.velocity
        _, v = jax.lax.scan(step, 0, (scans, keys))
        return v

    centers = gt[:, :3, 3]
    timeit("insert", insert_only, scans)
    timeit("sector", sector_only, centers)
    timeit("vgicp", vgicp_only, scans)
    timeit("reve", reve_only, scans, keys)
    timeit("full", lambda s: run_scan_to_map(s, cfg)[1].world_T, scans)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
