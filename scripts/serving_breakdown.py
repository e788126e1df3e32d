#!/usr/bin/env python
"""Per-stage breakdown of multi-stream (batched) scan-to-map serving.

Round-2 finding (VERDICT weak #2): B=4 independent streams yield only
1.41x aggregate throughput over one stream. This script times each stage
of the tracked-frame step UNDER vmap at B = 1, 2, 4, 8 to locate the
non-amortizing cost:

  - sector query + per-voxel Gaussian stats (mask_compact sort over C)
  - batched insert (sort + probe-round scatters over C)
  - fused VGICP registration sweep (compute-bound; should scale ~B)
  - REVE preprocessing (compute-bound)

Interpretation: a stage whose ms/call is flat in B amortizes perfectly
(fixed op-count cost dominates); a stage whose ms/call grows ~B is
compute/bandwidth-bound and B streams genuinely cost B work. The aggregate
ceiling is set by the bound stages; PERFORMANCE.md gets the verdict.

Usage: python scripts/serving_breakdown.py [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(out):
    """Wait for a jitted call by materializing its SMALLEST output leaf:
    jax.block_until_ready is a no-op through the axon tunnel (measured
    returning in 0.1 ms while the computation takes 113 ms — bench.py
    note), while a host transfer waits for the whole executable."""
    import jax
    import numpy as np

    leaves = jax.tree.leaves(out)
    np.asarray(min(leaves, key=lambda l: getattr(l, "size", 1)))


def _best_of(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--points", type=int, default=2048)
    p.add_argument("--capacity", type=int, default=1 << 18)
    p.add_argument("--submap", type=int, default=1 << 14)
    args = p.parse_args(argv)
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from icp4dradar_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache(min_compile_secs=5)
    import jax.numpy as jnp
    import numpy as np

    from icp4dradar_tpu.config import PipelineConfig
    from icp4dradar_tpu.io import SyntheticSequence
    from icp4dradar_tpu.io.scan import stack_scans
    from icp4dradar_tpu.mapping import voxel_map_create, voxel_map_insert
    from icp4dradar_tpu.mapping.voxel_hash import (
        voxel_map_sector_search_with_stats,
    )
    from icp4dradar_tpu.ops.vgicp_fused import radar_point_covariances_packed
    from icp4dradar_tpu.preprocess.reve import estimate_ego_velocity
    from icp4dradar_tpu.registration.vgicp import vgicp_align

    cfg = PipelineConfig().override(**{
        "voxel_map.capacity": args.capacity,
        "voxel_map.submap_max_points": args.submap,
    })
    N = args.points
    Bmax = max(args.batches)
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    # Bmax independent sequences -> per-stream maps + one scan each
    seqs = [SyntheticSequence(
        num_frames=10, max_points=N, num_landmarks=5000,
        world_extent=120.0, max_range=80.0, seed=b) for b in range(Bmax)]
    vms = []
    scans_list = []
    for b, seq in enumerate(seqs):
        vm = voxel_map_create(capacity=args.capacity,
                              voxel_size=cfg.voxel_map.voxel_size)
        for k in range(8):
            s = seq.scan(k)
            world = jnp.einsum(
                "ij,nj->ni", jnp.asarray(seq.poses[k][:3, :3]), s.xyz
            ) + jnp.asarray(seq.poses[k][:3, 3])
            vm = voxel_map_insert(vm, world, s.mask, s.intensity)
        vms.append(vm)
        scans_list.append(seq.scan(9))
    scan_all = stack_scans(scans_list)                 # (Bmax, N, ...)
    vm_all = jax.tree.map(lambda *xs: jnp.stack(xs), *vms)
    centers = jnp.asarray(np.stack(
        [seqs[b].poses[9][:3, 3] for b in range(Bmax)]))
    key = jax.random.key(0)
    keys = jax.random.split(key, Bmax)

    vmcfg = cfg.voxel_map
    gicp = cfg.gicp

    def stage_sector(vm, c):
        return voxel_map_sector_search_with_stats(
            vm, c, vmcfg.sector_radius, jnp.asarray(0.0), 180.0,
            vmcfg.submap_max_points)[2]

    def stage_insert(vm, scan, c):
        world = scan.xyz + c[None, :]
        return voxel_map_insert(vm, world, scan.mask,
                                scan.intensity).occupied.sum()

    def stage_reve(scan, k):
        return estimate_ego_velocity(scan, k, cfg.reve).velocity

    def stage_vgicp(vm, scan, c):
        _, submask, sub_n, sub_mean, sub_cov = (
            voxel_map_sector_search_with_stats(
                vm, c, vmcfg.sector_radius, jnp.asarray(0.0), 180.0,
                vmcfg.submap_max_points))
        cov6 = radar_point_covariances_packed(
            scan.xyz, gicp.sigma_range, gicp.sigma_azimuth,
            gicp.sigma_elevation)
        T0 = jnp.eye(4, dtype=scan.xyz.dtype).at[:3, 3].set(c)
        g = vgicp_align(scan.xyz, sub_mean, sub_cov, scan.mask, submask,
                        src_cov6=cov6, init_transform=T0, cfg=gicp,
                        tgt_count=sub_n)
        return g.transform

    # ONE jit object per stage (re-wrapping per call would re-trace every
    # timing sample and measure trace/cache-load time, not runtime)
    sector_j = jax.jit(jax.vmap(stage_sector))
    insert_j = jax.jit(jax.vmap(stage_insert))
    reve_j = jax.jit(jax.vmap(stage_reve))
    vgicp_j = jax.jit(jax.vmap(stage_vgicp))

    stages = {
        "sector_query_stats": (
            lambda B: sector_j(
                jax.tree.map(lambda x: x[:B], vm_all), centers[:B])),
        "insert": (
            lambda B: insert_j(
                jax.tree.map(lambda x: x[:B], vm_all),
                jax.tree.map(lambda x: x[:B], scan_all), centers[:B])),
        "reve": (
            lambda B: reve_j(
                jax.tree.map(lambda x: x[:B], scan_all), keys[:B])),
        "vgicp_register": (
            lambda B: vgicp_j(
                jax.tree.map(lambda x: x[:B], vm_all),
                jax.tree.map(lambda x: x[:B], scan_all), centers[:B])),
    }

    out = {"bench": "serving_breakdown_r4",
           "backend": jax.default_backend(),
           "points": N, "capacity": args.capacity,
           "submap_max_points": args.submap, "stages": {}}
    for name, fn in stages.items():
        rows = []
        for B in args.batches:
            if B > Bmax:
                continue
            _sync(fn(B))                     # compile
            dt = _best_of(lambda: _sync(fn(B)))
            rows.append({"B": B, "ms": round(dt * 1e3, 3),
                         "ms_per_stream": round(dt * 1e3 / B, 3)})
            print(f"{name} B={B}: {dt*1e3:.3f} ms "
                  f"({dt*1e3/B:.3f} ms/stream)", file=sys.stderr)
        # amortization factor: B_max streams cost this multiple of B=1
        if len(rows) > 1:
            growth = rows[-1]["ms"] / rows[0]["ms"]
        else:
            growth = 1.0
        out["stages"][name] = {
            "rows": rows,
            "cost_growth_Bmax_vs_1": round(growth, 3),
            "verdict": ("amortizes (fixed-cost dominated)" if growth < 1.8
                        else "compute/bandwidth-bound (scales with B)"),
        }

    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
