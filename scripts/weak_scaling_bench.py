#!/usr/bin/env python
"""Weak-scaling benchmark: constant work PER DEVICE, compute-dominated sizes.

Round-1's scaling_bench.py strong-scaled a ~12 ms problem on the virtual
CPU mesh and (correctly) measured garbage. This bench fixes both axes:

- WEAK scaling: each device gets the same shard size; total work grows
  with the mesh (>=100k point factors at 8 devices; >=16k submap voxels
  per device for the ring sweep).
- An honest metric for a VIRTUAL mesh. All N virtual devices share this
  host's cores, so wall-clock "efficiency" cannot reach N-device ideals by
  construction. What the host CAN measure is whether the implementation is
  WORK-CONSERVING: aggregate throughput (work/second summed over devices)
  at N devices vs 1 device. If throughput stays flat while total work
  grows N-fold, the distributed path adds no overhead beyond the shared
  cores — on real chips (each with private compute) the same program's
  weak-scaling efficiency is then bounded by collective latency, not
  implementation. The collective floor is measured separately by shrinking
  per-device work toward zero.

Outputs docs/scaling_r2.json-shaped JSON on stdout.

Usage: python scripts/weak_scaling_bench.py [--devices 1 2 4 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _best_of(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--factors-per-dev", type=int, default=25000)
    p.add_argument("--keyframes", type=int, default=256)
    p.add_argument("--voxels-per-dev", type=int, default=16384)
    p.add_argument("--scan-points", type=int, default=4096)
    p.add_argument("--gn-iters", type=int, default=8)
    args = p.parse_args(argv)

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags
            + f" --xla_force_host_platform_device_count={max(args.devices)}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from icp4dradar_tpu.config import PoseGraphConfig
    from icp4dradar_tpu.geom import se3_exp
    from icp4dradar_tpu.graph import PoseGraph, PointFactors, RelPoseFactors
    from icp4dradar_tpu.parallel import (
        distributed_optimize_pose_graph_block,
        make_mesh,
        ring_vgicp_normal_equations,
    )

    rng = np.random.default_rng(0)
    ncores = os.cpu_count() or 1
    out = {
        "bench": "weak_scaling_r2",
        "environment": (
            f"cpu:{max(args.devices)} virtual devices on {ncores} host cores"
            " — work-conserving throughput methodology (see script docstring)"
        ),
        "benches": [],
    }

    # ---------------- distributed pose-graph GN (full jitted loop) --------
    K = args.keyframes
    step = np.asarray(
        se3_exp(jnp.asarray([1, 0, 0, 0, 0, 0.05], dtype=jnp.float32)))
    poses = [np.eye(4, dtype=np.float32)]
    for _ in range(K - 1):
        poses.append(poses[-1] @ step)
    poses = jnp.asarray(np.stack(poses))
    i = np.arange(K - 1, dtype=np.int32)
    rel = RelPoseFactors.build(i, i + 1, np.stack([step] * (K - 1)))
    # fixed-iteration GN for comparability across mesh sizes
    cfg = PoseGraphConfig(max_iterations=args.gn_iters, convergence_eps=0.0)

    def gn_graph(n_factors):
        ks = rng.integers(0, K, n_factors).astype(np.int32)
        p_body = rng.normal(size=(n_factors, 3)).astype(np.float32) * 10
        q_world = (
            np.einsum("kij,kj->ki", np.asarray(poses)[ks, :3, :3], p_body)
            + np.asarray(poses)[ks, :3, 3]
        )
        pts = PointFactors.build(ks, p_body, q_world.astype(np.float32))
        return PoseGraph(poses=poses, rel=rel, points=pts)

    rows = []
    thr1 = None
    for n in args.devices:
        if n > len(jax.devices()):
            continue
        W = n * args.factors_per_dev
        graph = gn_graph(W)
        mesh = make_mesh(n)
        g2, cost = distributed_optimize_pose_graph_block(graph, mesh, cfg)
        jax.block_until_ready(g2.poses)

        def run(graph=graph, mesh=mesh):
            g2, _ = distributed_optimize_pose_graph_block(graph, mesh, cfg)
            jax.block_until_ready(g2.poses)

        dt = _best_of(run)
        thr = W * args.gn_iters / dt
        if thr1 is None:
            thr1 = thr
        rows.append({
            "devices": n, "total_point_factors": W,
            "factors_per_dev": args.factors_per_dev,
            "time_ms": round(dt * 1e3, 1),
            "factor_iters_per_sec": round(thr, 1),
            "work_conserving_efficiency": round(thr / thr1, 3),
        })
    # collective floor: near-zero per-device work, same program shape
    nmax = max(n for n in args.devices if n <= len(jax.devices()))
    tiny = gn_graph(nmax)
    mesh = make_mesh(nmax)
    g2, _ = distributed_optimize_pose_graph_block(tiny, mesh, cfg)
    jax.block_until_ready(g2.poses)
    floor = _best_of(lambda: jax.block_until_ready(
        distributed_optimize_pose_graph_block(tiny, mesh, cfg)[0].poses))

    # ---- per-stage decomposition (round-2 VERDICT weak #3: the full-run
    # row can be 100% replicated-solve floor; time the SHARDED assembly and
    # the REPLICATED PCG separately so each stage's scaling is visible) ----
    from icp4dradar_tpu.parallel import distributed_block_normal_equations
    from icp4dradar_tpu.graph.block_solver import (
        BlockNormalEq, block_normal_equations, solve_block_step,
        split_chain_loops,
    )

    stage_rows = []
    for n in args.devices:
        if n > len(jax.devices()):
            continue
        W = n * args.factors_per_dev
        graph = gn_graph(W)
        mesh = make_mesh(n)
        d0, o0, g0, c0 = distributed_block_normal_equations(graph, mesh, cfg)
        jax.block_until_ready(d0)
        dt_asm = _best_of(lambda: jax.block_until_ready(
            distributed_block_normal_equations(graph, mesh, cfg)[0]))
        thr_asm = W / dt_asm
        stage_rows.append({
            "devices": n, "total_point_factors": W,
            "assembly_ms": round(dt_asm * 1e3, 1),
            "assembly_factors_per_sec": round(thr_asm, 1),
            "assembly_work_conserving_efficiency": round(
                thr_asm / (stage_rows[0]["assembly_factors_per_sec"]
                           if stage_rows else thr_asm), 3),
        })
    # replicated PCG solve at fixed K — runs identically on every device,
    # so its wall-clock is mesh-size-independent BY DESIGN; this is the
    # floor the full-loop rows sit on
    big = gn_graph(args.factors_per_dev)
    chain, loops = split_chain_loops(big.rel)
    ne = block_normal_equations(big.replace(rel=None), chain, loops, cfg)
    jax.block_until_ready(ne.diag)
    solve_jit = jax.jit(lambda ne, p: solve_block_step(ne, p, cfg)[0])
    jax.block_until_ready(solve_jit(ne, big.poses))
    dt_solve = _best_of(lambda: jax.block_until_ready(
        solve_jit(ne, big.poses)))

    out["benches"].append({
        "name": "distributed_pose_graph_gn_block_weak",
        "keyframes": K, "gn_iterations": args.gn_iters,
        "collective_floor_ms_at_max_devices": round(floor * 1e3, 1),
        "replicated_pcg_solve_ms_per_iteration": round(dt_solve * 1e3, 1),
        "results": rows,
        "per_stage": stage_rows,
    })

    # ---------------- ring VGICP sweep ------------------------------------
    N = args.scan_points
    sx = rng.normal(size=(N, 3)).astype(np.float32) * 20
    sm = np.ones(N, np.float32)
    sc = np.broadcast_to(
        np.asarray([0.05, 0.05, 0.05, 0, 0, 0], np.float32), (N, 6)).copy()
    rows = []
    thr1 = None
    for n in args.devices:
        if n > len(jax.devices()):
            continue
        M = n * args.voxels_per_dev
        tm = rng.normal(size=(M, 3)).astype(np.float32) * 20
        tc = np.broadcast_to(
            np.asarray([0.05, 0.05, 0.05, 0, 0, 0], np.float32),
            (M, 6)).copy()
        tmask = np.ones(M, np.float32)
        mesh = make_mesh(n)
        T = jnp.eye(4)
        H, *_ = ring_vgicp_normal_equations(
            T, sx, sm, sc, tm, tc, tmask, mesh)
        jax.block_until_ready(H)

        def run(tm=tm, tc=tc, tmask=tmask, mesh=mesh):
            H, *_ = ring_vgicp_normal_equations(
                jnp.eye(4), sx, sm, sc, tm, tc, tmask, mesh)
            jax.block_until_ready(H)

        dt = _best_of(run)
        # work = N scan points swept against M voxels
        thr = N * M / dt
        if thr1 is None:
            thr1 = thr
        rows.append({
            "devices": n, "map_voxels_total": M,
            "voxels_per_dev": args.voxels_per_dev,
            "time_ms": round(dt * 1e3, 1),
            "point_voxel_pairs_per_sec": round(thr, 1),
            "work_conserving_efficiency": round(thr / thr1, 3),
        })
    out["benches"].append({
        "name": "ring_vgicp_sweep_weak",
        "scan_points": N,
        "results": rows,
    })

    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
