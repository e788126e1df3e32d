#!/usr/bin/env python
"""Distributed pose-graph scaling benchmark.

Measures distributed Gauss-Newton normal-equation assembly throughput
(factors/s) across mesh sizes, plus the equality check vs the single-device
solver. On real multi-chip hardware this yields the scaling-efficiency
metric from BASELINE.md; on a virtual CPU mesh (this container: one real TPU
chip, so multi-chip runs use XLA_FLAGS=--xla_force_host_platform_device_count)
the numbers validate mechanics only — virtual devices share host cores, so
reported "efficiency" is not hardware scaling. The environment is recorded
in the output.

Usage: python scripts/scaling_bench.py [--devices 1 2 4 8] [--factors 20000]
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
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--keyframes", type=int, default=64)
    p.add_argument("--factors", type=int, default=20000)
    p.add_argument("--cpu", action="store_true",
                   help="force CPU backend with virtual devices")
    args = p.parse_args(argv)

    # One real chip in this container; multi-device runs need the virtual
    # CPU mesh. The sitecustomize pins JAX_PLATFORMS=axon, so override hard.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={max(args.devices)}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from icp4dradar_tpu.config import PoseGraphConfig
    from icp4dradar_tpu.geom import se3_apply, se3_exp
    from icp4dradar_tpu.graph import PoseGraph, PointFactors, RelPoseFactors
    from icp4dradar_tpu.graph.gauss_newton import pose_graph_normal_equations
    from icp4dradar_tpu.parallel import distributed_normal_equations, make_mesh

    rng = np.random.default_rng(0)
    K = args.keyframes
    # chain of poses + dense point factors
    poses = [np.eye(4, dtype=np.float32)]
    step = np.asarray(se3_exp(jnp.asarray([1, 0, 0, 0, 0, 0.05], dtype=jnp.float32)))
    for _ in range(K - 1):
        poses.append(poses[-1] @ step)
    poses = jnp.asarray(np.stack(poses))
    i = np.arange(K - 1, dtype=np.int32)
    rel = RelPoseFactors.build(i, i + 1, np.stack([step] * (K - 1)))
    Pn = args.factors
    ks = rng.integers(0, K, Pn).astype(np.int32)
    p_body = rng.normal(size=(Pn, 3)).astype(np.float32) * 10
    q_world = np.stack([
        np.asarray(se3_apply(poses[k], jnp.asarray(pb)))
        for k, pb in zip(ks[:1], p_body[:1])
    ])
    # vectorized world points
    q_world = np.einsum("kij,kj->ki", np.asarray(poses)[ks, :3, :3], p_body) + \
        np.asarray(poses)[ks, :3, 3]
    pts = PointFactors.build(ks, p_body, q_world.astype(np.float32))
    graph = PoseGraph(poses=poses, rel=rel, points=pts)
    cfg = PoseGraphConfig()

    H1, g1, c1 = pose_graph_normal_equations(graph, cfg)
    jax.block_until_ready(H1)

    results = []
    for n in args.devices:
        if n > len(jax.devices()):
            continue
        mesh = make_mesh(n)
        H, g, c = distributed_normal_equations(graph, mesh, cfg)
        jax.block_until_ready(H)
        ok = bool(jnp.allclose(H, H1, rtol=1e-3, atol=1e-3))
        ts = []
        for _ in range(3):
            t0 = time.time()
            H, g, c = distributed_normal_equations(graph, mesh, cfg)
            jax.block_until_ready(H)
            ts.append(time.time() - t0)
        dt = min(ts)
        results.append({
            "devices": n, "time_ms": round(dt * 1e3, 2),
            "factors_per_sec": round((Pn + K - 1) / dt, 1),
            "matches_single_device": ok,
        })

    base = results[0]["time_ms"] if results else 1.0
    for r in results:
        r["speedup"] = round(base / r["time_ms"], 3)
        r["efficiency"] = round(r["speedup"] / r["devices"], 3)

    out = {
        "bench": "distributed_pose_graph_assembly",
        "environment": f"{jax.default_backend()}:{len(jax.devices())}dev"
        + (" (virtual-device mesh: validates mechanics, not hardware scaling)"
           if jax.default_backend() == "cpu" else ""),
        "keyframes": K, "point_factors": Pn,
        "results": results,
    }
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
