"""CLI entry point: run an odometry pipeline over a .bin sequence directory
(or a built-in synthetic sequence) and write reference-compatible outputs.

Replaces the reference's roslaunch entries (launch/icp4radar.launch,
launch/radar_odometry.launch) with a plain CLI:

    python -m icp4dradar_tpu.models.run_odometry \
        --mode scan_to_scan --dataset /path/to/seq --out /tmp/radar

    python -m icp4dradar_tpu.models.run_odometry \
        --mode scan_to_map --synthetic 200 --out /tmp/radar

Outputs (reference L7 formats, SURVEY.md §1): velocity.txt, icp.txt,
output_result.csv, odom_tum.txt, metrics.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_scans(args):
    import jax.numpy as jnp
    from icp4dradar_tpu.io import BinSequenceDataset, SyntheticSequence
    from icp4dradar_tpu.io.scan import stack_scans

    if args.dataset:
        ds = BinSequenceDataset(args.dataset, max_points=args.max_points)
        scans = [ds[k] for k in range(len(ds))]
        gt_poses = None
    else:
        seq = SyntheticSequence(
            num_frames=args.synthetic, max_points=args.max_points,
            num_landmarks=args.landmarks, seed=args.seed,
        )
        scans = [seq.scan(k) for k in range(len(seq))]
        gt_poses = seq.poses
    return stack_scans(scans), gt_poses


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=["scan_to_scan", "scan_to_map"],
                   default="scan_to_scan")
    p.add_argument("--dataset", help=".bin sequence directory (data/radar_pointcloud_k.bin)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate a synthetic sequence with F frames instead")
    p.add_argument("--landmarks", type=int, default=20000)
    p.add_argument("--max-points", type=int, default=2048)
    p.add_argument("--out", default="radar", help="output directory")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--config", help="JSON config file (PipelineConfig)")
    p.add_argument("--set", action="append", default=[],
                   help="dotted config override key=value")
    p.add_argument("--doppler-prior", action="store_true")
    p.add_argument("--static-only", action="store_true",
                   help="register on static points only (ref USE_STATIC_POINTS)")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = p.parse_args(argv)

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from icp4dradar_tpu.config import PipelineConfig
    from icp4dradar_tpu.models import run_scan_to_map, run_scan_to_scan
    from icp4dradar_tpu.utils import (
        MetricsLogger, ate_rmse, write_result_csv, write_rt_txt, write_tum,
        write_velocity_txt,
    )

    cfg = PipelineConfig()
    if args.config:
        cfg = PipelineConfig.from_json(open(args.config).read())
    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        overrides[k] = json.loads(v)
    if overrides:
        cfg = cfg.override(**overrides)
    cfg = cfg.override(**{"max_points": args.max_points, "seed": args.seed})

    if not args.dataset and not args.synthetic:
        p.error("provide --dataset or --synthetic F")

    scans, gt_poses = build_scans(args)
    F = scans.xyz.shape[0]
    os.makedirs(args.out, exist_ok=True)
    log = MetricsLogger(os.path.join(args.out, "metrics.jsonl"), echo=False)

    t0 = time.time()
    if args.mode == "scan_to_scan":
        outs = run_scan_to_scan(
            scans, cfg, use_doppler_prior=args.doppler_prior,
            use_static_points_only=args.static_only,
        )
        jax.block_until_ready(outs.world_T)
        elapsed = time.time() - t0
        poses = np.asarray(outs.world_T)
        write_velocity_txt(os.path.join(args.out, "velocity.txt"),
                           np.asarray(outs.velocity))
        write_rt_txt(os.path.join(args.out, "icp.txt"),
                     np.asarray(outs.icp_transform))
        write_result_csv(
            os.path.join(args.out, "output_result.csv"),
            np.asarray(outs.icp_transform), np.asarray(outs.fitness),
            np.asarray(outs.sine_A), np.asarray(outs.sine_b),
        )
    else:
        state, outs = run_scan_to_map(
            scans, cfg, use_doppler_prior=not args.static_only or args.doppler_prior,
        )
        jax.block_until_ready(outs.world_T)
        elapsed = time.time() - t0
        poses = np.asarray(outs.world_T)
        write_velocity_txt(os.path.join(args.out, "velocity.txt"),
                           np.asarray(outs.velocity))
        write_rt_txt(os.path.join(args.out, "radar_odometry.txt"), poses)

    write_tum(os.path.join(args.out, "odom_tum.txt"), poses)
    scans_per_sec = F / elapsed
    rec = {"frames": F, "elapsed_s": round(elapsed, 3),
           "scans_per_sec": round(scans_per_sec, 2)}
    if gt_poses is not None:
        rec["ate_rmse_m"] = round(ate_rmse(poses[:, :3, 3], gt_poses[:, :3, 3]), 4)
    log.log("run_complete", mode=args.mode, **rec)
    print(json.dumps({"mode": args.mode, **rec}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
