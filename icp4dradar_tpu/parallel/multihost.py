"""Multi-process / multi-host runtime: `jax.distributed` initialization,
global-device meshes, and `process_index`-sharded host data feeds.

SURVEY.md §5 (distributed-communication bullet) specifies the scaled-up
counterpart of the reference's single-process frame loop
(src/radar_odometry.cpp:244-308): "`jax.distributed` initialization +
`jax.sharding.Mesh` over pod slice; collectives over ICI within a slice and
DCN across hosts; host-side data loading per-process with
`process_index`-sharded scan feeds". This module is that runtime layer:

- `maybe_initialize_distributed()` joins the coordination service when the
  launcher environment announces one (`ICP4D_COORDINATOR` +
  `ICP4D_NUM_PROCESSES` + `ICP4D_PROCESS_ID`, e.g. exported per-task by a
  SLURM/GKE wrapper), and is a clean no-op for single-process runs — the
  same binary works on a laptop, one chip, or a pod slice.
- `global_mesh()` builds the Mesh from jax.devices() — the GLOBAL device
  list after initialization, so the same `run_scan_to_map_distributed`
  program spans every host's chips with XLA routing collectives over
  ICI inside a slice and DCN across slices.
- `process_frame_slice()` is the host-side feed contract: each process
  reads ONLY its contiguous 1/n_proc of the sequence from disk (the native
  prefetch loaders load by frame index, so a range feed is free) and
  `assemble_global_scans()` stitches the per-process shards into global
  jax.Arrays with `jax.make_array_from_process_local_data`.
- `run_scan_to_map_multihost()` is the end-to-end entry point wiring the
  above into `run_scan_to_map_distributed`.

Multi-host hardware cannot be exercised in this environment (one chip, one
process — BASELINE.md targets N>=2 hosts); the degenerate single-process
path runs the full pipeline in tests, and the n_proc>1 feed/sharding math
is asserted host-side (tests/test_multihost.py).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

COORD_ENV = "ICP4D_COORDINATOR"
NPROC_ENV = "ICP4D_NUM_PROCESSES"
PID_ENV = "ICP4D_PROCESS_ID"

_initialized = False


def maybe_initialize_distributed() -> Tuple[int, int]:
    """Join the jax.distributed coordination service iff the launcher
    environment announces one; returns (process_index, process_count).

    Launch contract (one process per host, all chips of that host local to
    it — the standard JAX multi-host model):

        ICP4D_COORDINATOR=host0:8476 ICP4D_NUM_PROCESSES=4 \
        ICP4D_PROCESS_ID=$RANK python -m icp4dradar_tpu.parallel.multihost ...

    Without the trio this is a no-op returning (0, 1): single-process runs
    (tests, one-chip deployments) never touch the coordination service.
    Idempotent — repeat calls skip re-initialization.
    """
    global _initialized
    import jax

    coord = os.environ.get(COORD_ENV)
    if coord and not _initialized:
        nproc = int(os.environ[NPROC_ENV])
        pid = int(os.environ[PID_ENV])
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=nproc, process_id=pid)
        _initialized = True
    if _initialized or coord:
        return jax.process_index(), jax.process_count()
    return 0, 1


def global_mesh(axis: str = "dp"):
    """1-D Mesh over ALL global devices (every process's chips). Must be
    called after maybe_initialize_distributed() so jax.devices() reports
    the pod-slice view, not the local host's."""
    import jax
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices())
    return Mesh(devs, (axis,))


def process_frame_slice(
    num_frames: int, process_count: int, process_index: int
) -> Tuple[int, int]:
    """Contiguous [start, stop) frame range process `process_index` must
    load from disk. Remainder frames go to the leading processes, so sizes
    differ by at most 1 and the union tiles [0, num_frames) exactly —
    asserted for all (F, n, p) in tests without needing n live processes."""
    if not 0 <= process_index < process_count:
        raise ValueError(f"process_index {process_index} outside "
                         f"[0, {process_count})")
    base, rem = divmod(num_frames, process_count)
    start = process_index * base + min(process_index, rem)
    stop = start + base + (1 if process_index < rem else 0)
    return start, stop


def pad_frames_for_mesh(num_frames: int, n_devices: int) -> int:
    """Frames are sharded over the mesh axis for preprocessing; the global
    count must divide evenly. Returns the padded frame count (pad scans are
    all-invalid masks downstream)."""
    return num_frames + (-num_frames) % n_devices


def assemble_global_scans(scans_local, mesh, axis: str = "dp",
                          process_count: int = 1):
    """Per-process local scan shard (frames [start, stop) of the global
    sequence, in process order) -> globally-sharded jax.Array pytree over
    `axis`.

    Single-process: the local shard IS the global array — returned as-is
    (the distributed pipeline shards it internally). Multi-process: every
    leaf becomes a global array via jax.make_array_from_process_local_data
    with frames sharded over the mesh axis; downstream programs consume it
    like any sharded operand (XLA inserts DCN/ICI resharding as needed).
    """
    if process_count == 1:
        return scans_local
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(axis))

    def leaf(x):
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree.map(leaf, scans_local)


def run_scan_to_map_multihost(
    scans_or_dataset,
    cfg=None,
    block: int = 0,
    use_doppler_prior: bool = True,
    use_const_velocity_rot: bool = False,
    priors=None,
    axis: str = "dp",
):
    """Multi-process entry point for the flagship distributed tracker.

    `scans_or_dataset`: either an indexable dataset (len() + [k] ->
    RadarScan — Bin/Pcd/bag datasets and the native prefetch loader all
    qualify) from which THIS process loads only its
    `process_frame_slice`, or an already-stacked RadarScan (single-process
    convenience / tests).

    Flow: maybe_initialize_distributed -> global_mesh -> per-process range
    load -> assemble_global_scans -> run_scan_to_map_distributed. Outputs
    (pose trajectory etc.) are replicated, so every process returns the
    full result. Single-process (no coordinator env) degenerates to exactly
    `run_scan_to_map_distributed` on the local mesh.
    """
    from icp4dradar_tpu.config import PipelineConfig
    from icp4dradar_tpu.io.scan import RadarScan, stack_scans
    from icp4dradar_tpu.parallel.distributed_pipeline import (
        run_scan_to_map_distributed,
    )

    cfg = cfg or PipelineConfig()
    pid, nproc = maybe_initialize_distributed()
    mesh = global_mesh(axis)

    if isinstance(scans_or_dataset, RadarScan):
        scans_local = scans_or_dataset
    else:
        ds = scans_or_dataset
        start, stop = process_frame_slice(len(ds), nproc, pid)
        scans_local = stack_scans([ds[k] for k in range(start, stop)])
    scans = assemble_global_scans(scans_local, mesh, axis,
                                  process_count=nproc)
    return run_scan_to_map_distributed(
        scans, mesh, cfg, block=block,
        use_doppler_prior=use_doppler_prior,
        use_const_velocity_rot=use_const_velocity_rot,
        priors=priors,
    )


def main(argv=None) -> int:
    """CLI launcher: one process per host.

        ICP4D_COORDINATOR=h0:8476 ICP4D_NUM_PROCESSES=N ICP4D_PROCESS_ID=r \
        python -m icp4dradar_tpu.parallel.multihost \
            --dataset /data/seq --out /tmp/radar --map-interval 8

    Every process writes outputs (they are replicated); point --out at
    per-process paths or let only process 0 write (default).
    """
    import argparse
    import json

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", help=".bin sequence directory")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--max-points", type=int, default=2048)
    p.add_argument("--map-interval", type=int, default=0)
    p.add_argument("--out", default="radar")
    p.add_argument("--all-procs-write", action="store_true")
    args = p.parse_args(argv)

    from icp4dradar_tpu.config import PipelineConfig
    from icp4dradar_tpu.utils import write_rt_txt, write_tum

    cfg = PipelineConfig().override(max_points=args.max_points)
    if args.dataset:
        from icp4dradar_tpu.io import BinSequenceDataset

        ds = BinSequenceDataset(args.dataset, max_points=args.max_points)
    elif args.synthetic:
        from icp4dradar_tpu.io import SyntheticSequence

        seq = SyntheticSequence(num_frames=args.synthetic,
                                max_points=args.max_points)
        ds = [seq.scan(k) for k in range(len(seq))]
    else:
        p.error("provide --dataset or --synthetic F")

    vm, outs = run_scan_to_map_multihost(ds, cfg, block=args.map_interval)
    pid, _ = maybe_initialize_distributed()
    if pid == 0 or args.all_procs_write:
        os.makedirs(args.out, exist_ok=True)
        poses = np.asarray(outs["world_T"])
        write_rt_txt(os.path.join(args.out, "radar_odometry.txt"), poses)
        write_tum(os.path.join(args.out, "odom_tum.txt"), poses)
        print(json.dumps({"frames": int(poses.shape[0]),
                          "process_index": pid}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
