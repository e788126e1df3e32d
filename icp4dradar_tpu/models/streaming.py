"""Streaming (online) odometry session with checkpoint / resume-at-scan-k.

The offline pipelines (run_scan_to_scan / run_scan_to_map) lax.scan whole
sequences in one dispatch; this wrapper serves the live/production case: one
jitted step per incoming scan, persistent state, and durable snapshots so a
crashed process resumes from the latest {pose, map, frame index} snapshot —
the failure-recovery subsystem the reference lacks entirely (SURVEY.md §5:
its only analog is the CSV record/replay fixture).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np

from icp4dradar_tpu.config import PipelineConfig
from icp4dradar_tpu.io.scan import RadarScan
from icp4dradar_tpu.models.scan_to_map import (
    ScanToMapOutput,
    ScanToMapState,
    run_scan_to_map_blocked,
    scan_to_map_init,
    scan_to_map_step,
)
from icp4dradar_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


class OdometrySession:
    """Online scan-to-map odometry with periodic durable checkpoints."""

    def __init__(
        self,
        cfg: PipelineConfig = PipelineConfig(),
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 50,
        use_doppler_prior: bool = True,
        guard_nonfinite: bool = True,
    ):
        self.cfg = cfg
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        self.guard_nonfinite = guard_nonfinite
        self.frame = 0
        self.skipped_frames = 0
        self.state: ScanToMapState = scan_to_map_init(cfg)
        self._key = jax.random.key(cfg.seed)
        self._step = jax.jit(
            lambda st, sc, k: scan_to_map_step(
                st, sc, k, cfg, use_doppler_prior=use_doppler_prior
            )
        )
        self._use_doppler_prior = use_doppler_prior
        self._batch_runs = {}       # (B, block) -> jitted micro-batch run

    # ------------------------------------------------------------------
    def process(self, scan: RadarScan) -> ScanToMapOutput:
        """Track one scan; returns the per-frame output record.

        With `guard_nonfinite`, a frame whose pose update goes non-finite
        (degenerate scan, solver blow-up) is skipped: the previous state is
        kept and `skipped_frames` incremented — the failure-containment the
        reference has no counterpart for (SURVEY.md §5).
        """
        self._key, sub = jax.random.split(self._key)
        new_state, out = self._step(self.state, scan, sub)
        if self.guard_nonfinite and not bool(
            jax.numpy.isfinite(new_state.world_T).all()
        ):
            self.skipped_frames += 1
        else:
            self.state = new_state
        self.frame += 1
        if (
            self.checkpoint_dir
            and self.checkpoint_every
            and self.frame % self.checkpoint_every == 0
        ):
            self.checkpoint()
        return out

    def process_batch(self, scans: RadarScan,
                      block: int = 0) -> ScanToMapOutput:
        """Track a micro-batch of B stacked frames in ONE device dispatch.

        The per-frame `process` path pays a full host->device dispatch per
        scan (~25 ms through the axon tunnel — a ~40 scans/s ceiling no
        matter how fast the step kernel is); feeding B buffered frames at
        once amortizes that to 25/B ms while the prefetching bag/bin
        loaders (native/) hide the decode latency of the NEXT batch behind
        the device step of the current one. `block` > 1 additionally runs
        the frame-parallel blocked tracker inside the batch (one sector
        query + one insert per block; needs B % block == 0).

        State semantics match B sequential `process` calls (same map, same
        pose chain); per-frame outputs return stacked (B, ...). The
        nonfinite guard applies to the whole batch (a poisoned map cannot
        be unwound per-frame): if the batch's final pose is nonfinite the
        ENTIRE batch is skipped and skipped_frames += B.
        """
        B = int(scans.xyz.shape[0])
        self._key, sub = jax.random.split(self._key)
        key = (B, block)
        if key not in self._batch_runs:
            cfg, udp = self.cfg, self._use_doppler_prior
            self._batch_runs[key] = jax.jit(
                lambda st, sc, k: run_scan_to_map_blocked(
                    sc, cfg, key=k, block=block,
                    use_doppler_prior=udp, init_state=st))
        new_state, outs = self._batch_runs[key](self.state, scans, sub)
        if self.guard_nonfinite and not bool(
            jax.numpy.isfinite(new_state.world_T).all()
        ):
            self.skipped_frames += B
        else:
            self.state = new_state
        self.frame += B
        if (
            self.checkpoint_dir
            and self.checkpoint_every
            and self.frame % self.checkpoint_every < B
        ):
            self.checkpoint()
        return outs

    @property
    def pose(self) -> np.ndarray:
        return np.asarray(self.state.world_T)

    # ------------------------------------------------------------------
    def _ckpt_path(self) -> str:
        assert self.checkpoint_dir is not None
        return os.path.join(self.checkpoint_dir, "session")

    def checkpoint(self) -> str:
        """Durable snapshot of {pose, map, frame index, rng key}."""
        path = self._ckpt_path()
        # typed PRNG keys don't serialize as plain arrays: store raw key data
        save_checkpoint(
            path, (self.state, jax.random.key_data(self._key)),
            {"frame": self.frame},
        )
        return path + ".npz"

    def resume(self) -> int:
        """Restore the latest snapshot; returns the frame index to continue
        from (scans [frame, ...) must be re-fed)."""
        (state, key_data), meta = load_checkpoint(
            self._ckpt_path(), (self.state, jax.random.key_data(self._key))
        )
        # numpy leaves -> device arrays with original dtypes/structure
        self.state = jax.tree.map(jax.numpy.asarray, state)
        self._key = jax.random.wrap_key_data(jax.numpy.asarray(key_data))
        self.frame = int(meta["frame"])
        return self.frame

    @classmethod
    def has_checkpoint(cls, checkpoint_dir: str) -> bool:
        return os.path.exists(os.path.join(checkpoint_dir, "session.npz"))
