"""Multi-process runtime layer (parallel/multihost.py, SURVEY.md §5
distributed-comm bullet): degenerate single-process execution of the full
entry point, plus host-side assertions of the n_proc>1 feed/sharding math
(multi-host hardware is not available here — BASELINE.md N>=2 hosts)."""

import numpy as np
import pytest

from icp4dradar_tpu.config import PipelineConfig
from icp4dradar_tpu.io import SyntheticSequence
from icp4dradar_tpu.io.scan import stack_scans
from icp4dradar_tpu.parallel import (
    assemble_global_scans,
    global_mesh,
    maybe_initialize_distributed,
    process_frame_slice,
    run_scan_to_map_multihost,
)


class TestFrameSliceMath:
    @pytest.mark.parametrize("F,n", [(64, 1), (64, 4), (65, 4), (7, 8),
                                     (100, 3), (1, 1), (8, 8)])
    def test_slices_tile_exactly(self, F, n):
        """Per-process ranges must be contiguous, ordered, size-balanced
        (diff <= 1) and tile [0, F) exactly — the host feed contract."""
        spans = [process_frame_slice(F, n, p) for p in range(n)]
        sizes = [b - a for a, b in spans]
        assert min(sizes) >= 0 and max(sizes) - min(sizes) <= 1
        assert spans[0][0] == 0 and spans[-1][1] == F
        for (a0, b0), (a1, b1) in zip(spans, spans[1:]):
            assert b0 == a1
        assert sum(sizes) == F

    def test_rejects_bad_index(self):
        with pytest.raises(ValueError):
            process_frame_slice(10, 4, 4)


class TestSingleProcessDegenerate:
    def test_no_coordinator_is_noop(self, monkeypatch):
        monkeypatch.delenv("ICP4D_COORDINATOR", raising=False)
        pid, nproc = maybe_initialize_distributed()
        assert (pid, nproc) == (0, 1)

    def test_assemble_passthrough(self):
        seq = SyntheticSequence(num_frames=4, max_points=256,
                                num_landmarks=1500)
        scans = stack_scans([seq.scan(k) for k in range(4)])
        mesh = global_mesh()
        out = assemble_global_scans(scans, mesh, process_count=1)
        assert out is scans

    def test_entry_point_matches_distributed(self, monkeypatch):
        """run_scan_to_map_multihost without a coordinator must execute the
        full distributed pipeline on the local (8 virtual device) mesh and
        reproduce run_scan_to_map_distributed exactly — the one binary that
        scales from laptop to pod slice."""
        monkeypatch.delenv("ICP4D_COORDINATOR", raising=False)
        from icp4dradar_tpu.parallel import (
            make_mesh, run_scan_to_map_distributed,
        )

        cfg = PipelineConfig().override(**{
            "voxel_map.capacity": 1 << 13,
            "voxel_map.submap_max_points": 1 << 11,
            "gicp.max_iterations": 15,
        })
        F = 16
        seq = SyntheticSequence(
            num_frames=F, max_points=512, num_landmarks=2500,
            world_extent=60.0, max_range=50.0, turn_rate=0.05, speed=1.0,
            dynamic_fraction=0.05, pos_noise=0.01, seed=3)
        frames = [seq.scan(k) for k in range(F)]

        # dataset-style feed: the entry point loads THIS process's slice
        # (all of it, single-process) and stacks
        vm_mh, outs_mh = run_scan_to_map_multihost(frames, cfg)
        vm_d, outs_d = run_scan_to_map_distributed(
            stack_scans(frames), make_mesh(8), cfg)
        np.testing.assert_allclose(
            np.asarray(outs_mh["world_T"]), np.asarray(outs_d["world_T"]),
            atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(vm_mh.occupied).sum(), np.asarray(vm_d.occupied).sum())
