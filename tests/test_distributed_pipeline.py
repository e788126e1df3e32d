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


_SHARED64 = {}


def _shared_full64(mesh):
    """ONE 64-frame distributed run shared by the equality and checkpoint
    tests (they previously re-tracked the identical sequence; VERDICT r3
    #8). Returns (scans, seq, keys, vm, raw) where raw is the tuple output
    of the cached shard_map entry point."""
    if "r" not in _SHARED64:
        import jax

        from icp4dradar_tpu.geom import se3_identity
        from icp4dradar_tpu.parallel import sharded_map_create
        from icp4dradar_tpu.parallel.distributed_pipeline import (
            _cached_distributed_run,
        )

        F = 64
        scans, seq = _sequence(F)
        keys = jax.random.split(jax.random.key(CFG.seed), F)
        fn = _cached_distributed_run(mesh, "dp", CFG, True, False, 0, False)
        vm0 = sharded_map_create(
            mesh, capacity=CFG.voxel_map.capacity,
            voxel_size=CFG.voxel_map.voxel_size,
            max_probes=CFG.voxel_map.max_probes)
        vm, raw = fn(vm0, se3_identity(scans.xyz.dtype), scans, keys)
        _SHARED64["r"] = (scans, seq, keys, vm, raw)
    return _SHARED64["r"]


class TestDistributedPipeline:
    def test_matches_single_device_64_frames(self, mesh):
        F = 64
        scans, seq, _, vm, raw = _shared_full64(mesh)
        names = ("world_T", "correction", "velocity", "velocity_valid",
                 "fitness", "num_inliers", "submap_points", "iterations")
        outs = dict(zip(names, raw))
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
        with pytest.raises(ValueError):
            run_scan_to_map_distributed(scans, mesh, CFG, block=3)

    def test_blocked_tracks_gt(self, mesh):
        """Amortized map ops (one sector query / one insert per block of 8)
        + const-velocity rotation prior keep tracking accuracy on the mesh
        — the run_scan_to_map_blocked feature set, distributed."""
        F = 32
        scans, seq = _sequence(F)
        _, outs = run_scan_to_map_distributed(
            scans, mesh, CFG, block=8, use_const_velocity_rot=True)
        Tb = np.asarray(outs["world_T"])
        assert np.isfinite(Tb).all()
        gt = seq.poses[:F, :3, 3]
        ate = np.sqrt(np.mean(np.sum((Tb[:, :3, 3] - gt) ** 2, axis=-1)))
        assert ate < 0.5, f"blocked distributed ATE {ate:.3f} m"

    def test_imu_prior_matches_single_device(self, mesh):
        """The distributed `priors` path (body-frame motion priors, e.g.
        preprocess.imu.imu_prior_deltas) equals the single-device
        `prior_deltas` path per-frame, and tracks equivalently in blocked
        mode (blocked key-split orders differ by design, so the blocked
        comparison is at the ATE level). Round-3 VERDICT item 2: the
        has_prior branches must be reachable and tested."""
        from icp4dradar_tpu.models import run_scan_to_map_blocked

        F = 24
        scans, seq = _sequence(F)
        # rotation-only body priors from the gt chain — what imu_prior_deltas
        # would integrate from a perfect gyro between scan stamps
        gt = np.asarray(seq.poses[:F], dtype=np.float64)
        pr = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
        for k in range(1, F):
            d = np.linalg.inv(gt[k - 1]) @ gt[k]
            pr[k, :3, :3] = d[:3, :3].astype(np.float32)

        _, outs = run_scan_to_map_distributed(scans, mesh, CFG, priors=pr)
        _, ref = run_scan_to_map(scans, CFG, prior_deltas=pr)
        Td = np.asarray(outs["world_T"])
        Tr = np.asarray(ref.world_T)
        assert np.isfinite(Td).all()
        np.testing.assert_allclose(Td[:, :3, 3], Tr[:, :3, 3], atol=1e-2)
        np.testing.assert_allclose(Td[:, :3, :3], Tr[:, :3, :3], atol=1e-2)

        _, outs_b = run_scan_to_map_distributed(
            scans, mesh, CFG, block=8, priors=pr)
        _, ref_b = run_scan_to_map_blocked(
            scans, CFG, block=8, prior_deltas=pr)
        Tb = np.asarray(outs_b["world_T"])
        assert np.isfinite(Tb).all()
        gt_t = gt[:, :3, 3]
        ate_d = np.sqrt(np.mean(np.sum((Tb[:, :3, 3] - gt_t) ** 2, axis=-1)))
        ate_s = np.sqrt(np.mean(np.sum(
            (np.asarray(ref_b.world_T)[:, :3, 3] - gt_t) ** 2, axis=-1)))
        assert ate_d < 0.5, f"blocked distributed prior ATE {ate_d:.3f} m"
        assert abs(ate_d - ate_s) < 0.25, (ate_d, ate_s)

    def test_checkpoint_resume_continues_tracking(self, mesh, tmp_path):
        """Split a sequence at frame 32: run A tracks 0..31, checkpoints
        {sharded map, pose}; run B restores and tracks 32..63 with the
        SAME per-frame keys the unbroken run would use. The stitched
        trajectory must match the unbroken run — the crash-recovery story
        the reference lacks (SURVEY.md §5)."""
        import jax
        import jax.numpy as jnp

        from icp4dradar_tpu.geom import se3_identity
        from icp4dradar_tpu.parallel import (
            load_distributed_state,
            save_distributed_state,
            sharded_map_create,
        )
        from icp4dradar_tpu.parallel.distributed_pipeline import (
            _cached_distributed_run,
        )

        scans, _, keys, _, raw_full = _shared_full64(mesh)
        fn = _cached_distributed_run(mesh, "dp", CFG, True, False, 0, False)

        def fresh():
            return sharded_map_create(
                mesh, capacity=CFG.voxel_map.capacity,
                voxel_size=CFG.voxel_map.voxel_size,
                max_probes=CFG.voxel_map.max_probes)

        pose0 = se3_identity(jnp.float32)

        half_a = jax.tree.map(lambda x: x[:32], scans)
        vm_a, raw_a = fn(fresh(), pose0, half_a, keys[:32])
        p = str(tmp_path / "ckpt")
        save_distributed_state(p, vm_a, raw_a[0][-1], frame=32)
        vm_r, pose_r, frame_r = load_distributed_state(p, mesh)
        assert frame_r == 32

        half_b = jax.tree.map(lambda x: x[32:], scans)
        _, raw_b = fn(vm_r, pose_r, half_b, keys[32:])
        Tb = np.asarray(raw_b[0])
        Tf = np.asarray(raw_full[0])[32:]
        np.testing.assert_allclose(Tb[:, :3, 3], Tf[:, :3, 3], atol=1e-3)

    def test_submap_quota_saturation_bounded_divergence(self, mesh):
        """Hot-shard quota truncation at saturation (the documented caveat,
        sharded_map.py::shard_local_sector_stats): with sector occupancy
        well past the submap budget every shard saturates its per-shard
        quota and the kept-voxel set differs from the single-device global
        budget. The divergence must stay BOUNDED — both paths keep tracking
        GT, and their ATEs stay close (VERDICT r3 #9)."""
        F = 24
        scans, seq = _sequence(F)
        # 96-voxel budget vs ~110 in-sector voxels: every tracked frame
        # saturates (measured: 23/23 frames at the cap, single-device ATE
        # 0.39 m) — per-shard quota 12 rows
        cfg = PipelineConfig().override(**{
            "voxel_map.capacity": 1 << 13,
            "voxel_map.submap_max_points": 96,
            "gicp.max_iterations": 15,
        })
        _, outs = run_scan_to_map_distributed(scans, mesh, cfg)
        state, ref = run_scan_to_map(scans, cfg)
        # both paths actually hit their budgets (the regime under test)
        assert int(np.max(np.asarray(ref.submap_points))) >= 96
        assert int(np.max(np.asarray(outs["submap_points"]))) >= 80
        gt = seq.poses[:F, :3, 3]
        Td = np.asarray(outs["world_T"])[:, :3, 3]
        Ts = np.asarray(ref.world_T)[:, :3, 3]
        ate_d = np.sqrt(np.mean(np.sum((Td - gt) ** 2, axis=-1)))
        ate_s = np.sqrt(np.mean(np.sum((Ts - gt) ** 2, axis=-1)))
        # default slack=1: hot-shard truncation degrades but stays BOUNDED
        # (measured 0.88 m vs 0.39 m single-device on this sequence)
        assert ate_s < 0.7, f"saturated single-device ATE {ate_s:.3f} m"
        assert ate_d < 1.5, f"saturated distributed ATE {ate_d:.3f} m"
        # slack=2 overprovisions per-shard rows and recovers (or beats)
        # single-device accuracy: at saturation it keeps MORE total sector
        # rows than the global budget
        cfg2 = cfg.override(**{"voxel_map.shard_quota_slack": 2.0})
        _, outs2 = run_scan_to_map_distributed(scans, mesh, cfg2)
        T2 = np.asarray(outs2["world_T"])[:, :3, 3]
        ate_d2 = np.sqrt(np.mean(np.sum((T2 - gt) ** 2, axis=-1)))
        assert ate_d2 < ate_d, (ate_d2, ate_d)
        assert ate_d2 < ate_s + 0.15, (ate_d2, ate_s)

    def test_long_run_maintenance_reclaims_tombstones(self, mesh):
        """forget-far + the DISTRIBUTED rehash keep tombstone pressure
        bounded over a long sharded run — without the rehash, dead keys
        permanently consume slots and new territory stops inserting (the
        single-device failure PERFORMANCE.md documents; the reference's
        analog is the ikd-Tree rebuild thread, ikd_Tree.cpp:169-351)."""
        F = 64
        # wide arc (r = 40 m) inside the landmark field: the far side of
        # the arc drifts >30 m behind the vehicle, so forget-far tombstones
        # a steadily-growing trail while tracking stays well-conditioned
        seq = SyntheticSequence(
            num_frames=F, max_points=512, num_landmarks=2500,
            world_extent=60.0, max_range=50.0, turn_rate=0.05, speed=1.5,
            dynamic_fraction=0.05, pos_noise=0.01, seed=5)
        scans = stack_scans([seq.scan(k) for k in range(F)])
        cfg = CFG.override(**{
            "voxel_map.forget_radius": 30.0,
            "voxel_map.rehash_tombstone_fraction": 0.05,
        })
        vm, outs = run_scan_to_map_distributed(scans, mesh, cfg, block=8)
        T = np.asarray(outs["world_T"])
        assert np.isfinite(T).all()
        gt = seq.poses[:F, :3, 3]
        ate = np.sqrt(np.mean(np.sum((T[:, :3, 3] - gt) ** 2, axis=-1)))
        assert ate < 1.5, f"maintained long-run ATE {ate:.3f} m"
        keys = np.asarray(vm.keys)
        occ = np.asarray(vm.occupied)
        tombs = int(np.sum((keys[:, 0] != 0x7FFFFFFF) & (occ <= 0.5)))
        C = keys.shape[0]
        # the 96 m arc forgets the trail behind it; the rehash must have
        # reclaimed those slots (trigger fraction 5% + at most one block
        # of new tombstones)
        assert tombs < 0.15 * C, f"{tombs} tombstones / {C} slots"
        # and the final sector around the vehicle is still populated —
        # inserts kept landing in fresh territory
        final_p = T[-1, :3, 3]
        pts = np.asarray(vm.points)[occ > 0.5]
        near = np.sum(np.linalg.norm(pts - final_p, axis=-1) < 40.0)
        assert near > 50, f"only {near} voxels near the final pose"
