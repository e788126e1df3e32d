"""Tests for streaming session resume, local-map refinement, IMU prior,
and map kNN."""

import jax
import jax.numpy as jnp
import numpy as np

from icp4dradar_tpu.config import IcpConfig, PipelineConfig
from icp4dradar_tpu.io import SyntheticSequence
from icp4dradar_tpu.mapping import voxel_map_create, voxel_map_insert, voxel_map_knn
from icp4dradar_tpu.models import OdometrySession, local_map_refinement
from icp4dradar_tpu.preprocess import imu_prior_deltas, integrate_gyro


def small_cfg():
    return PipelineConfig().override(**{
        "max_points": 1024,
        "voxel_map.capacity": 1 << 14,
        "voxel_map.submap_max_points": 1 << 12,
        "gicp.max_iterations": 10,
    })


class TestStreamingSession:
    def test_online_matches_reasonable_tracking(self):
        seq = SyntheticSequence(num_frames=6, max_points=1024,
                                num_landmarks=3000, world_extent=70.0,
                                max_range=60.0)
        sess = OdometrySession(small_cfg())
        for k in range(6):
            out = sess.process(seq.scan(k))
        err = np.linalg.norm(sess.pose[:3, 3] - seq.poses[5][:3, 3])
        assert err < 0.5, err

    def test_micro_batch_matches_per_frame_tracking(self):
        """process_batch (B frames per dispatch — the tunnel-amortized bag
        replay feed, r5) must track like B sequential process calls: same
        map/pose chain semantics, stacked outputs, and the session mixes
        freely between per-frame and batched feeding."""
        from icp4dradar_tpu.io.scan import stack_scans

        F = 16
        seq = SyntheticSequence(num_frames=F, max_points=1024,
                                num_landmarks=3000, world_extent=70.0,
                                max_range=60.0)
        frames = [seq.scan(k) for k in range(F)]

        per = OdometrySession(small_cfg())
        for f in frames:
            per.process(f)

        bat = OdometrySession(small_cfg())
        bat.process(frames[0])                       # mix: one per-frame
        outs = bat.process_batch(stack_scans(frames[1:9]))
        assert outs.world_T.shape == (8, 4, 4)
        outs2 = bat.process_batch(stack_scans(frames[9:]), block=0)
        assert bat.frame == F and bat.skipped_frames == 0
        # RNG streams differ between the two feeds (per-frame splits vs one
        # split per batch), so trajectories agree to tracking tolerance,
        # not bitwise
        err = np.linalg.norm(bat.pose[:3, 3] - per.pose[:3, 3])
        assert err < 0.3, err
        gt_err = np.linalg.norm(bat.pose[:3, 3] - seq.poses[F - 1][:3, 3])
        assert gt_err < 0.5, gt_err

    def test_checkpoint_resume_continues_identically(self, tmp_path):
        seq = SyntheticSequence(num_frames=8, max_points=1024,
                                num_landmarks=3000, world_extent=70.0,
                                max_range=60.0)
        cfg = small_cfg()
        # run 8 frames straight
        s_full = OdometrySession(cfg)
        for k in range(8):
            s_full.process(seq.scan(k))

        # run 4 frames, checkpoint, resume in a NEW session, run 4 more
        d = str(tmp_path)
        s_a = OdometrySession(cfg, checkpoint_dir=d, checkpoint_every=0)
        for k in range(4):
            s_a.process(seq.scan(k))
        s_a.checkpoint()
        assert OdometrySession.has_checkpoint(d)

        s_b = OdometrySession(cfg, checkpoint_dir=d)
        frame = s_b.resume()
        assert frame == 4
        for k in range(4, 8):
            s_b.process(seq.scan(k))
        np.testing.assert_allclose(s_b.pose, s_full.pose, atol=1e-4)


class TestLocalMapRefinement:
    def test_consistent_windows_near_identity(self):
        seq = SyntheticSequence(num_frames=30, max_points=512,
                                num_landmarks=3000, world_extent=70.0,
                                max_range=60.0, dynamic_fraction=0.0)
        xyz = np.stack([np.asarray(seq.scan(k).xyz) for k in range(30)])
        mask = np.stack([np.asarray(seq.scan(k).mask) for k in range(30)])
        # gate correspondences: consecutive windows only partially overlap
        T = local_map_refinement(xyz, mask, seq.poses, window=15,
                                 points_per_window=2048,
                                 cfg=IcpConfig(max_iterations=10,
                                               max_correspondence_dist=1.0))
        assert T.shape == (1, 4, 4)
        # with GT poses, window clouds already align: correction ~ identity
        np.testing.assert_allclose(T[0], np.eye(4), atol=0.06)

    def test_too_few_frames_empty(self):
        T = local_map_refinement(np.zeros((5, 8, 3), np.float32),
                                 np.ones((5, 8), np.float32),
                                 np.tile(np.eye(4, dtype=np.float32), (5, 1, 1)))
        assert T.shape == (0, 4, 4)


class TestImuPrior:
    def test_gyro_integration_constant_rate(self):
        from icp4dradar_tpu.io.rosbag import ImuSample

        w = np.array([0.0, 0.0, 0.5], np.float32)  # rad/s about z
        samples = [
            ImuSample(stamp=t, angular_velocity=w,
                      linear_acceleration=np.zeros(3, np.float32),
                      orientation=np.array([0, 0, 0, 1], np.float32))
            for t in np.linspace(0.05, 0.95, 10)
        ]
        R = integrate_gyro(samples, 0.0, 1.0)
        # should approximate rotation by 0.5 rad about z
        ang = np.arctan2(R[1, 0], R[0, 0])
        np.testing.assert_allclose(ang, 0.5, atol=0.03)

    def test_no_samples_identity(self):
        R = integrate_gyro([], 0.0, 1.0)
        np.testing.assert_allclose(R, np.eye(3))

    def test_prior_deltas_shape(self):
        from icp4dradar_tpu.io.bag_dataset import BagFrame
        from icp4dradar_tpu.io import RadarScan

        frames = [
            BagFrame(scan=RadarScan.from_arrays(np.zeros((1, 3)), max_points=4),
                     stamp=float(k))
            for k in range(3)
        ]
        D = imu_prior_deltas(frames)
        assert D.shape == (3, 4, 4)
        np.testing.assert_allclose(D[0], np.eye(4))


class TestMapKnn:
    def test_knn_matches_bruteforce_in_stencil(self, rng):
        pts = rng.uniform(-5, 5, (300, 3)).astype(np.float32)
        m = voxel_map_create(capacity=1 << 12, voxel_size=0.5)
        m = voxel_map_insert(m, jnp.asarray(pts))
        occ = np.asarray(m.occupied) > 0.5
        stored = np.asarray(m.points)[occ]
        q = stored[:20] + rng.normal(0, 0.05, (20, 3)).astype(np.float32)
        d2, nn = voxel_map_knn(m, jnp.asarray(q), k=3, stencil_radius=1)
        assert d2.shape == (20, 3) and nn.shape == (20, 3, 3)
        # first neighbor must be the true nearest stored point
        for i in range(20):
            bf = np.sort(((stored - q[i]) ** 2).sum(-1))[0]
            np.testing.assert_allclose(float(d2[i, 0]), bf, rtol=1e-4, atol=1e-5)
