"""Structure-factor mining (graph/structure_factors.py): map Gaussians
classify as surfels/edges and the resulting line/plane factors measurably
improve a pose graph that between-factors alone cannot move."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icp4dradar_tpu.config import (
    PipelineConfig,
    PoseGraphConfig,
    StructureFactorConfig,
)
from icp4dradar_tpu.geom import se3_exp
from icp4dradar_tpu.graph import (
    PoseGraph,
    RelPoseFactors,
    optimize_pose_graph_block,
)
from icp4dradar_tpu.graph.structure_factors import (
    build_structure_factors,
    classify_gaussians,
    unpack_cov,
)
from icp4dradar_tpu.mapping import voxel_map_create, voxel_map_insert


def _cov_of(pts):
    mu = pts.mean(0)
    return np.cov(pts.T, bias=True), mu


class TestClassify:
    def test_plane_line_blob(self):
        rng = np.random.default_rng(0)
        plane_pts = np.stack([rng.uniform(-1, 1, 500),
                              rng.uniform(-1, 1, 500),
                              rng.normal(0, 0.01, 500)], -1)
        line_pts = np.stack([rng.uniform(-1, 1, 500),
                             rng.normal(0, 0.01, 500),
                             rng.normal(0, 0.01, 500)], -1)
        blob_pts = rng.normal(0, 0.5, (500, 3))
        covs = np.stack([_cov_of(p)[0] for p in
                         (plane_pts, line_pts, blob_pts)]).astype(np.float32)
        counts = jnp.full(3, 500.0)
        is_plane, is_line, normal, direction, lam = classify_gaussians(
            jnp.asarray(covs), counts)
        assert bool(is_plane[0]) and not bool(is_line[0])
        assert bool(is_line[1]) and not bool(is_plane[1])
        assert not bool(is_plane[2]) and not bool(is_line[2])
        # surfel normal is +-z; edge direction is +-x
        assert abs(float(normal[0, 2])) > 0.99
        assert abs(float(direction[1, 0])) > 0.99

    def test_low_count_cells_are_neither(self):
        cov = jnp.asarray(np.diag([1.0, 1.0, 1e-6]).astype(np.float32))[None]
        is_plane, is_line, *_ = classify_gaussians(cov, jnp.asarray([2.0]))
        assert not bool(is_plane[0]) and not bool(is_line[0])

    def test_unpack_cov_roundtrip(self):
        rng = np.random.default_rng(1)
        A = rng.normal(size=(4, 3, 3)).astype(np.float32)
        S = A @ np.transpose(A, (0, 2, 1))
        packed = np.stack([S[:, 0, 0], S[:, 1, 1], S[:, 2, 2],
                           S[:, 0, 1], S[:, 0, 2], S[:, 1, 2]], -1)
        np.testing.assert_allclose(np.asarray(unpack_cov(jnp.asarray(packed))),
                                   S, rtol=1e-6)


def make_structured_scene(K=24, seed=0, trans_sigma=0.05, rot_sigma=0.003):
    """GT poses along x; world = ground plane + wall + vertical poles;
    per-keyframe body-frame scans of the visible patch; initial poses with
    independent per-frame jitter. Between-factor measurements come FROM the
    jittered odometry (zero residual at init), so only keyframe-to-map
    factors can reduce the jitter.

    Surfaces sit MID-voxel (z=0.25 at 0.5 m cells, etc.): a plane exactly on
    a voxel boundary splits its noise into two half-truncated Gaussians with
    biased means, which is a quantization artifact, not the consensus effect
    under test."""
    rng = np.random.default_rng(seed)
    gt = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    for k in range(K):
        gt[k][:3, 3] = [1.0 * k, 0.0, 0.0]

    scans_body = []
    for k in range(K):
        xk = gt[k][0, 3]
        n_g, n_w, n_p = 400, 300, 100
        ground = np.stack([rng.uniform(xk - 8, xk + 8, n_g),
                           rng.uniform(-6, 6, n_g),
                           np.full(n_g, 0.25)], -1)
        wall = np.stack([rng.uniform(xk - 8, xk + 8, n_w),
                         np.full(n_w, 6.25),
                         rng.uniform(0, 4, n_w)], -1)
        poles_x = np.floor(rng.uniform(xk - 8, xk + 8, n_p) / 4) * 4 + 0.25
        poles = np.stack([poles_x, np.full(n_p, -2.75),
                          rng.uniform(0, 4, n_p)], -1)
        world = np.concatenate([ground, wall, poles]).astype(np.float32)
        body = world - gt[k][:3, 3]
        body += rng.normal(0, 0.01, body.shape)
        scans_body.append(body.astype(np.float32))
    scans_body = np.stack(scans_body)                     # (K,N,3)

    init = gt.copy()
    for k in range(1, K):
        xi = np.concatenate([rng.normal(0, trans_sigma, 3),
                             rng.normal(0, rot_sigma, 3)]).astype(np.float32)
        init[k] = init[k] @ np.asarray(se3_exp(jnp.asarray(xi)))
    return gt, init, scans_body


class TestStructureFactorsReduceAte:
    def test_lower_ate_than_between_only(self):
        gt, init, scans_body = make_structured_scene()
        K, N, _ = scans_body.shape
        # between-factors measured from the jittered odometry itself
        ci = np.arange(K - 1, dtype=np.int32)
        cT = np.stack([np.linalg.inv(init[a]) @ init[a + 1] for a in ci])
        rel = RelPoseFactors.build(ci, ci + 1, cT.astype(np.float32),
                                   np.full(K - 1, 100.0, np.float32))

        # map from the scans at the JITTERED poses (what a pipeline has)
        world = (np.einsum("kij,knj->kni", init[:, :3, :3], scans_body)
                 + init[:, None, :3, 3]).astype(np.float32)
        vm = voxel_map_create(capacity=1 << 14, voxel_size=0.5)
        vm = voxel_map_insert(vm, jnp.asarray(world.reshape(-1, 3)))

        kf_ids = jnp.repeat(jnp.arange(K, dtype=jnp.int32), N)
        p_body = jnp.asarray(scans_body.reshape(-1, 3))
        p_world = jnp.asarray(world.reshape(-1, 3))
        cfg = StructureFactorConfig()
        planes, lines, points = build_structure_factors(
            kf_ids, p_body, p_world, jnp.ones(K * N), vm, cfg)
        # the scene has real structure: plenty of surfels and some edges
        assert float(jnp.sum(planes.mask)) > 0.3 * K * N
        assert float(jnp.sum(lines.mask)) > 50

        def ate(poses):
            return float(np.sqrt(np.mean(np.sum(
                (poses[:, :3, 3] - gt[:, :3, 3]) ** 2, -1))))

        base = PoseGraph(poses=jnp.asarray(init), rel=rel)
        out0, _ = optimize_pose_graph_block(
            base, PoseGraphConfig(max_iterations=15))
        full = PoseGraph(poses=jnp.asarray(init), rel=rel,
                         planes=planes, lines=lines)
        out1, _ = optimize_pose_graph_block(
            full, PoseGraphConfig(max_iterations=15))

        ate_init = ate(init)
        ate_between = ate(np.asarray(out0.poses))
        ate_struct = ate(np.asarray(out1.poses))
        # between-factors alone cannot move the consistent chain
        assert abs(ate_between - ate_init) < 0.02, (ate_between, ate_init)
        # one mining round pulls a large share of the jitter out
        assert ate_struct < 0.65 * ate_init, (ate_struct, ate_init)

        # a second re-association round (the pipeline default,
        # cfg.structure.rounds=2) gets past half
        world2 = (np.einsum("kij,knj->kni",
                            np.asarray(out1.poses)[:, :3, :3], scans_body)
                  + np.asarray(out1.poses)[:, None, :3, 3]).astype(np.float32)
        vm2 = voxel_map_create(capacity=1 << 14, voxel_size=0.5)
        vm2 = voxel_map_insert(vm2, jnp.asarray(world2.reshape(-1, 3)))
        planes2, lines2, _ = build_structure_factors(
            kf_ids, p_body, jnp.asarray(world2.reshape(-1, 3)),
            jnp.ones(K * N), vm2, cfg)
        full2 = PoseGraph(poses=out1.poses, rel=rel,
                          planes=planes2, lines=lines2)
        out2, _ = optimize_pose_graph_block(
            full2, PoseGraphConfig(max_iterations=15))
        ate_struct2 = ate(np.asarray(out2.poses))
        assert ate_struct2 < 0.5 * ate_init, (ate_struct2, ate_init)


class TestPipelineIntegration:
    def test_run_pose_graph_odometry_with_structure_factors(self):
        from icp4dradar_tpu.io import SyntheticSequence
        from icp4dradar_tpu.io.scan import stack_scans
        from icp4dradar_tpu.models import run_pose_graph_odometry
        from icp4dradar_tpu.utils import ate_rmse

        F = 24
        seq = SyntheticSequence(
            num_frames=F, max_points=512, num_landmarks=2000,
            world_extent=30.0, max_range=25.0, speed=1.0,
            turn_rate=0.05, pos_noise=0.02)
        scans = stack_scans([seq.scan(k) for k in range(F)])
        cfg = PipelineConfig().override(**{
            "icp.max_iterations": 15,
            "pose_graph.max_iterations": 10,
            "voxel_map.capacity": 1 << 14,
        })
        res = run_pose_graph_odometry(
            scans, cfg, keyframe_every=4, structure_factors=True)
        assert np.isfinite(res.poses).all()
        gt = seq.poses[:, :3, 3]
        ate_odom = ate_rmse(res.odom_poses[:, :3, 3], gt, align=False)
        ate_ref = ate_rmse(res.poses[:, :3, 3], gt, align=False)
        # refinement must not degrade the odometry it consumes
        assert ate_ref <= ate_odom * 1.1 + 0.02, (ate_ref, ate_odom)
