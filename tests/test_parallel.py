"""Distributed tests on the 8-virtual-device CPU mesh: sharded solvers must
equal their single-device counterparts (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icp4dradar_tpu.config import PipelineConfig, PoseGraphConfig
from icp4dradar_tpu.graph import PoseGraph, RelPoseFactors, PointFactors
from icp4dradar_tpu.graph.gauss_newton import (
    optimize_pose_graph,
    pose_graph_normal_equations,
)
from icp4dradar_tpu.io import SyntheticSequence
from icp4dradar_tpu.io.scan import stack_scans
from icp4dradar_tpu.parallel import (
    batched_icp_pairs,
    batched_preprocess,
    distributed_normal_equations,
    distributed_optimize_pose_graph,
    make_mesh,
    shard_scan_batch,
)
from tests.test_graph import make_drifted_chain


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


class TestDistributedGN:
    def test_normal_equations_match_single_device(self, mesh):
        gt, init, rel = make_drifted_chain(K=10)
        graph = PoseGraph(poses=jnp.asarray(init), rel=rel)
        H1, g1, c1 = pose_graph_normal_equations(graph)
        H8, g8, c8 = distributed_normal_equations(graph, mesh)
        np.testing.assert_allclose(np.asarray(H8), np.asarray(H1), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g8), np.asarray(g1), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(float(c8), float(c1), rtol=1e-4)

    def test_distributed_optimize_matches(self, mesh):
        gt, init, rel = make_drifted_chain(K=10)
        graph = PoseGraph(poses=jnp.asarray(init), rel=rel)
        cfg = PoseGraphConfig(max_iterations=10)
        out1, cost1 = optimize_pose_graph(graph, cfg)
        out8, cost8 = distributed_optimize_pose_graph(graph, mesh, cfg)
        np.testing.assert_allclose(
            np.asarray(out8.poses), np.asarray(out1.poses), atol=1e-3
        )
        err = np.abs(np.asarray(out8.poses[:, :3, 3]) - gt[:, :3, 3]).max()
        assert err < 1e-2

    def test_block_optimize_matches_single_device(self, mesh):
        """O(K) distributed block GN (sharded chain + replicated loops +
        psum'd block diagonals) equals the single-device block solver."""
        from icp4dradar_tpu.graph.block_solver import optimize_pose_graph_block
        from icp4dradar_tpu.parallel import (
            distributed_optimize_pose_graph_block,
        )

        gt, init, rel = make_drifted_chain(K=12)
        # add two loop closures so the replicated low-rank path is exercised
        gtj = jnp.asarray(gt)
        li = np.asarray([2, 5], np.int32)
        lj = np.asarray([9, 11], np.int32)
        T_loop = jnp.stack([
            jnp.linalg.inv(gtj[a]) @ gtj[b] for a, b in zip(li, lj)])
        rel = RelPoseFactors.build(
            i=np.concatenate([np.asarray(rel.i), li]),
            j=np.concatenate([np.asarray(rel.j), lj]),
            T_meas=jnp.concatenate([rel.T_meas, T_loop]),
        )
        graph = PoseGraph(poses=jnp.asarray(init), rel=rel)
        cfg = PoseGraphConfig(max_iterations=10)
        out1, cost1 = optimize_pose_graph_block(graph, cfg)
        out8, cost8 = distributed_optimize_pose_graph_block(graph, mesh, cfg)
        np.testing.assert_allclose(
            np.asarray(out8.poses), np.asarray(out1.poses), atol=1e-3)
        np.testing.assert_allclose(float(cost8), float(cost1),
                                   rtol=1e-3, atol=1e-5)

    def test_block_assembly_stage_matches_single_device(self, mesh):
        """Assembly-only entry (the weak-scaling bench's per-stage hook)
        psums the same O(K) block structure the single-device
        block_normal_equations builds."""
        from icp4dradar_tpu.graph.block_solver import (
            block_normal_equations, split_chain_loops,
        )
        from icp4dradar_tpu.parallel import distributed_block_normal_equations

        gt, init, rel = make_drifted_chain(K=12)
        graph = PoseGraph(poses=jnp.asarray(init), rel=rel)
        chain, _ = split_chain_loops(rel)
        # loops are excluded from the sharded assembly stage by design
        # (they replicate as low-rank U columns in the full solver)
        ne = block_normal_equations(graph.replace(rel=None), chain, None)
        d8, o8, g8, c8 = distributed_block_normal_equations(graph, mesh)
        np.testing.assert_allclose(np.asarray(d8), np.asarray(ne.diag),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(o8), np.asarray(ne.off),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g8), np.asarray(ne.g),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(float(c8), float(ne.cost), rtol=1e-4)

    def test_point_factors_sharded(self, mesh):
        rng = np.random.default_rng(3)
        from icp4dradar_tpu.geom import se3_apply, se3_exp

        T_true = se3_exp(jnp.asarray([0.2, 0.1, 0.0, 0.0, 0.05, 0.1], dtype=jnp.float32))
        p = rng.normal(size=(37, 3)).astype(np.float32)  # deliberately not %8
        q = np.asarray(se3_apply(T_true, jnp.asarray(p)))
        pf = PointFactors.build(np.ones(37, np.int32), p, q)
        graph = PoseGraph(poses=jnp.stack([jnp.eye(4), jnp.eye(4)]), points=pf)
        H1, g1, c1 = pose_graph_normal_equations(graph)
        H8, g8, c8 = distributed_normal_equations(graph, mesh)
        np.testing.assert_allclose(np.asarray(H8), np.asarray(H1), rtol=1e-4, atol=1e-4)


class TestDistributedStructureFactors:
    """All four single-pose factor families shard + psum identically to the
    single-device assembly (VERDICT r1: distributed assembly must handle the
    new types)."""

    def test_all_factor_types_match_single_device(self, mesh):
        from tests.test_graph import make_loop_graph, make_structured_graph

        gt, poses, rel = make_loop_graph(24, 10.0, 2, 0.01, seed=11)
        _, _, singles = make_structured_graph(K=24, seed=11)
        graph = PoseGraph(poses=jnp.asarray(poses), rel=rel, **singles)
        H1, g1, c1 = pose_graph_normal_equations(graph)
        H8, g8, c8 = distributed_normal_equations(graph, mesh)
        scale = np.abs(np.asarray(H1)).max()
        np.testing.assert_allclose(np.asarray(H8), np.asarray(H1),
                                   atol=1e-5 * scale)
        np.testing.assert_allclose(np.asarray(g8), np.asarray(g1),
                                   atol=1e-5 * scale)
        np.testing.assert_allclose(float(c8), float(c1), rtol=1e-5)

        cfg = PoseGraphConfig(max_iterations=10)
        out1, cost1 = optimize_pose_graph(graph, cfg)
        out8, cost8 = distributed_optimize_pose_graph(graph, mesh, cfg)
        np.testing.assert_allclose(np.asarray(out8.poses),
                                   np.asarray(out1.poses), atol=1e-3)


class TestDataParallel:
    def test_batched_preprocess_sharded(self, mesh):
        seq = SyntheticSequence(num_frames=8, max_points=512, num_landmarks=3000)
        scans = stack_scans([seq.scan(k) for k in range(8)])
        scans = shard_scan_batch(scans, mesh)
        est = batched_preprocess(scans, jax.random.key(0), mesh)
        assert est.velocity.shape == (8, 3)
        # velocities track GT
        v_err = [
            np.linalg.norm(np.asarray(est.velocity[k]) - seq.ego_velocity(k))
            for k in range(8)
        ]
        assert np.median(v_err) < 0.2

    def test_batched_icp_pairs(self, mesh):
        seq = SyntheticSequence(
            num_frames=9, max_points=1024, num_landmarks=2000,
            world_extent=60.0, max_range=50.0, dynamic_fraction=0.0,
        )
        scans = [seq.scan(k) for k in range(9)]
        src = stack_scans(scans[1:9])
        tgt = stack_scans(scans[0:8])
        cfg = PipelineConfig().override(**{"icp.max_iterations": 15})
        T = batched_icp_pairs(src, tgt, mesh, cfg)
        assert T.shape == (8, 4, 4)
        # each pair's transform approximates the GT relative pose
        for k in range(8):
            T_rel = np.linalg.inv(seq.poses[k]) @ seq.poses[k + 1]
            np.testing.assert_allclose(
                np.asarray(T[k])[:3, 3], T_rel[:3, 3], atol=0.25
            )


class TestScanToMapBatch:
    """Multi-stream serving path: B sequences, each with a private map."""

    def _scans(self, B, F):
        batches = []
        for b in range(B):
            seq = SyntheticSequence(
                num_frames=F, max_points=256, num_landmarks=1200,
                world_extent=50.0, max_range=40.0, seed=b,
            )
            batches.append(stack_scans([seq.scan(k) for k in range(F)]))
        return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)

    def _cfg(self):
        return PipelineConfig().override(**{
            "max_points": 256,
            "voxel_map.capacity": 1 << 13,
            "voxel_map.submap_max_points": 1 << 10,
            "gicp.max_iterations": 8,
        })

    def test_vmap_batch_matches_sequential(self):
        from icp4dradar_tpu.models import run_scan_to_map, run_scan_to_map_batch

        cfg = self._cfg()
        scans = self._scans(2, 4)
        key = jax.random.key(cfg.seed)
        _, outs = run_scan_to_map_batch(scans, cfg, key=key)
        keys = jax.random.split(key, 2)
        for b in range(2):
            one = jax.tree.map(lambda x: x[b], scans)
            _, ref = run_scan_to_map(one, cfg, key=keys[b])
            np.testing.assert_allclose(
                np.asarray(outs.world_T[b]), np.asarray(ref.world_T), atol=1e-4
            )

    def test_sharded_batch_matches_vmap(self, mesh):
        from icp4dradar_tpu.models import run_scan_to_map_batch
        from icp4dradar_tpu.parallel import sharded_scan_to_map_batch

        cfg = self._cfg()
        scans = self._scans(8, 3)
        key = jax.random.key(cfg.seed)
        _, outs_sharded = sharded_scan_to_map_batch(scans, mesh, cfg, key=key)
        _, outs_local = run_scan_to_map_batch(scans, cfg, key=key)
        np.testing.assert_allclose(
            np.asarray(outs_sharded.world_T), np.asarray(outs_local.world_T),
            atol=1e-4,
        )


class TestRingVgicp:
    def test_matches_single_device(self, rng, mesh):
        """Ring-sharded sweep (ppermute map shards, merge running best,
        frozen-payload accumulators) must equal the single-device VGICP
        iteration on the gathered map."""
        import jax.numpy as jnp

        from icp4dradar_tpu.geom import se3_exp
        from icp4dradar_tpu.ops.vgicp_fused import (
            radar_point_covariances_packed,
            vgicp_iteration_xla,
        )
        from icp4dradar_tpu.parallel import ring_vgicp_normal_equations

        N, M = 256, 512
        src = rng.uniform(-30, 30, (N, 3)).astype(np.float32)
        sm = (rng.uniform(size=N) > 0.1).astype(np.float32)
        scov = np.asarray(radar_point_covariances_packed(jnp.asarray(src)))
        tgt = rng.uniform(-30, 30, (M, 3)).astype(np.float32)
        tcov = np.abs(rng.normal(0.05, 0.02, (M, 6))).astype(np.float32)
        tmask = (rng.uniform(size=M) > 0.2).astype(np.float32)
        T = np.asarray(se3_exp(jnp.asarray(
            [0.1, -0.2, 0.05, 0.02, 0.0, 0.1], jnp.float32)))

        H1, g1, c1, w1, d1 = vgicp_iteration_xla(
            jnp.asarray(T), jnp.asarray(src), jnp.asarray(sm),
            jnp.asarray(scov), jnp.asarray(tgt), jnp.asarray(tcov),
            jnp.asarray(tmask))
        H2, g2, c2, w2, d2 = ring_vgicp_normal_equations(
            jnp.asarray(T), jnp.asarray(src), jnp.asarray(sm),
            jnp.asarray(scov), jnp.asarray(tgt), jnp.asarray(tcov),
            jnp.asarray(tmask), mesh)
        np.testing.assert_allclose(np.asarray(H2), np.asarray(H1),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                                   rtol=1e-4, atol=1e-4)
        assert float(w2) == float(w1)
        np.testing.assert_allclose(float(d2), float(d1), rtol=1e-4)

    def test_bad_shard_size_raises(self, mesh):
        import jax.numpy as jnp

        from icp4dradar_tpu.parallel import ring_vgicp_normal_equations

        M = 9  # not divisible by the 8-device mesh
        try:
            ring_vgicp_normal_equations(
                jnp.eye(4), jnp.zeros((8, 3)), jnp.ones(8),
                jnp.zeros((8, 6)), jnp.zeros((M, 3)), jnp.zeros((M, 6)),
                jnp.ones(M), mesh)
            assert False, "expected ValueError"
        except ValueError:
            pass

    def test_ring_align_recovers_transform(self, rng, mesh):
        """Full distributed GN on the ring recovers a known SE(3) offset of
        a scan against its own voxel distributions."""
        import jax.numpy as jnp

        from icp4dradar_tpu.geom import se3_apply, se3_exp, se3_inverse, se3_log
        from icp4dradar_tpu.ops.vgicp_fused import (
            radar_point_covariances_packed,
        )
        from icp4dradar_tpu.parallel import ring_vgicp_align

        M = 512
        tgt = rng.uniform(-30, 30, (M, 3)).astype(np.float32)
        tcov = np.broadcast_to(
            np.asarray([0.02, 0.02, 0.02, 0, 0, 0], np.float32), (M, 6))
        T_true = se3_exp(jnp.asarray([0.2, -0.1, 0.05, 0.01, -0.02, 0.03],
                                     jnp.float32))
        src = np.asarray(se3_apply(se3_inverse(T_true), jnp.asarray(tgt)))
        scov = np.asarray(radar_point_covariances_packed(jnp.asarray(src)))

        T, fit, iters = ring_vgicp_align(
            jnp.asarray(src), jnp.ones(M, jnp.float32), jnp.asarray(scov),
            jnp.asarray(tgt), jnp.asarray(tcov), jnp.ones(M, jnp.float32),
            mesh)
        err = float(jnp.abs(se3_log(se3_inverse(T) @ T_true)).max())
        assert err < 1e-2, err
        assert int(iters) >= 1 and float(fit) < 0.05


class TestShardedBlockedServing:
    def test_blocked_batch_over_mesh(self, mesh):
        """dp-sharded multi-stream serving with the blocked runner: 8
        streams, one per device, amortized map updates."""
        import jax.numpy as jnp

        from icp4dradar_tpu.config import PipelineConfig
        from icp4dradar_tpu.io import SyntheticSequence
        from icp4dradar_tpu.io.scan import stack_scans
        from icp4dradar_tpu.parallel import sharded_scan_to_map_batch

        cfg = PipelineConfig().override(**{
            "max_points": 256,
            "voxel_map.capacity": 1 << 12,
            "voxel_map.submap_max_points": 1 << 10,
            "gicp.max_iterations": 5,
        })
        B, F = 8, 8
        seq = SyntheticSequence(num_frames=B * F, max_points=256,
                                num_landmarks=2000, world_extent=60.0,
                                max_range=50.0)
        scans = stack_scans([seq.scan(k) for k in range(B * F)])
        batched = jax.tree.map(
            lambda x: jnp.stack([x[b * F:(b + 1) * F] for b in range(B)]),
            scans)
        st, outs = sharded_scan_to_map_batch(
            batched, mesh, cfg, block=4, use_const_velocity_rot=True)
        P = np.asarray(outs.world_T)
        assert P.shape == (B, F, 4, 4)
        assert np.isfinite(P).all()
