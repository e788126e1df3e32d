"""Pose-graph tests: factor residuals match geometry; GN fixes drifted chains."""

import jax
import jax.numpy as jnp
import numpy as np

from icp4dradar_tpu.config import PoseGraphConfig
from icp4dradar_tpu.geom import se3_apply, se3_exp, se3_inverse, se3_log
from icp4dradar_tpu.graph import (
    PoseGraph,
    PointFactors,
    RelPoseFactors,
    optimize_pose_graph,
    point_to_line_residual,
    point_to_plane_norm_residual,
    point_to_plane_residual,
    point_to_point_residual,
    relative_pose_residual,
)


class TestFactorResiduals:
    def test_point_on_line_zero(self):
        T = jnp.eye(4)
        a = jnp.asarray([0.0, 0.0, 0.0])
        b = jnp.asarray([1.0, 0.0, 0.0])
        p = jnp.asarray([0.5, 0.0, 0.0])  # on the line
        r = point_to_line_residual(T, p, a, b)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-7)
        # 1 m off the line -> residual magnitude 1
        p2 = jnp.asarray([0.5, 1.0, 0.0])
        r2 = point_to_line_residual(T, p2, a, b)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(r2)), 1.0, atol=1e-6)

    def test_point_to_plane_signed_distance(self):
        T = jnp.eye(4)
        j = jnp.asarray([0.0, 0.0, 0.0])
        l = jnp.asarray([1.0, 0.0, 0.0])
        m = jnp.asarray([0.0, 1.0, 0.0])   # z=0 plane
        p = jnp.asarray([5.0, 7.0, 2.5])
        r = point_to_plane_residual(T, p, j, l, m)
        np.testing.assert_allclose(abs(float(r[0])), 2.5, atol=1e-6)

    def test_plane_norm_matches_plane(self):
        T = se3_exp(jnp.asarray([0.1, 0.2, -0.1, 0.05, 0.0, 0.1], dtype=jnp.float32))
        p = jnp.asarray([1.0, 2.0, 3.0], dtype=jnp.float32)
        n = jnp.asarray([0.0, 0.0, 1.0], dtype=jnp.float32)
        d = jnp.asarray(-1.0, dtype=jnp.float32)  # plane z=1
        r = point_to_plane_norm_residual(T, p, n, d)
        pw = np.asarray(se3_apply(T, p))
        np.testing.assert_allclose(float(r[0]), pw[2] - 1.0, atol=1e-6)

    def test_point_to_point(self):
        T = se3_exp(jnp.asarray([1.0, 0.0, 0.0, 0.0, 0.0, 0.0], dtype=jnp.float32))
        p = jnp.asarray([0.0, 0.0, 0.0], dtype=jnp.float32)
        q = jnp.asarray([1.0, 0.0, 0.0], dtype=jnp.float32)
        r = point_to_point_residual(T, p, q)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-6)

    def test_interp_slerp_halfway(self):
        # s=0.5 of a pure yaw: residual of a rotated point halves the angle
        T = se3_exp(jnp.asarray([0, 0, 0, 0, 0, 1.0], dtype=jnp.float32))
        p = jnp.asarray([1.0, 0.0, 0.0], dtype=jnp.float32)
        a = jnp.asarray([10.0, 0, 0], dtype=jnp.float32)
        b = jnp.asarray([-10.0, 0, 0], dtype=jnp.float32)
        r_half = point_to_line_residual(T, p, a, b, interp=0.5)
        # halfway rotation of 1 rad = 0.5 rad; distance from x-axis = sin(0.5)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(r_half)),
                                   np.sin(0.5), atol=1e-5)

    def test_relative_pose_zero_when_consistent(self):
        Ti = se3_exp(jnp.asarray([0.1, 0.2, 0.3, 0.01, 0.02, 0.03], dtype=jnp.float32))
        dT = se3_exp(jnp.asarray([0.5, 0.0, 0.0, 0.0, 0.0, 0.1], dtype=jnp.float32))
        Tj = Ti @ dT
        r = relative_pose_residual(Ti, Tj, dT)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-5)


def make_drifted_chain(K=12, seed=0):
    """GT circle-ish trajectory, odometry measurements exact, initial poses
    drifted — GN must pull the chain back onto the measurements; a loop
    closure anchors the far end."""
    rng = np.random.default_rng(seed)
    gt = [np.eye(4, dtype=np.float32)]
    step = np.asarray(se3_exp(jnp.asarray([1.0, 0, 0, 0, 0, 0.15], dtype=jnp.float32)))
    for _ in range(K - 1):
        gt.append(gt[-1] @ step)
    gt = np.stack(gt)
    # noisy initial guesses (except pose 0)
    init = gt.copy()
    for k in range(1, K):
        noise = np.asarray(
            se3_exp(jnp.asarray(rng.normal(0, 0.05, 6), dtype=jnp.float32))
        )
        init[k] = init[k] @ noise
    # exact odometry measurements + a loop closure 0 -> K-1
    i = list(range(K - 1)) + [0]
    j = list(range(1, K)) + [K - 1]
    T_meas = [np.linalg.inv(gt[a]) @ gt[b] for a, b in zip(i, j)]
    return gt, init, RelPoseFactors.build(i, j, np.stack(T_meas))


class TestGaussNewton:
    def test_chain_converges_to_gt(self):
        gt, init, rel = make_drifted_chain()
        graph = PoseGraph(poses=jnp.asarray(init), rel=rel)
        out, cost = optimize_pose_graph(graph, PoseGraphConfig(max_iterations=15))
        err = np.asarray(out.poses[:, :3, 3]) - gt[:, :3, 3]
        assert np.abs(err).max() < 1e-3, np.abs(err).max()
        assert float(cost) < 1e-6

    def test_huber_downweights_bad_loop_closure(self):
        gt, init, rel = make_drifted_chain()
        # corrupt the loop closure measurement badly; give odometry links
        # high information weight (tight covariance) as a real front-end
        # would — Huber then rejects the gross closure instead of letting a
        # compliant chain follow it
        K = rel.i.shape[0]
        w = np.full(K, 100.0, np.float32)
        w[-1] = 1.0  # the loop closure
        bad_T = rel.T_meas.at[-1, 0, 3].add(5.0)
        rel_bad = rel.replace(T_meas=bad_T, weight=jnp.asarray(w))
        graph = PoseGraph(poses=jnp.asarray(init), rel=rel_bad)
        out, _ = optimize_pose_graph(
            graph, PoseGraphConfig(max_iterations=20, huber_delta=0.3)
        )
        err = np.abs(np.asarray(out.poses[:, :3, 3]) - gt[:, :3, 3]).max()
        # quadratic loss follows the corrupt closure almost fully (~5 m);
        # Huber must reject most of it (the chain's rotational compliance
        # makes total rejection impossible for any robust loss)
        out_q, _ = optimize_pose_graph(
            graph, PoseGraphConfig(max_iterations=20, huber_delta=1e9)
        )
        err_q = np.abs(np.asarray(out_q.poses[:, :3, 3]) - gt[:, :3, 3]).max()
        assert err_q > 2.0, err_q
        assert err < 1.0, err
        assert err < err_q / 3.0

    def test_point_factors_anchor_pose(self):
        # single free pose constrained by world point correspondences
        T_true = se3_exp(jnp.asarray([0.3, -0.1, 0.2, 0.05, 0.1, -0.05], dtype=jnp.float32))
        rng = np.random.default_rng(1)
        p_body = rng.normal(size=(50, 3)).astype(np.float32)
        q_world = np.asarray(se3_apply(T_true, jnp.asarray(p_body)))
        K = 2  # pose 0 pinned by gauge; pose 1 is free
        pf = PointFactors.build(np.ones(50, np.int32), p_body, q_world)
        graph = PoseGraph(
            poses=jnp.stack([jnp.eye(4), jnp.eye(4)]), points=pf
        )
        out, cost = optimize_pose_graph(graph, PoseGraphConfig(max_iterations=15))
        err = se3_log(se3_inverse(out.poses[1]) @ T_true)
        assert float(jnp.abs(err).max()) < 1e-3
        assert float(cost) < 1e-6

    def test_jittable(self):
        gt, init, rel = make_drifted_chain(K=6)
        graph = PoseGraph(poses=jnp.asarray(init), rel=rel)
        cfg = PoseGraphConfig(max_iterations=5)
        f = jax.jit(lambda g: optimize_pose_graph(g, cfg)[0].poses)
        out = f(graph)
        assert out.shape == (6, 4, 4)
