"""Registration tests: point-to-point ICP and GICP recover known transforms."""

import jax
import jax.numpy as jnp
import numpy as np

from icp4dradar_tpu.config import GicpConfig, IcpConfig
from icp4dradar_tpu.geom import se3_apply, se3_exp, se3_inverse, se3_log
from icp4dradar_tpu.registration import (
    gicp_align,
    icp_point_to_point,
    point_covariances,
)


def transform_error(T_est, T_true):
    return float(jnp.abs(se3_log(se3_inverse(T_est) @ T_true)).max())


def make_structured_cloud(rng, n=1500):
    """Planes + scatter, the kind of scene GICP needs."""
    n_g = n // 3
    ground = np.stack([
        rng.uniform(-30, 30, n_g), rng.uniform(-30, 30, n_g),
        rng.normal(0, 0.01, n_g),
    ], -1)
    wall = np.stack([
        rng.uniform(-30, 30, n_g), np.full(n_g, 12.0) + rng.normal(0, 0.01, n_g),
        rng.uniform(0, 6, n_g),
    ], -1)
    scatter = rng.uniform(-25, 25, (n - 2 * n_g, 3))
    return np.concatenate([ground, wall, scatter]).astype(np.float32)


class TestIcp:
    def test_recovers_small_transform(self, rng):
        tgt = rng.normal(size=(1000, 3)).astype(np.float32) * 15
        xi = jnp.asarray([0.3, -0.2, 0.1, 0.01, 0.02, 0.03], dtype=jnp.float32)
        T_true = se3_exp(xi)
        # src such that T_true maps src onto tgt
        src = np.asarray(se3_apply(se3_inverse(T_true), jnp.asarray(tgt)))
        res = icp_point_to_point(
            jnp.asarray(src), jnp.asarray(tgt),
            cfg=IcpConfig(max_iterations=30, transformation_epsilon=1e-6),
        )
        assert transform_error(res.transform, T_true) < 1e-3
        assert float(res.fitness) < 1e-4
        assert bool(res.converged)

    def test_masked_padding_ignored(self, rng):
        tgt = rng.normal(size=(600, 3)).astype(np.float32) * 10
        T_true = se3_exp(jnp.asarray([0.2, 0.1, 0.0, 0.0, 0.0, 0.05], dtype=jnp.float32))
        src_valid = np.asarray(se3_apply(se3_inverse(T_true), jnp.asarray(tgt)))
        # pad src with garbage, masked out
        src = np.concatenate([src_valid, np.full((100, 3), 500.0, np.float32)])
        src_mask = np.concatenate([np.ones(600), np.zeros(100)]).astype(np.float32)
        tgt_p = np.concatenate([tgt, np.full((50, 3), -700.0, np.float32)])
        tgt_mask = np.concatenate([np.ones(600), np.zeros(50)]).astype(np.float32)
        res = icp_point_to_point(
            jnp.asarray(src), jnp.asarray(tgt_p),
            jnp.asarray(src_mask), jnp.asarray(tgt_mask),
            cfg=IcpConfig(max_iterations=30, transformation_epsilon=1e-6),
        )
        assert transform_error(res.transform, T_true) < 1e-3

    def test_respects_iteration_cap(self, rng):
        tgt = rng.normal(size=(200, 3)).astype(np.float32)
        src = rng.normal(size=(200, 3)).astype(np.float32)
        res = icp_point_to_point(jnp.asarray(src), jnp.asarray(tgt),
                                 cfg=IcpConfig(max_iterations=3))
        assert int(res.iterations) <= 3

    def test_jittable(self, rng):
        tgt = jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32))
        src = jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32))
        f = jax.jit(lambda a, b: icp_point_to_point(a, b).transform)
        out = f(src, tgt)
        assert out.shape == (4, 4)


class TestGicp:
    def test_covariances_plane_regularized(self, rng):
        # points on z=0 plane -> smallest eigen-direction is z
        pts = np.stack([
            rng.uniform(-5, 5, 300), rng.uniform(-5, 5, 300), np.zeros(300)
        ], -1).astype(np.float32)
        cov = point_covariances(jnp.asarray(pts), jnp.ones(300))
        evals, evecs = np.linalg.eigh(np.asarray(cov))
        # regularized spectrum is (eps, 1, 1)
        np.testing.assert_allclose(evals[:, 1:], 1.0, atol=1e-4)
        np.testing.assert_allclose(evals[:, 0], 1e-3, atol=1e-4)
        # normal direction ~ z
        nrm = np.abs(evecs[:, :, 0])
        np.testing.assert_allclose(nrm[:, 2], 1.0, atol=1e-3)

    def test_covariances_match_eigh_oracle(self, rng):
        """Closed-form plane regularization == the eigh construction
        V diag(eps,1,1) V^T on generic clouds (VERDICT r1 item 9)."""
        pts = make_structured_cloud(rng, n=600)
        cov = np.asarray(point_covariances(jnp.asarray(pts), jnp.ones(600)))
        # oracle: rebuild from numpy eigh of the raw neighborhood covariance
        from icp4dradar_tpu.ops import knn as knn_op
        idx, d2 = knn_op(jnp.asarray(pts), jnp.asarray(pts), 5,
                         jnp.ones(600))
        neigh = pts[np.asarray(idx)]
        mu = neigh.mean(axis=1, keepdims=True)
        c = neigh - mu
        raw = np.einsum("nki,nkj->nij", c, c) / 5.0
        evals, evecs = np.linalg.eigh(raw.astype(np.float64))
        reg = np.einsum("nij,nj,nkj->nik", evecs,
                        np.stack([np.full(600, 1e-3),
                                  np.ones(600), np.ones(600)], -1), evecs)
        np.testing.assert_allclose(cov, reg, atol=2e-4)

    def test_covariances_no_lapack_in_jaxpr(self):
        pts = jnp.ones((64, 3))
        jaxpr = str(jax.make_jaxpr(
            lambda x: point_covariances(x, jnp.ones(64)))(pts))
        assert "eigh" not in jaxpr and "tridiagonal" not in jaxpr

    def test_covariances_degenerate_line(self):
        """Collinear neighborhoods (repeated smallest eigenvalue): result
        must still have spectrum (eps, 1, 1) with the eps-direction
        orthogonal to the line."""
        t = np.linspace(0, 1, 50).astype(np.float32)
        pts = np.stack([t * 4.0, t * 3.0, np.zeros_like(t)], -1)
        cov = np.asarray(point_covariances(jnp.asarray(pts), jnp.ones(50)))
        evals, evecs = np.linalg.eigh(cov)
        np.testing.assert_allclose(evals[:, 1:], 1.0, atol=1e-4)
        np.testing.assert_allclose(evals[:, 0], 1e-3, atol=1e-4)
        line = np.array([0.8, 0.6, 0.0])
        np.testing.assert_allclose(evecs[:, :, 0] @ line, 0.0, atol=1e-3)

    def test_recovers_transform_structured(self, rng):
        tgt = make_structured_cloud(rng)
        T_true = se3_exp(jnp.asarray([0.4, -0.3, 0.05, 0.01, -0.02, 0.04],
                                     dtype=jnp.float32))
        src = np.array(se3_apply(se3_inverse(T_true), jnp.asarray(tgt)))
        src += rng.normal(0, 0.01, src.shape).astype(np.float32)
        res = gicp_align(
            jnp.asarray(src), jnp.asarray(tgt),
            cfg=GicpConfig(max_iterations=30),
        )
        assert transform_error(res.transform, T_true) < 0.02
        assert bool(res.converged)

    def test_fitness_low_after_alignment(self, rng):
        tgt = make_structured_cloud(rng, n=900)
        src = tgt + rng.normal(0, 0.005, tgt.shape).astype(np.float32)
        res = gicp_align(jnp.asarray(src), jnp.asarray(tgt))
        assert float(res.fitness) < 1e-3


class TestVgicp:
    def test_fused_matches_xla(self, rng):
        from icp4dradar_tpu.geom import se3_exp
        from icp4dradar_tpu.ops.vgicp_fused import (
            radar_point_covariances_packed,
            vgicp_iteration,
            vgicp_iteration_xla,
        )

        src = rng.normal(size=(160, 3)).astype(np.float32) * 10 + np.array([20, 0, 0], np.float32)
        tgt = rng.normal(size=(250, 3)).astype(np.float32) * 10 + np.array([20, 0, 0], np.float32)
        sm = (rng.uniform(size=160) > 0.1).astype(np.float32)
        tm = (rng.uniform(size=250) > 0.2).astype(np.float32)
        scov = np.asarray(radar_point_covariances_packed(jnp.asarray(src)))
        tcov = np.tile(np.array([0.05, 0.05, 0.01, 0, 0, 0], np.float32), (250, 1))
        T = se3_exp(jnp.asarray([0.1, -0.1, 0.02, 0.01, 0.0, 0.05], dtype=jnp.float32))
        args = (T, jnp.asarray(src), jnp.asarray(sm), jnp.asarray(scov),
                jnp.asarray(tgt), jnp.asarray(tcov), jnp.asarray(tm))
        H1, g1, c1, w1, d1 = vgicp_iteration_xla(*args, max_correspondence_dist=5.0)
        H2, g2, c2, w2, d2_ = vgicp_iteration(*args, max_correspondence_dist=5.0,
                                              ts=64, interpret=True)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w1), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=2e-3, atol=1e-2)
        np.testing.assert_allclose(np.asarray(H2), np.asarray(H1), rtol=2e-3, atol=1e-1)
        np.testing.assert_allclose(float(c2), float(c1), rtol=2e-3)

    def test_vgicp_align_recovers_pose(self, rng):
        from icp4dradar_tpu.config import GicpConfig
        from icp4dradar_tpu.geom import se3_apply, se3_exp, se3_inverse, se3_log
        from icp4dradar_tpu.registration import vgicp_align

        # voxel distributions sampled from a structured world
        world = make_structured_cloud(rng, n=1200)
        covs = np.tile(np.array([0.02, 0.02, 0.005, 0, 0, 0], np.float32), (1200, 1))
        T_true = se3_exp(jnp.asarray([0.4, -0.2, 0.05, 0.02, -0.01, 0.06],
                                     dtype=jnp.float32))
        # sensor-frame scan = T_true^-1 applied to a subset + noise
        scan = np.array(se3_apply(se3_inverse(T_true), jnp.asarray(world[:800])))
        scan += rng.normal(0, 0.02, scan.shape).astype(np.float32)
        # initialize near identity: vgicp must pull the pose to T_true
        res = vgicp_align(
            jnp.asarray(scan), jnp.asarray(world), jnp.asarray(covs),
            cfg=GicpConfig(max_iterations=30, max_correspondence_dist=3.0),
        )
        err = float(jnp.abs(se3_log(se3_inverse(res.transform) @ T_true)).max())
        assert err < 0.05, err
        assert bool(res.converged)

    def test_empty_submap_identity(self, rng):
        from icp4dradar_tpu.config import GicpConfig
        from icp4dradar_tpu.registration import vgicp_align

        scan = rng.normal(size=(64, 3)).astype(np.float32)
        tgt = np.zeros((32, 3), np.float32)
        covs = np.tile(np.array([1, 1, 1, 0, 0, 0], np.float32), (32, 1))
        res = vgicp_align(
            jnp.asarray(scan), jnp.asarray(tgt), jnp.asarray(covs),
            tgt_mask=jnp.zeros(32),
            cfg=GicpConfig(max_iterations=5),
        )
        np.testing.assert_allclose(np.asarray(res.transform), np.eye(4), atol=1e-4)


class TestIcpDegenerate:
    def test_all_masked_target_yields_identity(self, rng):
        # no valid correspondences: ICP must return identity, not a random
        # rotation from the degenerate Horn solve
        src = rng.normal(size=(64, 3)).astype(np.float32)
        tgt = rng.normal(size=(64, 3)).astype(np.float32)
        res = icp_point_to_point(
            jnp.asarray(src), jnp.asarray(tgt),
            tgt_mask=jnp.zeros(64),
            cfg=IcpConfig(max_iterations=5),
        )
        np.testing.assert_allclose(np.asarray(res.transform), np.eye(4),
                                   atol=1e-6)

    def test_empty_src_identity(self, rng):
        tgt = rng.normal(size=(32, 3)).astype(np.float32)
        res = icp_point_to_point(
            jnp.asarray(np.zeros((16, 3), np.float32)), jnp.asarray(tgt),
            src_mask=jnp.zeros(16),
            cfg=IcpConfig(max_iterations=5),
        )
        np.testing.assert_allclose(np.asarray(res.transform), np.eye(4),
                                   atol=1e-6)


class TestRadarPointCovariances:
    def test_forward_point_spherical_frame(self):
        from icp4dradar_tpu.ops.vgicp_fused import radar_point_covariances_packed

        # point straight ahead at 10 m: radial = x, azimuth tangent = y,
        # elevation tangent = z
        c6 = radar_point_covariances_packed(
            jnp.asarray([[10.0, 0.0, 0.0]]), sigma_r=0.1, sigma_az=0.01,
            sigma_el=0.02,
        )
        c = np.asarray(c6)[0]
        np.testing.assert_allclose(c[0], 0.01, rtol=1e-5)        # xx = sr^2
        np.testing.assert_allclose(c[1], (10 * 0.01) ** 2, rtol=1e-5)
        np.testing.assert_allclose(c[2], (10 * 0.02) ** 2, rtol=1e-5)
        np.testing.assert_allclose(c[3:], 0.0, atol=1e-7)

    def test_cross_range_grows_with_range(self):
        from icp4dradar_tpu.ops.vgicp_fused import radar_point_covariances_packed

        near = np.asarray(radar_point_covariances_packed(
            jnp.asarray([[5.0, 0.0, 0.0]])))[0]
        far = np.asarray(radar_point_covariances_packed(
            jnp.asarray([[50.0, 0.0, 0.0]])))[0]
        assert far[1] > near[1] * 50     # azimuth variance ~ r^2
        np.testing.assert_allclose(far[0], near[0], rtol=1e-5)  # radial const


class TestGicpDegenerate:
    def test_empty_target_identity(self, rng):
        # kNN GICP path must also stay at identity with no valid targets
        src = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
        tgt = jnp.asarray(np.zeros((16, 3), np.float32))
        res = gicp_align(src, tgt, tgt_mask=jnp.zeros(16),
                         cfg=GicpConfig(max_iterations=3))
        np.testing.assert_allclose(np.asarray(res.transform), np.eye(4),
                                   atol=1e-3)
