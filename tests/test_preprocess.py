"""Preprocessing tests: Doppler RANSAC, static split, ego-velocity (LSQ + REVE)."""

import jax
import jax.numpy as jnp
import numpy as np

from icp4dradar_tpu.config import DopplerRansacConfig, ReveConfig
from icp4dradar_tpu.io import RadarScan, SyntheticSequence
from icp4dradar_tpu.preprocess import (
    estimate_ego_velocity,
    fit_sine_ransac,
    lsq_ego_velocity,
    preprocess_scan,
    static_dynamic_split,
)


def make_scan(rng, n=512, max_points=1024, v_ego=(2.0, 0.5, 0.1),
              noise=0.02, n_dyn=0, dyn_offset=3.0):
    """Synthetic single scan: static points with v_r = d . v_ego (+noise),
    n_dyn dynamic points with extra Doppler."""
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * np.array([30, 30, 5], np.float32)
    xyz[:, 0] += 40.0  # keep points forward, nonzero range
    r = np.linalg.norm(xyz, axis=-1)
    d = xyz / r[:, None]
    v = np.asarray(v_ego, dtype=np.float32)
    doppler = d @ v + rng.normal(0, noise, n).astype(np.float32)
    dyn = np.zeros(n, dtype=bool)
    if n_dyn:
        idx = rng.choice(n, n_dyn, replace=False)
        doppler[idx] += dyn_offset
        dyn[idx] = True
    intensity = rng.uniform(5, 20, n).astype(np.float32)
    scan = RadarScan.from_arrays(xyz, doppler, intensity, max_points=max_points)
    return scan, v, dyn


class TestSineRansac:
    def test_recovers_model_on_clean_scan(self, rng):
        scan, v, _ = make_scan(rng, noise=0.0)
        fit = fit_sine_ransac(scan, jax.random.key(0))
        assert bool(fit.valid)
        # With a good model nearly all valid points are inliers
        assert float(fit.inliers) > 0.95 * float(scan.num_valid)

    def test_outliers_rejected(self, rng):
        scan, v, dyn = make_scan(rng, n=512, n_dyn=100, dyn_offset=4.0, noise=0.01)
        cfg = DopplerRansacConfig()
        fit = fit_sine_ransac(scan, jax.random.key(1), cfg)
        static, dynamic = static_dynamic_split(scan, fit, cfg)
        dyn_padded = np.zeros(1024, dtype=bool)
        dyn_padded[:512] = dyn
        dynamic = np.asarray(dynamic) > 0.5
        # most injected dynamics flagged; few false positives
        recall = (dynamic & dyn_padded).sum() / dyn_padded.sum()
        fp = (dynamic & ~dyn_padded).sum() / 412
        assert recall > 0.9, recall
        assert fp < 0.12, fp

    def test_padding_invariance(self, rng):
        scan, _, _ = make_scan(rng, n=300, max_points=512)
        scan2 = RadarScan.from_arrays(
            np.asarray(scan.xyz)[:300], np.asarray(scan.doppler)[:300],
            np.asarray(scan.intensity)[:300], max_points=2048,
        )
        f1 = fit_sine_ransac(scan, jax.random.key(3))
        f2 = fit_sine_ransac(scan2, jax.random.key(3))
        # same data, different padding -> same inlier count
        assert abs(float(f1.inliers) - float(f2.inliers)) <= 6


class TestLsqVelocity:
    def test_exact_recovery(self, rng):
        scan, v, _ = make_scan(rng, noise=0.0)
        vel, KtK = lsq_ego_velocity(scan, scan.mask)
        np.testing.assert_allclose(np.asarray(vel), v, atol=1e-3)

    def test_dynamic_points_bias_removed_by_split(self, rng):
        scan, v, dyn = make_scan(rng, n=512, n_dyn=120, dyn_offset=5.0, noise=0.01)
        cfg = DopplerRansacConfig()
        fit, static, dynamic, vel = preprocess_scan(scan, jax.random.key(2), cfg)
        np.testing.assert_allclose(np.asarray(vel), v, atol=0.08)
        # un-split LSQ is biased
        vel_raw, _ = lsq_ego_velocity(scan, scan.mask)
        assert np.linalg.norm(np.asarray(vel_raw) - v) > np.linalg.norm(
            np.asarray(vel) - v
        )


class TestReve:
    def test_recovers_velocity_with_outliers(self, rng):
        scan, v, dyn = make_scan(rng, n=800, max_points=1024, n_dyn=150,
                                 dyn_offset=4.0, noise=0.02)
        est = estimate_ego_velocity(scan, jax.random.key(0))
        assert bool(est.valid)
        assert not bool(est.zero_velocity)
        np.testing.assert_allclose(np.asarray(est.velocity), v, atol=0.05)
        # injected dynamics are excluded from the inlier scan
        inl = np.asarray(est.inlier_mask)[:800] > 0.5
        assert (inl & dyn).sum() <= 2

    def test_zero_velocity_branch(self, rng):
        scan, v, _ = make_scan(rng, v_ego=(0.0, 0.0, 0.0), noise=0.01)
        est = estimate_ego_velocity(scan, jax.random.key(1))
        assert bool(est.zero_velocity)
        np.testing.assert_allclose(np.asarray(est.velocity), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(est.sigma), 0.025, atol=1e-6)

    def test_gates_remove_far_points(self, rng):
        cfg = ReveConfig(max_dist=50.0)
        xyz = np.array([[10.0, 0, 0], [70.0, 0, 0]], dtype=np.float32)
        scan = RadarScan.from_arrays(xyz, np.zeros(2), np.ones(2) * 10, max_points=8)
        est = estimate_ego_velocity(scan, jax.random.key(2), cfg)
        inl = np.asarray(est.inlier_mask)
        assert inl[1] == 0.0  # beyond max_dist

    def test_jit_and_vmap(self, rng):
        scans = []
        for i in range(4):
            s, _, _ = make_scan(rng, n=256, max_points=512)
            scans.append(s)
        from icp4dradar_tpu.io.scan import stack_scans

        batch = stack_scans(scans)
        keys = jax.random.split(jax.random.key(0), 4)
        f = jax.jit(jax.vmap(lambda s, k: estimate_ego_velocity(s, k).velocity))
        out = f(batch, keys)
        assert out.shape == (4, 3)
        assert np.isfinite(np.asarray(out)).all()


def test_preprocess_on_synthetic_sequence():
    seq = SyntheticSequence(num_frames=4, max_points=1024, num_landmarks=8000,
                            dynamic_fraction=0.15)
    scan = seq.scan(2)
    v_true = seq.ego_velocity(2)
    est = estimate_ego_velocity(scan, jax.random.key(5))
    v_est = np.asarray(est.velocity)
    # horizontal velocity tight; vz loose (thin elevation wedge -> weak
    # vertical observability in the synthetic scene)
    np.testing.assert_allclose(v_est[:2], v_true[:2], atol=0.05)
    assert abs(v_est[2] - v_true[2]) < 0.25
