"""Unit tests for geom: SO(3)/SE(3) maps, Kabsch, masked LSQ (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icp4dradar_tpu.geom import (
    kabsch_umeyama,
    masked_lstsq,
    matrix_to_quat,
    matrix_to_rpy,
    quat_identity,
    quat_multiply,
    quat_normalize,
    quat_rotate,
    quat_slerp,
    quat_to_matrix,
    se3_apply,
    se3_compose,
    se3_exp,
    se3_from_rt,
    se3_inverse,
    se3_log,
    so3_exp,
    so3_log,
    solve_psd,
    condition_number,
)


def random_rotations(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return q


class TestSO3:
    def test_quat_matrix_roundtrip(self, rng):
        q = random_rotations(rng, 64)
        R = quat_to_matrix(q)
        q2 = matrix_to_quat(R)
        # q and -q are the same rotation
        dot = np.abs(np.sum(np.asarray(q2) * q, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_quat_rotate_matches_matrix(self, rng):
        q = random_rotations(rng, 16)
        v = rng.normal(size=(16, 3)).astype(np.float32)
        out1 = quat_rotate(q, v)
        out2 = (quat_to_matrix(q) @ v[..., None])[..., 0]
        np.testing.assert_allclose(out1, out2, atol=1e-5)

    def test_exp_log_roundtrip(self, rng):
        # keep |w| < pi: so3_log returns the principal branch
        axis = rng.normal(size=(64, 3)).astype(np.float32)
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        w = axis * rng.uniform(0.0, 3.0, size=(64, 1)).astype(np.float32)
        R = so3_exp(w)
        # orthonormality
        eye = np.eye(3, dtype=np.float32)
        np.testing.assert_allclose(
            np.asarray(R @ jnp.swapaxes(R, -1, -2)), np.tile(eye, (64, 1, 1)), atol=1e-5
        )
        w2 = so3_log(R)
        np.testing.assert_allclose(np.asarray(w2), w, atol=1e-4)

    def test_exp_log_small_angle(self):
        w = jnp.array([[1e-7, -2e-7, 5e-8], [0.0, 0.0, 0.0]], dtype=jnp.float32)
        R = so3_exp(w)
        w2 = so3_log(R)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-6)

    def test_log_near_pi(self):
        # Rotation by pi about z
        w = jnp.array([0.0, 0.0, np.pi - 1e-4], dtype=jnp.float32)
        R = so3_exp(w)
        w2 = so3_log(R)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-2)

    def test_slerp_endpoints(self, rng):
        a = random_rotations(rng, 8)
        b = random_rotations(rng, 8)
        s0 = quat_slerp(a, b, 0.0)
        s1 = quat_slerp(a, b, 1.0)
        np.testing.assert_allclose(np.abs(np.sum(np.asarray(s0) * a, -1)), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.abs(np.sum(np.asarray(s1) * b, -1)), 1.0, atol=1e-5)

    def test_rpy_yaw(self):
        # Pure yaw rotation: heading should equal the yaw angle in degrees
        # (semantics of ref R2rpy, src/radar_odometry.cpp:120-135).
        yaw = np.deg2rad(37.0)
        R = so3_exp(jnp.array([0.0, 0.0, yaw], dtype=jnp.float32))
        rpy = matrix_to_rpy(R)
        np.testing.assert_allclose(np.asarray(rpy), [0.0, 0.0, 37.0], atol=1e-4)


class TestSE3:
    def test_compose_inverse(self, rng):
        q = random_rotations(rng, 8)
        t = rng.normal(size=(8, 3)).astype(np.float32)
        T = se3_from_rt(quat_to_matrix(q), t)
        eye = se3_compose(T, se3_inverse(T))
        np.testing.assert_allclose(
            np.asarray(eye), np.tile(np.eye(4, dtype=np.float32), (8, 1, 1)), atol=1e-5
        )

    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(32, 6)).astype(np.float32) * 0.8
        T = se3_exp(xi)
        xi2 = se3_log(T)
        np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-4)

    def test_apply_batched_points(self, rng):
        xi = rng.normal(size=(6,)).astype(np.float32)
        T = se3_exp(xi)
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        out = se3_apply(T, pts)
        R = np.asarray(T)[:3, :3]
        tt = np.asarray(T)[:3, 3]
        np.testing.assert_allclose(np.asarray(out), pts @ R.T + tt, atol=1e-5)


class TestKabsch:
    def test_recovers_known_transform(self, rng):
        src = rng.normal(size=(200, 3)).astype(np.float32) * 5.0
        xi = np.array([0.3, -0.2, 0.5, 0.1, 0.2, -0.3], dtype=np.float32)
        T_true = se3_exp(jnp.asarray(xi))
        tgt = se3_apply(T_true, jnp.asarray(src))
        T_est = kabsch_umeyama(jnp.asarray(src), tgt)
        np.testing.assert_allclose(np.asarray(T_est), np.asarray(T_true), atol=1e-4)

    def test_masked_outliers_ignored(self, rng):
        src = rng.normal(size=(100, 3)).astype(np.float32)
        T_true = se3_exp(jnp.asarray([0.1, 0.0, 0.2, 0.05, -0.02, 0.3], dtype=jnp.float32))
        tgt = np.array(se3_apply(T_true, jnp.asarray(src)))
        # corrupt 20 pairs, mask them out
        tgt[80:] += 100.0
        w = np.ones(100, dtype=np.float32)
        w[80:] = 0.0
        T_est = kabsch_umeyama(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(T_est), np.asarray(T_true), atol=1e-4)

    def test_degenerate_reflection_guard(self, rng):
        # coplanar points must still yield det(R)=+1
        src = rng.normal(size=(50, 3)).astype(np.float32)
        src[:, 2] = 0.0
        T_true = se3_exp(jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, 1.0], dtype=jnp.float32))
        tgt = se3_apply(T_true, jnp.asarray(src))
        T_est = kabsch_umeyama(jnp.asarray(src), tgt)
        det = np.linalg.det(np.asarray(T_est)[:3, :3])
        np.testing.assert_allclose(det, 1.0, atol=1e-4)


class TestLinalg:
    def test_masked_lstsq(self, rng):
        A = rng.normal(size=(500, 3)).astype(np.float32)
        x_true = np.array([1.5, -2.0, 0.7], dtype=np.float32)
        b = A @ x_true
        b[400:] += 50.0  # corrupted rows
        mask = np.ones(500, dtype=np.float32)
        mask[400:] = 0.0
        x, AtA = masked_lstsq(jnp.asarray(A), jnp.asarray(b), jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(x), x_true, atol=1e-3)
        assert AtA.shape == (3, 3)

    def test_solve_psd(self, rng):
        M = rng.normal(size=(6, 6)).astype(np.float32)
        A = M @ M.T + 6 * np.eye(6, dtype=np.float32)
        x_true = rng.normal(size=(6,)).astype(np.float32)
        b = A @ x_true
        x = solve_psd(jnp.asarray(A), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(x), x_true, atol=1e-3)

    def test_condition_number(self):
        A = jnp.diag(jnp.array([1.0, 10.0, 100.0], dtype=jnp.float32))
        c = condition_number(A)
        np.testing.assert_allclose(float(c), 100.0, rtol=1e-4)


def test_geom_jit_and_vmap(rng):
    """Everything must trace under jit and vmap (SURVEY.md §7 design stance)."""
    xi = jnp.asarray(rng.normal(size=(4, 6)).astype(np.float32))
    f = jax.jit(jax.vmap(lambda x: se3_log(se3_exp(x))))
    np.testing.assert_allclose(np.asarray(f(xi)), np.asarray(xi), atol=1e-4)


class TestSo3Project:
    def test_recovers_orthonormality(self, rng):
        from icp4dradar_tpu.geom.so3 import so3_exp, so3_project

        R = np.asarray(so3_exp(jnp.asarray([0.3, -0.2, 0.5], jnp.float32)))
        # scale + noise of the magnitude f32 pose chains accumulate
        bad = R * 1.002 + 1e-3 * rng.normal(size=(3, 3)).astype(np.float32)
        Rp = np.asarray(so3_project(jnp.asarray(bad)))
        err = np.abs(Rp @ Rp.T - np.eye(3)).max()
        assert err < 1e-5, err
        # stays close to the original rotation
        assert np.abs(Rp - R).max() < 5e-3

    def test_identity_fixed_point(self):
        from icp4dradar_tpu.geom.so3 import so3_project

        Rp = np.asarray(so3_project(jnp.eye(3, dtype=jnp.float32)))
        np.testing.assert_allclose(Rp, np.eye(3), atol=1e-7)


class TestClosedFormSolves:
    def test_inv3x3_matches_numpy(self, rng):
        from icp4dradar_tpu.geom.linalg import inv3x3

        A = rng.normal(size=(7, 3, 3)).astype(np.float32)
        A = A @ A.transpose(0, 2, 1) + 0.5 * np.eye(3, dtype=np.float32)
        got = np.asarray(inv3x3(jnp.asarray(A)))
        ref = np.linalg.inv(A)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)

    def test_solve3x3_matches_numpy(self, rng):
        from icp4dradar_tpu.geom.linalg import solve3x3

        A = rng.normal(size=(3, 3)).astype(np.float32)
        A = A @ A.T + 0.5 * np.eye(3, dtype=np.float32)
        b = rng.normal(size=3).astype(np.float32)
        got = np.asarray(solve3x3(jnp.asarray(A), jnp.asarray(b)))
        np.testing.assert_allclose(got, np.linalg.solve(A, b),
                                   rtol=2e-4, atol=2e-5)

    def test_solve_spd6_matches_numpy(self, rng):
        from icp4dradar_tpu.geom.linalg import solve_spd6

        J = rng.normal(size=(40, 6)).astype(np.float32)
        H = (J.T @ J + 0.1 * np.eye(6)).astype(np.float32)
        b = rng.normal(size=6).astype(np.float32)
        got = np.asarray(solve_spd6(jnp.asarray(H), jnp.asarray(b)))
        np.testing.assert_allclose(got, np.linalg.solve(H, b),
                                   rtol=5e-3, atol=5e-4)
