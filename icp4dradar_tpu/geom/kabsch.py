"""Weighted/masked Kabsch (SVD) rigid alignment and masked least squares.

The closed-form inner solver of the ICP front-end (replacing PCL's internal
SVD transform estimation used at src/iterative_closest_point.cpp:508-521) and
the masked normal-equation solve behind the ego-velocity LSQ
(src/iterative_closest_point.cpp:412-429).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

import jax.numpy as jnp

from icp4dradar_tpu.geom.se3 import se3_from_rt


def _moments(src, tgt, weights):
    w = weights[..., None]
    wsum = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1e-12)
    mu_s = jnp.sum(src * w, axis=-2, keepdims=True) / wsum
    mu_t = jnp.sum(tgt * w, axis=-2, keepdims=True) / wsum
    sc = (src - mu_s) * w
    tc = tgt - mu_t
    # Cross-covariance H = sum w (src-mu_s)(tgt-mu_t)^T  -> (...,3,3)
    H = jnp.swapaxes(sc, -1, -2) @ tc
    return H, mu_s[..., 0, :], mu_t[..., 0, :]


def kabsch_umeyama(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    method: str = "quat",
) -> jnp.ndarray:
    """Best-fit SE(3) T minimizing sum_i w_i ||R src_i + t - tgt_i||^2.

    src, tgt: (..., N, 3); weights: (..., N) nonnegative (0 masks a pair out).
    Returns (..., 4, 4).

    method="quat" (default): Horn's quaternion method — the rotation is the
    dominant eigenvector of the 4x4 Davenport matrix, found by shifted power
    iteration. Pure elementwise/matvec math: a 3x3 SVD costs ~0.2 ms on TPU
    (LAPACK-style control flow), the power iteration nanoseconds — and Horn
    can never return a reflection, so no det fix is needed.
    method="svd": classic SVD route (reference cross-check).
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=src.dtype)
    H, mu_s, mu_t = _moments(src, tgt, weights)
    if method == "svd":
        U, _, Vt = jnp.linalg.svd(H)
        d = jnp.linalg.det(jnp.swapaxes(Vt, -1, -2) @ jnp.swapaxes(U, -1, -2))
        sign = jnp.concatenate(
            [jnp.ones(d.shape + (2,), dtype=src.dtype), d[..., None]], axis=-1
        )
        R = jnp.swapaxes(Vt, -1, -2) @ (sign[..., :, None] * jnp.swapaxes(U, -1, -2))
    else:
        R = _rotation_from_cross_covariance(H)
    t = mu_t - (R @ mu_s[..., None])[..., 0]
    return se3_from_rt(R, t)


def _rotation_from_cross_covariance(H: jnp.ndarray, iters: int = 50) -> jnp.ndarray:
    """Horn's method: optimal R from H = sum w p q^T via the dominant
    eigenvector (unit quaternion, wxyz) of the symmetric 4x4 Davenport
    matrix, computed with shifted power iteration (branch-free, batched)."""
    Sxx, Sxy, Sxz = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    Syx, Syy, Syz = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    Szx, Szy, Szz = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    N = jnp.stack([
        jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
        jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
        jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
        jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
    ], axis=-2)                                          # (...,4,4)
    # shift so the max eigenvalue of N dominates in magnitude
    shift = jnp.sqrt(jnp.sum(N * N, axis=(-1, -2), keepdims=True)) + 1e-12
    M = N + shift * jnp.eye(4, dtype=H.dtype)
    # fixed non-axis-aligned start vector avoids orthogonal-start stalls
    v = jnp.broadcast_to(
        jnp.asarray([0.577, 0.211, 0.317, 0.722], dtype=H.dtype),
        H.shape[:-2] + (4,),
    )

    # unrolled: a lax.scan of tiny 4x4 matvecs pays per-step sequencing
    # overhead that dwarfs the math; normalize sparsely to save rsqrt
    for k in range(iters):
        v = (M @ v[..., None])[..., 0]
        if k % 8 == 7 or k == iters - 1:
            v = v / jnp.maximum(
                jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20
            )
        else:
            # keep magnitudes bounded without a full normalize
            v = v / jnp.maximum(jnp.max(jnp.abs(v), axis=-1, keepdims=True), 1e-20)
    qw, qx, qy, qz = jnp.moveaxis(v, -1, 0)
    # quaternion (wxyz) -> rotation matrix (xyzw helper expects xyzw)
    from icp4dradar_tpu.geom.so3 import quat_to_matrix

    return quat_to_matrix(jnp.stack([qx, qy, qz, qw], axis=-1))


def masked_lstsq(
    A: jnp.ndarray,
    b: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    damping: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve argmin_x ||M(Ax - b)||^2 via normal equations.

    A: (..., N, D); b: (..., N); mask: (..., N) in {0,1}.
    Returns (x: (..., D), AtA: (..., D, D)) — AtA is exposed so callers can
    gate on conditioning (reference max_r_cond check, src/radar_odometry.cpp:598).
    """
    if mask is not None:
        A = A * mask[..., None]
        b = b * mask
    AtA = jnp.swapaxes(A, -1, -2) @ A
    if damping:
        AtA = AtA + damping * jnp.eye(A.shape[-1], dtype=A.dtype)
    Atb = jnp.swapaxes(A, -1, -2) @ b[..., None]
    x = jnp.linalg.solve(AtA, Atb)[..., 0]
    return x, AtA
