"""Weighted/masked Kabsch (SVD) rigid alignment and masked least squares.

The closed-form inner solver of the ICP front-end (replacing PCL's internal
SVD transform estimation used at src/iterative_closest_point.cpp:508-521) and
the masked normal-equation solve behind the ego-velocity LSQ
(src/iterative_closest_point.cpp:412-429).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from icp4dradar_tpu.geom.se3 import se3_from_rt


def kabsch_umeyama(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Best-fit SE(3) T minimizing sum_i w_i ||R src_i + t - tgt_i||^2.

    src, tgt: (..., N, 3); weights: (..., N) nonnegative (0 masks a pair out).
    Returns (..., 4, 4). Runs entirely in f32 matmuls + a 3x3 SVD.
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=src.dtype)
    w = weights[..., None]
    wsum = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1e-12)
    mu_s = jnp.sum(src * w, axis=-2, keepdims=True) / wsum
    mu_t = jnp.sum(tgt * w, axis=-2, keepdims=True) / wsum
    sc = (src - mu_s) * w
    tc = tgt - mu_t
    # Cross-covariance H = sum w (src-mu_s)(tgt-mu_t)^T  -> (...,3,3)
    H = jnp.swapaxes(sc, -1, -2) @ tc
    U, _, Vt = jnp.linalg.svd(H)
    # Reflection fix: det(V U^T) sign on last column
    d = jnp.linalg.det(jnp.swapaxes(Vt, -1, -2) @ jnp.swapaxes(U, -1, -2))
    sign = jnp.concatenate(
        [jnp.ones(d.shape + (2,), dtype=src.dtype), d[..., None]], axis=-1
    )
    R = jnp.swapaxes(Vt, -1, -2) @ (sign[..., :, None] * jnp.swapaxes(U, -1, -2))
    t = mu_t[..., 0, :] - (R @ mu_s[..., 0, :, None])[..., 0]
    return se3_from_rt(R, t)


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
