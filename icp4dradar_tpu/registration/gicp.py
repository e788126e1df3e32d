"""GICP: distribution-to-distribution registration with plane-regularized
per-point covariances and a Gauss-Newton SE(3) solve.

Behavioral spec: `fast_gicp::FastGICPSingleThread` as used by the reference
for scan-to-submap alignment (src/radar_odometry.cpp:399-411): covariances
from k=5 nearest neighbors (`setCorrespondenceRandomness(5)`, :404),
eigenvalue regularization to (1, 1, eps) "plane" form, Mahalanobis cost
r^T (C_b + R C_a R^T)^-1 r, single correspondence per point gated by
MAX_SEARCH_RADIUS (:35). The kNN covariance stage and the per-iteration
correspondence search run as batched MXU matmuls; the 6x6 normal-equation
solve is a Cholesky (geom/linalg.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from icp4dradar_tpu.config import GicpConfig
from icp4dradar_tpu.geom import se3_apply, se3_exp, se3_identity, se3_log
from icp4dradar_tpu.geom.linalg import (
    solve_psd,
    sym3x3_eigvals,
    sym3x3_smallest_eigvec,
)
from icp4dradar_tpu.geom.so3 import so3_hat
from icp4dradar_tpu.ops import knn, nearest_neighbor


# closed-form smallest-eigenvector now lives in geom.linalg
# (promoted so graph/structure_factors.py can classify map Gaussians too)
_smallest_eigvec3 = sym3x3_smallest_eigvec


@struct.dataclass
class GicpResult:
    transform: jnp.ndarray   # (4,4) T: src -> tgt
    converged: jnp.ndarray   # () bool
    fitness: jnp.ndarray     # () mean squared correspondence distance
    iterations: jnp.ndarray  # () int32


def covariances_from_neighbors(
    queries: jnp.ndarray,
    neigh: jnp.ndarray,
    valid: jnp.ndarray,
    cov_epsilon: float = 1e-3,
) -> jnp.ndarray:
    """(N,3,3) plane-regularized covariances from explicit neighborhoods.

    queries (N,3), neigh (N,k,3), valid (N,k) bool — invalid neighbor slots
    fall back to the query point. FastGICP's eigenvalue regularization
    (1, 1, eps) in closed form: I - (1-eps) n n^T with n the surface normal
    (smallest eigenvector — no LAPACK eigh, ~0.2 ms/dispatch of control
    flow on TPU; docs/PERFORMANCE.md rule 2)."""
    dtype = queries.dtype
    neigh = jnp.where(valid[..., None], neigh, queries[:, None, :])
    wk = valid.astype(dtype)
    nk = jnp.maximum(jnp.sum(wk, axis=-1, keepdims=True), 1.0)
    mu = jnp.sum(neigh * wk[..., None], axis=-2) / nk
    c = (neigh - mu[:, None, :]) * wk[..., None]
    cov = jnp.einsum("nki,nkj->nij", c, c) / nk[..., None]
    n = _smallest_eigvec3(cov)
    eye = jnp.eye(3, dtype=dtype)
    return eye - (1.0 - cov_epsilon) * n[..., :, None] * n[..., None, :]


def point_covariances(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    k: int = 5,
    cov_epsilon: float = 1e-3,
) -> jnp.ndarray:
    """(N,3,3) plane-regularized covariance per point from its k-NN.

    FastGICP semantics: covariance of the k nearest neighbors, eigenvalues
    replaced by (1, 1, eps) (plane regularization) — scale-free, so only the
    orientation of the local surface matters.
    """
    idx, d2 = knn(xyz, xyz, k, mask)
    neigh = xyz[idx]                                   # (N,k,3)
    # neighbors marked invalid (huge d2) fall back to the point itself
    return covariances_from_neighbors(xyz, neigh, d2 < 1e20, cov_epsilon)


def gicp_align(
    src_xyz: jnp.ndarray,
    tgt_xyz: jnp.ndarray,
    src_mask: Optional[jnp.ndarray] = None,
    tgt_mask: Optional[jnp.ndarray] = None,
    init_transform: Optional[jnp.ndarray] = None,
    cfg: GicpConfig = GicpConfig(),
    src_cov: Optional[jnp.ndarray] = None,
    tgt_cov: Optional[jnp.ndarray] = None,
) -> GicpResult:
    """Align src onto tgt with distribution-to-distribution Gauss-Newton."""
    if src_mask is None:
        src_mask = jnp.ones(src_xyz.shape[0], dtype=src_xyz.dtype)
    if tgt_mask is None:
        tgt_mask = jnp.ones(tgt_xyz.shape[0], dtype=tgt_xyz.dtype)
    if src_cov is None:
        src_cov = point_covariances(src_xyz, src_mask, cfg.k_correspondences,
                                    cfg.cov_epsilon)
    if tgt_cov is None:
        tgt_cov = point_covariances(tgt_xyz, tgt_mask, cfg.k_correspondences,
                                    cfg.cov_epsilon)
    T0 = se3_identity(src_xyz.dtype) if init_transform is None else init_transform
    max_d2 = jnp.asarray(cfg.max_correspondence_dist, src_xyz.dtype) ** 2

    def gn_step(T):
        R = T[:3, :3]
        p = se3_apply(T, src_xyz)                       # (N,3) transformed src
        idx, d2 = nearest_neighbor(p, tgt_xyz, tgt_mask)
        w = src_mask * (d2 < max_d2)
        q = tgt_xyz[idx]
        Cb = tgt_cov[idx]
        Ca_rot = jnp.einsum("ij,njk,lk->nil", R, src_cov, R)
        M = jnp.linalg.inv(
            Cb + Ca_rot + cfg.cov_epsilon * jnp.eye(3, dtype=T.dtype)
        )                                               # (N,3,3) info matrices
        r = q - p                                       # (N,3) residuals
        # J = d r / d xi for T <- exp(xi) T, xi = [v, w]:
        #   r = q - exp(xi) p  =>  dr/dv = -I, dr/dw = hat(p)
        Jv = -jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), (p.shape[0], 3, 3))
        Jw = so3_hat(p)
        J = jnp.concatenate([Jv, Jw], axis=-1)          # (N,3,6)
        MJ = M @ J                                      # (N,3,6)
        wJ = J * w[:, None, None]
        H = jnp.einsum("nij,nik->jk", wJ, MJ)           # (6,6)
        g = jnp.einsum("nij,ni->j", wJ, jnp.einsum("nij,nj->ni", M, r))
        H = H + cfg.lm_lambda * jnp.eye(6, dtype=T.dtype)
        xi = -solve_psd(H, g)
        return se3_exp(xi) @ T, jnp.sum(jnp.abs(xi))

    def cond(state):
        T, it, delta = state
        return (it < cfg.max_iterations) & (delta > cfg.transformation_epsilon)

    def body(state):
        T, it, _ = state
        T_new, delta = gn_step(T)
        return (T_new, it + 1, delta)

    init = (T0, jnp.int32(0), jnp.asarray(jnp.inf, src_xyz.dtype))
    T, iters, delta = jax.lax.while_loop(cond, body, init)

    moved = se3_apply(T, src_xyz)
    _, d2_fit = nearest_neighbor(moved, tgt_xyz, tgt_mask)
    gated = src_mask * (d2_fit < max_d2)
    n_valid = jnp.maximum(jnp.sum(gated), 1.0)
    fitness = jnp.sum(d2_fit * gated) / n_valid
    converged = (delta <= cfg.transformation_epsilon) | (iters >= cfg.max_iterations)
    return GicpResult(transform=T, converged=converged, fitness=fitness,
                      iterations=iters)
