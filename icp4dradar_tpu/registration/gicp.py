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
from icp4dradar_tpu.geom.linalg import solve_psd, sym3x3_eigvals
from icp4dradar_tpu.geom.so3 import so3_hat
from icp4dradar_tpu.ops import knn, nearest_neighbor


def _smallest_eigvec3(A: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of symmetric (..., 3, 3).

    Closed form (no LAPACK control flow, which costs ~0.2 ms per dispatch on
    TPU): with lam_min from the trigonometric eigenvalue formula, any nonzero
    cross product of two rows of M = A - lam_min*I spans the eigenspace.
    Rank-degenerate fallbacks (repeated smallest eigenvalue / isotropic A)
    pick an arbitrary valid direction, mirroring LAPACK's arbitrary choice.
    """
    lam = sym3x3_eigvals(A)[..., 0]
    M = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    frob2 = jnp.sum(M * M, axis=(-2, -1))
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    cands = jnp.stack(
        [jnp.cross(r0, r1), jnp.cross(r0, r2), jnp.cross(r1, r2)], axis=-2
    )                                                   # (..., 3, 3)
    n2 = jnp.sum(cands * cands, axis=-1)                # (..., 3)
    oh = jax.nn.one_hot(jnp.argmax(n2, axis=-1), 3, dtype=A.dtype)
    v = jnp.einsum("...k,...ki->...i", oh, cands)
    v2 = jnp.sum(v * v, axis=-1)
    # Degenerate: repeated smallest eigenvalue -> M is rank <= 1, every
    # cross ~ 0. Its largest row spans the top eigenvector; anything
    # orthogonal to that row is a valid smallest eigenvector.
    rn2 = jnp.sum(M * M, axis=-1)
    ohr = jax.nn.one_hot(jnp.argmax(rn2, axis=-1), 3, dtype=A.dtype)
    r = jnp.einsum("...k,...ki->...i", ohr, M)
    helper = jnp.where(
        (jnp.abs(r[..., 0]) <= jnp.abs(r[..., 2]))[..., None],
        jnp.array([1.0, 0.0, 0.0], A.dtype),
        jnp.array([0.0, 0.0, 1.0], A.dtype),
    )
    w = jnp.cross(r, helper)
    w2 = jnp.sum(w * w, axis=-1)
    # fully isotropic (M ~ 0): any unit vector is an eigenvector
    w = jnp.where((w2 > 1e-24 * frob2 + 1e-38)[..., None], w,
                  jnp.array([0.0, 1.0, 0.0], A.dtype))
    use_v = (v2 > 1e-24 * frob2 * frob2 + 1e-38)[..., None]
    n = jnp.where(use_v, v, w)
    return n / jnp.sqrt(jnp.maximum(jnp.sum(n * n, axis=-1, keepdims=True),
                                    1e-38))


@struct.dataclass
class GicpResult:
    transform: jnp.ndarray   # (4,4) T: src -> tgt
    converged: jnp.ndarray   # () bool
    fitness: jnp.ndarray     # () mean squared correspondence distance
    iterations: jnp.ndarray  # () int32


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
    valid = (d2 < 1e20)[..., None]
    neigh = jnp.where(valid, neigh, xyz[:, None, :])
    wk = valid[..., 0].astype(xyz.dtype)
    nk = jnp.maximum(jnp.sum(wk, axis=-1, keepdims=True), 1.0)
    mu = jnp.sum(neigh * wk[..., None], axis=-2) / nk
    c = (neigh - mu[:, None, :]) * wk[..., None]
    cov = jnp.einsum("nki,nkj->nij", c, c) / nk[..., None]
    # Plane regularization V diag(eps,1,1) V^T == I - (1-eps) n n^T with n
    # the surface normal (smallest eigenvector) — closed form, no LAPACK
    # eigh (~0.2 ms/dispatch of control flow on TPU; docs/PERFORMANCE.md
    # rule 2).
    n = _smallest_eigvec3(cov)
    eye = jnp.eye(3, dtype=xyz.dtype)
    return eye - (1.0 - cov_epsilon) * n[..., :, None] * n[..., None, :]


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
