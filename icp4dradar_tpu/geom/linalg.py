"""Batched small-matrix linear algebra for the GN solvers.

6x6 (registration) and 6Kx6K (pose graph) SPD solves via Cholesky; condition
number gate matching the reference's REVE `max_r_cond` check
(src/radar_odometry.cpp:598).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_psd(A: jnp.ndarray, b: jnp.ndarray, damping: float = 0.0) -> jnp.ndarray:
    """Solve A x = b for SPD A (..., D, D) via Cholesky. b: (..., D)."""
    if damping:
        A = A + damping * jnp.eye(A.shape[-1], dtype=A.dtype)
    L = jnp.linalg.cholesky(A)
    y = jax.scipy.linalg.solve_triangular(L, b[..., None], lower=True)
    x = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), y, lower=False
    )
    return x[..., 0]


def batched_solve_psd(A: jnp.ndarray, b: jnp.ndarray, damping: float = 0.0) -> jnp.ndarray:
    """vmapped SPD solve over the leading batch axis."""
    return jax.vmap(lambda a_, b_: solve_psd(a_, b_, damping))(A, b)


def inv3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate inverse of (..., 3, 3). On TPU a single LAPACK
    3x3 inv/solve costs ~0.2 ms of control flow; the adjugate is pure
    elementwise math (same trick as ops/vgicp_fused._sym_inv3)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    C00 = e * i - f * h
    C01 = -(d * i - f * g)
    C02 = d * h - e * g
    C10 = -(b * i - c * h)
    C11 = a * i - c * g
    C12 = -(a * h - b * g)
    C20 = b * f - c * e
    C21 = -(a * f - c * d)
    C22 = a * e - b * d
    det = a * C00 + b * C01 + c * C02
    inv_det = jnp.where(jnp.abs(det) > 1e-30, 1.0 / det, 0.0)
    adjT = jnp.stack([
        jnp.stack([C00, C10, C20], axis=-1),
        jnp.stack([C01, C11, C21], axis=-1),
        jnp.stack([C02, C12, C22], axis=-1),
    ], axis=-2)
    return adjT * inv_det[..., None, None]


def solve3x3(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Closed-form solve of (..., 3, 3) @ x = (..., 3) via the adjugate."""
    return jnp.einsum("...ij,...j->...i", inv3x3(A), b)


def solve_spd6(H: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Closed-form solve of a 6x6 SPD system via the Schur complement of its
    3x3 blocks (H = [[A, B], [B^T, C]]): every factor is an adjugate inv3x3,
    so no LAPACK-shaped control flow reaches the TPU. Built for the per-
    iteration GN update in registration (one 6x6 solve per sweep)."""
    A = H[..., :3, :3]
    B = H[..., :3, 3:]
    C = H[..., 3:, 3:]
    b1 = b[..., :3]
    b2 = b[..., 3:]
    Ainv = inv3x3(A)
    BtAinv = jnp.swapaxes(B, -1, -2) @ Ainv
    S = C - BtAinv @ B
    x2 = jnp.einsum("...ij,...j->...i", inv3x3(S),
                    b2 - jnp.einsum("...ij,...j->...i", BtAinv, b1))
    x1 = jnp.einsum("...ij,...j->...i", Ainv,
                    b1 - jnp.einsum("...ij,...j->...i", B, x2))
    return jnp.concatenate([x1, x2], axis=-1)


def sym3x3_eigvals(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form eigenvalues of symmetric (..., 3, 3), ascending.

    Trigonometric form (Smith 1961) — elementwise ops only. LAPACK-style
    `eigvalsh` on a 3x3 costs ~0.2 ms on TPU (iterative control flow);
    this is a handful of VPU ops.
    """
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    B = A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detB = jnp.linalg.det(B)  # 3x3 det is closed-form in XLA
    r = jnp.clip(detB / (2.0 * p ** 3), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    near_diag = p2 < 1e-28
    return jnp.where(
        near_diag[..., None],
        jnp.stack([q, q, q], axis=-1),
        jnp.stack([e3, e2, e1], axis=-1),
    )


def sym3x3_smallest_eigvec(A: jnp.ndarray) -> jnp.ndarray:
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


def sym3x3_largest_eigvec(A: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of the LARGEST eigenvalue of symmetric (..., 3, 3):
    the smallest eigenvector of -A (spectrum negated, order reversed)."""
    return sym3x3_smallest_eigvec(-A)


def condition_number(A: jnp.ndarray) -> jnp.ndarray:
    """2-norm condition estimate of symmetric (..., D, D) via eigenvalues."""
    if A.shape[-1] == 3:
        ev = sym3x3_eigvals(A)
    else:
        ev = jnp.linalg.eigvalsh(A)
    return jnp.abs(ev[..., -1]) / jnp.maximum(jnp.abs(ev[..., 0]), 1e-20)
