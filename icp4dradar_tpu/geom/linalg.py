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


def condition_number(A: jnp.ndarray) -> jnp.ndarray:
    """2-norm condition estimate of symmetric (..., D, D) via eigenvalues."""
    if A.shape[-1] == 3:
        ev = sym3x3_eigvals(A)
    else:
        ev = jnp.linalg.eigvalsh(A)
    return jnp.abs(ev[..., -1]) / jnp.maximum(jnp.abs(ev[..., 0]), 1e-20)
