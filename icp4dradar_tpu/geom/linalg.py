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


def condition_number(A: jnp.ndarray) -> jnp.ndarray:
    """2-norm condition estimate of symmetric (..., D, D) via eigenvalues."""
    ev = jnp.linalg.eigvalsh(A)
    return jnp.abs(ev[..., -1]) / jnp.maximum(jnp.abs(ev[..., 0]), 1e-20)
