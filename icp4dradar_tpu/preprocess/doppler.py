"""Doppler sine-model RANSAC, static/dynamic split, LSQ ego-velocity.

TPU-native rebuild of the reference's scan preprocessing
(src/iterative_closest_point.cpp:85-128 `fitSineRansac`, :391-407 split,
:410-431 LSQ): instead of 0.2*N sequential random hypotheses each scored by
an O(N) loop, a fixed batch of H 2-point hypotheses is formed and scored in
one (H, N) broadcast on the VPU — identical model, deterministic
jax.random keys, fully vmappable over scan batches.

Model (ref :84): v_r * cos(beta) = A * cos(alpha + b).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from icp4dradar_tpu.config import DopplerRansacConfig
from icp4dradar_tpu.geom.linalg import solve3x3
from icp4dradar_tpu.io.scan import RadarScan


@struct.dataclass
class SineFit:
    """Best-fit Doppler sine model."""

    A: jnp.ndarray        # () amplitude
    b: jnp.ndarray        # () phase [rad]
    inliers: jnp.ndarray  # () best inlier count
    valid: jnp.ndarray    # () bool — enough valid points to fit


def _sample_valid_indices(key, mask: jnp.ndarray, num: int) -> jnp.ndarray:
    """(num,) indices drawn uniformly from valid slots — replaces the
    reference's std::random_device draws :96-100 with deterministic keys
    (SURVEY.md §7 'RANSAC under jit').

    Inverse-CDF over the validity cumsum: draw `num` uniforms and count the
    crossing position with one (num, N) compare — generating only `num`
    random floats instead of a (num, N) Gumbel tile (RNG dominated the
    original preprocessing cost)."""
    c = jnp.cumsum((mask > 0.5).astype(jnp.float32))
    u = jax.random.uniform(key, (num,)) * c[-1]
    idx = jnp.sum(c[None, :] <= u[:, None], axis=-1)
    return jnp.clip(idx, 0, mask.shape[0] - 1)


def sine_residuals(scan: RadarScan, A, b) -> jnp.ndarray:
    """delta_j = v_j cos(beta_j) - A cos(alpha_j + b)  (ref :114, :394)."""
    return scan.doppler * jnp.cos(scan.elevation) - A * jnp.cos(scan.azimuth + b)


def fit_sine_ransac(
    scan: RadarScan,
    key: jax.Array,
    cfg: DopplerRansacConfig = DopplerRansacConfig(),
) -> SineFit:
    """Batched 2-point RANSAC fit of v_r cos(beta) = A cos(alpha + b).

    Hypothesis closed form matches the reference exactly (ref :106-108):
        k = (v1 cos b1) / (v2 cos b2)
        b = atan((cos a1 - k cos a2) / (sin a1 - k sin a2))
        A = v1 cos(b1) / cos(a1 + b)
    """
    H = cfg.num_hypotheses
    k1, k2 = jax.random.split(key)
    i1 = _sample_valid_indices(k1, scan.mask, H)
    i2 = _sample_valid_indices(k2, scan.mask, H)

    alpha = scan.azimuth
    ce = jnp.cos(scan.elevation)
    vr_ce = scan.doppler * ce  # v_r cos(beta), the model LHS
    # trig precomputed once per point; hypothesis scoring is then pure FMA:
    # A cos(a+b) = (A cos b) cos a - (A sin b) sin a = u*ca + w*sa
    ca = jnp.cos(alpha)
    sa = jnp.sin(alpha)

    a1, a2 = alpha[i1], alpha[i2]
    y1, y2 = vr_ce[i1], vr_ce[i2]
    k = y1 / jnp.where(jnp.abs(y2) < 1e-12, 1e-12, y2)
    denom = sa[i1] - k * sa[i2]
    b = jnp.arctan(
        (ca[i1] - k * ca[i2])
        / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    )
    cosab = jnp.cos(a1 + b)
    A = y1 / jnp.where(jnp.abs(cosab) < 1e-12, 1e-12, cosab)

    # Score all H hypotheses against all N points in one broadcast (no
    # transcendentals in the (H, N) tile).
    u = A * jnp.cos(b)
    w_c = A * jnp.sin(b)
    delta = vr_ce[None, :] - (u[:, None] * ca[None, :] - w_c[:, None] * sa[None, :])
    finite = jnp.isfinite(A) & jnp.isfinite(b)
    score = jnp.sum(
        (jnp.abs(delta) < cfg.inlier_sigma) * scan.mask[None, :], axis=-1
    )
    score = jnp.where(finite, score, -1.0)
    best = jnp.argmax(score)
    A_best, b_best = A[best], b[best]

    if cfg.refine_iters > 0:
        # Polish: A cos(a+b) = u cos a + w sin a is linear in (u, w) =
        # (A cos b, -A sin b) — IRLS refit on the current inlier set. The
        # 2-point closed form alone leaves an O(sigma) bias the reference
        # inherits; the refit removes it at negligible cost.
        def refine(carry, _):
            A_c, b_c = carry
            inl = (jnp.abs(vr_ce - A_c * jnp.cos(alpha + b_c)) < cfg.inlier_sigma)
            w_m = inl * scan.mask
            X = jnp.stack([jnp.cos(alpha), jnp.sin(alpha)], axis=-1) * w_m[:, None]
            y = vr_ce * w_m
            G = X.T @ X + 1e-9 * jnp.eye(2, dtype=X.dtype)
            # closed-form 2x2 solve (LAPACK-shaped 2x2 costs ~0.2 ms on TPU)
            Xy = X.T @ y
            det = G[0, 0] * G[1, 1] - G[0, 1] * G[1, 0]
            inv_det = jnp.where(jnp.abs(det) > 1e-30, 1.0 / det, 0.0)
            uw = inv_det * jnp.stack([
                G[1, 1] * Xy[0] - G[0, 1] * Xy[1],
                G[0, 0] * Xy[1] - G[1, 0] * Xy[0],
            ])
            A_n = jnp.sqrt(uw[0] ** 2 + uw[1] ** 2)
            b_n = jnp.arctan2(-uw[1], uw[0])
            return (A_n, b_n), None

        (A_best, b_best), _ = jax.lax.scan(
            refine, (A_best, b_best), None, length=cfg.refine_iters
        )

    inliers = jnp.sum(
        (jnp.abs(vr_ce - A_best * jnp.cos(alpha + b_best)) < cfg.inlier_sigma)
        * scan.mask
    )
    n_valid = jnp.sum(scan.mask)
    return SineFit(
        A=A_best,
        b=b_best,
        inliers=inliers,
        valid=n_valid >= 2,
    )


def static_dynamic_split(
    scan: RadarScan,
    fit: SineFit,
    cfg: DopplerRansacConfig = DopplerRansacConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(static_mask, dynamic_mask), both (N,) in {0,1} and AND'd with validity.

    Reference split is one-sided: delta > 0.2 -> dynamic, else static
    (src/iterative_closest_point.cpp:394-403); `two_sided_split` rejects
    |delta| > thresh instead.
    """
    delta = sine_residuals(scan, fit.A, fit.b)
    if cfg.two_sided_split:
        dynamic = jnp.abs(delta) > cfg.static_threshold
    else:
        dynamic = delta > cfg.static_threshold
    dynamic = dynamic & (scan.mask > 0.5)
    static = (~dynamic) & (scan.mask > 0.5)
    return static.astype(scan.mask.dtype), dynamic.astype(scan.mask.dtype)


def lsq_ego_velocity(
    scan: RadarScan, static_mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3-DoF ego velocity V = (K^T K)^-1 K^T v_r over static points.

    K rows are the direction cosines [cos a cos b, sin a cos b, sin b]
    (ref src/iterative_closest_point.cpp:412-429) — identical to the unit
    point directions, so K = scan.direction.

    Returns (V (3,), KtK (3,3)) — KtK exposed for conditioning gates.
    """
    K = scan.direction * static_mask[..., None]
    vr = scan.doppler * static_mask
    KtK = K.T @ K + 1e-6 * jnp.eye(3, dtype=K.dtype)
    Ktv = K.T @ vr
    V = solve3x3(KtK, Ktv)   # closed-form: LAPACK 3x3 ~0.2 ms on TPU
    return V, KtK


def preprocess_scan(
    scan: RadarScan,
    key: jax.Array,
    cfg: DopplerRansacConfig = DopplerRansacConfig(),
):
    """Full reference preprocessing for one scan: RANSAC fit -> split ->
    LSQ velocity. Returns (fit, static_mask, dynamic_mask, velocity)."""
    fit = fit_sine_ransac(scan, key, cfg)
    static_mask, dynamic_mask = static_dynamic_split(scan, fit, cfg)
    velocity, _ = lsq_ego_velocity(scan, static_mask)
    return fit, static_mask, dynamic_mask, velocity
