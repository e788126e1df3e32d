"""REVE-style radar ego-velocity estimation with inlier extraction.

TPU-native rebuild of the external `reve::RadarEgoVelocityEstimator` the
reference depends on (configured src/radar_odometry.cpp:574-611, invoked
:328): quality gates -> zero-velocity detection -> batched 3-point RANSAC
-> masked LSQ refit with sigma/conditioning gates. All fixed-shape, jittable,
deterministic under jax.random keys.

The estimate drives scan-to-map odometry exactly as in the reference: the
returned inlier mask is the filtered scan handed to registration
(src/radar_odometry.cpp:328-342).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from icp4dradar_tpu.config import ReveConfig
from icp4dradar_tpu.geom.linalg import condition_number, inv3x3
from icp4dradar_tpu.io.scan import RadarScan


@struct.dataclass
class EgoVelocityEstimate:
    velocity: jnp.ndarray      # (3,) body-frame ego velocity
    sigma: jnp.ndarray         # (3,) per-axis std estimate
    inlier_mask: jnp.ndarray   # (N,) {0,1} — the filtered scan
    valid: jnp.ndarray         # () bool — gates passed
    zero_velocity: jnp.ndarray # () bool — zero-velocity branch taken


def _quality_gates(scan: RadarScan, cfg: ReveConfig) -> jnp.ndarray:
    """Per-point admission gates (ref config :576-583)."""
    deg = jnp.pi / 180.0
    ok = scan.mask > 0.5
    ok &= (scan.range > cfg.min_dist) & (scan.range < cfg.max_dist)
    ok &= scan.intensity > cfg.min_db
    ok &= jnp.abs(scan.azimuth) < cfg.azimuth_thresh_deg * deg
    ok &= jnp.abs(scan.elevation) < cfg.elevation_thresh_deg * deg
    ok &= (scan.xyz[..., 2] > cfg.filter_min_z) & (scan.xyz[..., 2] < cfg.filter_max_z)
    return ok


def _masked_median_abs(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of |x| over masked entries (fixed-shape: sort with +inf pads)."""
    vals = jnp.where(mask, jnp.abs(x), jnp.inf)
    vals = jnp.sort(vals)
    n = jnp.sum(mask).astype(jnp.int32)
    idx = jnp.maximum(n // 2, 0)
    med = vals[jnp.clip(idx, 0, x.shape[0] - 1)]
    return jnp.where(n > 0, med, jnp.inf)


def estimate_ego_velocity(
    scan: RadarScan,
    key: jax.Array,
    cfg: ReveConfig = ReveConfig(),
) -> EgoVelocityEstimate:
    """Estimate 3-DoF ego velocity + extract the inlier (static) scan."""
    gated = _quality_gates(scan, cfg)
    gated_f = gated.astype(scan.mask.dtype)
    d = scan.direction                      # (N,3) unit directions
    vr = scan.doppler * cfg.doppler_velocity_correction_factor

    # ---- zero-velocity detection (ref thresh_zero_velocity=0.05) ----
    med = _masked_median_abs(vr, gated)
    is_zero = med < cfg.thresh_zero_velocity

    # ---- batched 3-point RANSAC ----
    # inverse-CDF sampling (one (3H, N) crossing count, no Gumbel tile) and
    # ONE fused gather for all 3H sample rows
    H = cfg.ransac_iterations * 4           # widen the fixed batch a little
    c = jnp.cumsum(gated.astype(jnp.float32))
    u = jax.random.uniform(key, (3 * H,)) * c[-1]
    picks = jnp.clip(jnp.sum(c[None, :] <= u[:, None], axis=-1),
                     0, scan.mask.shape[0] - 1)
    payload = jnp.concatenate([d, vr[:, None]], axis=-1)[picks]  # (3H, 4)
    D = payload[:, :3].reshape(H, 3, 3)
    y = payload[:, 3].reshape(H, 3)
    # Solve D v = y per hypothesis by Cramer's rule (a batched LAPACK solve
    # on 3x3s is pathologically slow on TPU); singular samples give huge
    # residuals and lose the vote.
    r0, r1, r2 = D[:, 0], D[:, 1], D[:, 2]
    cross12 = jnp.cross(r1, r2)
    det = jnp.sum(r0 * cross12, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    # inverse columns are the row cross products: D^-1 = [r1xr2 | r2xr0 |
    # r0xr1] / det, so v = (y0 r1xr2 + y1 r2xr0 + y2 r0xr1) / det
    v_hyp = (y[:, 0:1] * cross12
             + y[:, 1:2] * jnp.cross(r2, r0)
             + y[:, 2:3] * jnp.cross(r0, r1)) * inv_det[:, None]  # (H,3)
    v_hyp = jnp.nan_to_num(v_hyp, nan=0.0, posinf=0.0, neginf=0.0)
    resid = jnp.abs(d @ v_hyp.T - vr[:, None])          # (N,H)
    inl = (resid < cfg.inlier_thresh) & gated[:, None]
    counts = jnp.sum(inl, axis=0)
    best = jnp.argmax(counts)
    inlier_mask = inl[:, best]

    # ---- LSQ refit on inliers ----
    w = inlier_mask.astype(scan.mask.dtype)
    K = d * w[:, None]
    KtK = K.T @ K + 1e-9 * jnp.eye(3, dtype=K.dtype)
    # closed-form 3x3 solve/inverse: LAPACK-shaped control flow costs
    # ~0.2 ms PER OP on TPU (docs/PERFORMANCE.md rule 2)
    KtK_inv = inv3x3(KtK)
    v_fit = KtK_inv @ (K.T @ (vr * w))
    r = (d @ v_fit - vr) * w
    n_in = jnp.maximum(jnp.sum(w), 1.0)
    s2 = jnp.sum(r * r) / jnp.maximum(n_in - 3.0, 1.0)
    cov = s2 * KtK_inv
    sigma = jnp.sqrt(jnp.clip(jnp.diagonal(cov), 0.0, None))

    # ---- acceptance gates (ref max_sigma_*, max_r_cond, outlier pct) ----
    n_gated = jnp.maximum(jnp.sum(gated_f), 1.0)
    outlier_pct = 1.0 - n_in / n_gated
    cond = condition_number(KtK)
    max_sigma = jnp.asarray(
        [cfg.max_sigma_x, cfg.max_sigma_y, cfg.max_sigma_z], dtype=sigma.dtype
    )
    ok = jnp.all(sigma < max_sigma)
    ok &= cond < cfg.max_r_cond
    ok &= n_in >= 3
    # inlier-ratio gate: reject scans with more outliers than allowed
    ok &= outlier_pct <= cfg.allowed_outlier_percentage

    # ---- zero-velocity branch overrides ----
    sigma_zero = jnp.asarray(
        [cfg.sigma_zero_velocity_x, cfg.sigma_zero_velocity_y,
         cfg.sigma_zero_velocity_z],
        dtype=sigma.dtype,
    )
    velocity = jnp.where(is_zero, jnp.zeros(3, dtype=v_fit.dtype), v_fit)
    sigma = jnp.where(is_zero, sigma_zero, sigma)
    # zero-velocity scans keep all low-Doppler gated points as inliers
    zero_inliers = gated & (jnp.abs(vr) < cfg.thresh_zero_velocity * 2.0)
    inlier_mask = jnp.where(is_zero, zero_inliers, inlier_mask)
    valid = jnp.where(is_zero, jnp.asarray(True), ok)

    return EgoVelocityEstimate(
        velocity=velocity,
        sigma=sigma,
        inlier_mask=inlier_mask.astype(scan.mask.dtype),
        valid=valid,
        zero_velocity=is_zero,
    )
