"""VGICP: scan-to-map registration against the voxel distribution map.

The flagship scan-to-map registration path (replaces gicp.py's kNN-based
pipeline for map tracking): per-voxel Gaussians come from the map's
incremental statistics, scan covariances from the radar measurement model,
and each Gauss-Newton iteration is one fused Pallas kernel
(ops/vgicp_fused.py). Behavioral lineage: FastGICP distribution-to-
distribution cost (src/radar_odometry.cpp:399-411) with the covariance
estimation moved from query time to map-build time.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from icp4dradar_tpu.config import GicpConfig
from icp4dradar_tpu.geom import se3_exp, se3_identity
from icp4dradar_tpu.geom.linalg import solve_spd6
from icp4dradar_tpu.ops.vgicp_fused import (
    radar_point_covariances_packed,
    vgicp_iteration,
    vgicp_iteration_batch,
    vgicp_iteration_frozen,
    vgicp_iteration_xla,
)
from icp4dradar_tpu.registration.gicp import GicpResult


def vgicp_align(
    src_xyz: jnp.ndarray,
    tgt_mean: jnp.ndarray,
    tgt_cov6: jnp.ndarray,
    src_mask: Optional[jnp.ndarray] = None,
    tgt_mask: Optional[jnp.ndarray] = None,
    src_cov6: Optional[jnp.ndarray] = None,
    init_transform: Optional[jnp.ndarray] = None,
    cfg: GicpConfig = GicpConfig(),
    tgt_count: Optional[jnp.ndarray] = None,
    gate_axis: Optional[jnp.ndarray] = None,
) -> GicpResult:
    """Align a scan onto voxel distributions (means + packed covariances).

    src_xyz is in the SENSOR frame; init_transform is the pose prediction
    (the optimization refines it; identity-seeded calls behave like the
    reference's correction-transform usage). `tgt_count` (optional): live
    target row count when valid rows are front-packed (compaction output) —
    lets the fused kernel skip dead tiles. `gate_axis` (2,): band-gating
    direction — pass it when BOTH the scan and the submap rows are sorted by
    their projection onto this axis so the kernel can skip (source block,
    target tile) pairs farther apart than the correspondence gate (see
    ops/vgicp_fused.py)."""
    if src_mask is None:
        src_mask = jnp.ones(src_xyz.shape[0], dtype=src_xyz.dtype)
    if tgt_mask is None:
        tgt_mask = jnp.ones(tgt_mean.shape[0], dtype=src_xyz.dtype)
    if src_cov6 is None:
        src_cov6 = radar_point_covariances_packed(src_xyz)
    T0 = se3_identity(src_xyz.dtype) if init_transform is None else init_transform

    # Optimize in a cloud-centered frame: at kilometer-scale world
    # coordinates the kernel's |t|^2 - 2 t.p + |p|^2 distance expansion
    # cancels in f32 and the GN hat(p) coupling blocks condition poorly;
    # shifting by the predicted position keeps everything at sensor range.
    center = T0[:3, 3]
    T0 = T0.at[:3, 3].set(jnp.zeros_like(center))
    tgt_mean = tgt_mean - center[None, :]

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        it_fn = lambda T: vgicp_iteration(
            T, src_xyz, src_mask, src_cov6, tgt_mean, tgt_cov6, tgt_mask,
            max_correspondence_dist=cfg.max_correspondence_dist,
            cov_eps=cfg.cov_epsilon,
            tgt_count=tgt_count,
            return_best=True,
            gate_axis=gate_axis,
        )
        frozen_fn = lambda T, best: vgicp_iteration_frozen(
            T, src_xyz, src_mask, src_cov6, best,
            max_correspondence_dist=cfg.max_correspondence_dist,
            cov_eps=cfg.cov_epsilon,
        )
        inner = cfg.inner_gn_steps
    else:
        it_fn = lambda T: vgicp_iteration_xla(
            T, src_xyz, src_mask, src_cov6, tgt_mean, tgt_cov6, tgt_mask,
            max_correspondence_dist=cfg.max_correspondence_dist,
            cov_eps=cfg.cov_epsilon,
        ) + (None,)
        frozen_fn = None
        inner = 0

    def gn_update(T, H, g):
        H = H + cfg.lm_lambda * jnp.eye(6, dtype=T.dtype)
        # guard: with no valid correspondences H ~ lambda*I and g = 0
        xi = solve_spd6(H, -g)
        xi = jnp.where(jnp.isfinite(xi), xi, 0.0)
        return se3_exp(xi) @ T, jnp.sum(jnp.abs(xi))

    eps = cfg.vgicp_transformation_epsilon

    def cond(state):
        T, it, delta, _, _ = state
        return (it < cfg.max_iterations) & (delta > eps)

    def body(state):
        T, it, _, _, _ = state
        H, g, cost, wsum, d2sum, best = it_fn(T)
        T, delta = gn_update(T, H, g)
        it = it + 1
        # sweep-free inner steps on the frozen correspondences
        for _ in range(inner):
            H, g, cost, wsum, d2sum = frozen_fn(T, best)
            T, dlt = gn_update(T, H, g)
            delta = delta + dlt
            it = it + 1
        # fitness from the LAST evaluation point: at convergence (|xi| < eps)
        # it matches a final re-evaluation to first order, so we skip the
        # extra kernel pass the reference's getFitnessScore would cost
        return (T, it, delta, wsum, d2sum)

    zero = jnp.zeros((), src_xyz.dtype)
    init = (T0, jnp.int32(0), jnp.asarray(jnp.inf, src_xyz.dtype), zero, zero)
    T, iters, delta, wsum, d2sum = jax.lax.while_loop(cond, body, init)

    fitness = d2sum / jnp.maximum(wsum, 1.0)
    converged = (delta <= eps) | (iters >= cfg.max_iterations)
    T = T.at[:3, 3].add(center)            # back to the world frame
    return GicpResult(transform=T, converged=converged, fitness=fitness,
                      iterations=iters)


def vgicp_align_block(
    src_xyz: jnp.ndarray,
    tgt_mean: jnp.ndarray,
    tgt_cov6: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    src_cov6: jnp.ndarray,
    init_transforms: jnp.ndarray,
    cfg: GicpConfig = GicpConfig(),
    tgt_count: Optional[jnp.ndarray] = None,
    gate_axis: Optional[jnp.ndarray] = None,
) -> GicpResult:
    """Frame-parallel VGICP: register B frames against ONE frozen submap
    jointly — every GN iteration is a SINGLE fused kernel sweep with
    per-source-block transforms (ops/vgicp_fused.py::vgicp_iteration_batch)
    plus one batched 6x6 solve, so the per-iteration orchestration overhead
    amortizes over the whole block instead of repeating per frame.

    Each frame's registration is mathematically independent (absolute
    correction against the shared map — predictions chain through priors,
    corrections do NOT feed forward within the block); convergence is
    per-frame masked, the sweep runs until every frame's step is below
    epsilon or the iteration cap. Replaces B sequential vgicp_align calls
    in the blocked tracker (the measured ~0.08 ms/GN-iteration while_loop
    overhead was the largest single item in the r4 frame budget).

    src_xyz (B,N,3), src_mask (B,N), src_cov6 (B,N,6),
    init_transforms (B,4,4) -> (GicpResult with leading (B,) axis,
    matched_weight (B,) — the gated correspondence weight sum). A frame
    whose prediction drifted past the correspondence gate matches NOTHING
    and reports fitness 0 (0 / max(wsum, 1)) — indistinguishable from
    perfect health — so callers MUST gate on matched_weight, not fitness
    alone (the r5 sparse-regime walk-off entered through exactly this
    blind spot)."""
    B = src_xyz.shape[0]
    T0 = init_transforms
    # one shared centering for the block: all frames sit within a few
    # meters of the block-start prediction, which keeps the kernel's
    # distance math and the hat(p) GN coupling at sensor range
    center = T0[0, :3, 3]
    T0 = T0.at[:, :3, 3].add(-center)
    tgt_mean = tgt_mean - center[None, :]

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        it_fn = lambda T: vgicp_iteration_batch(
            T, src_xyz, src_mask, src_cov6, tgt_mean, tgt_cov6, tgt_mask,
            max_correspondence_dist=cfg.max_correspondence_dist,
            cov_eps=cfg.cov_epsilon,
            tgt_count=tgt_count,
            return_best=True,
            gate_axis=gate_axis,
        )
    else:
        def it_fn(T):
            H, g, cost, wsum, d2sum = jax.vmap(
                lambda Tb, sb, mb, cb: vgicp_iteration_xla(
                    Tb, sb, mb, cb, tgt_mean, tgt_cov6, tgt_mask,
                    max_correspondence_dist=cfg.max_correspondence_dist,
                    cov_eps=cfg.cov_epsilon,
                ))(T, src_xyz, src_mask, src_cov6)
            return H, g, cost, wsum, d2sum, None

    def gn_update(T, H, g, active):
        H = H + cfg.lm_lambda * jnp.eye(6, dtype=T.dtype)[None]
        xi = jax.vmap(solve_spd6)(H, -g)
        xi = jnp.where(jnp.isfinite(xi), xi, 0.0)
        xi = jnp.where(active[:, None], xi, 0.0)     # converged frames hold
        T = jax.vmap(lambda x, t: se3_exp(x) @ t)(xi, T)
        return T, jnp.sum(jnp.abs(xi), axis=-1)

    eps = cfg.vgicp_transformation_epsilon

    def cond(state):
        T, it, delta, iters, _, _ = state
        return (it < cfg.max_iterations) & jnp.any(delta > eps)

    def body(state):
        T, it, delta, iters, _, _ = state
        active = delta > eps
        H, g, cost, wsum, d2sum, best = it_fn(T)
        T, dlt = gn_update(T, H, g, active)
        delta = jnp.where(active, dlt, jnp.zeros_like(dlt))
        iters = iters + active.astype(iters.dtype)
        return (T, it + 1, delta, iters, wsum, d2sum)

    dt = src_xyz.dtype
    init = (T0, jnp.int32(0), jnp.full((B,), jnp.inf, dt),
            jnp.zeros((B,), jnp.int32), jnp.zeros((B,), dt),
            jnp.zeros((B,), dt))
    T, it, delta, iters, wsum, d2sum = jax.lax.while_loop(cond, body, init)

    fitness = d2sum / jnp.maximum(wsum, 1.0)
    converged = (delta <= eps) | (it >= cfg.max_iterations)
    T = T.at[:, :3, 3].add(center)
    return GicpResult(transform=T, converged=converged, fitness=fitness,
                      iterations=iters), wsum
