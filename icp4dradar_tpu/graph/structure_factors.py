"""Structure factors: line/plane correspondences mined from the voxel map's
Gaussians, feeding the pose-graph back-end.

The reference ships point-to-line and point-to-plane Ceres functors
(include/radarFactor.hpp:11-137) but no stage ever produces their
correspondences — the A-LOAM lineage they come from classifies features and
associates them against a map. Here the production stage is real and
TPU-shaped: the voxel-hash map already maintains a Gaussian per voxel
(mapping/voxel_hash.py stat_n/stat_sum/stat_sq); its eigenvalue spectrum
classifies each cell as a surfel (plane: lam0 << lam1), an edge
(line: lam1 << lam2), or a blob, and each keyframe point is matched to the
Gaussian of the voxel it lands in — one widened hash lookup per batch, no
kNN tree walk. Eigen-decompositions are the closed-form 3x3 forms
(geom/linalg.py), never LAPACK control flow.

Factor weights are inverse residual variances: the Gaussian's own spread
along the factor's measurement direction (lam0 for a plane's normal, lam1
across a line) plus a sensor noise floor.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from icp4dradar_tpu.config import StructureFactorConfig
from icp4dradar_tpu.geom.linalg import (
    sym3x3_eigvals,
    sym3x3_largest_eigvec,
    sym3x3_smallest_eigvec,
)
from icp4dradar_tpu.graph.gauss_newton import (
    LineFactors,
    PlaneFactors,
    PointFactors,
)
from icp4dradar_tpu.mapping.voxel_hash import (
    VoxelHashMap,
    _voxel_coords,
    voxel_map_lookup_slots,
)


def unpack_cov(packed: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) [xx,yy,zz,xy,xz,yz] -> (..., 3, 3) symmetric."""
    xx, yy, zz, xy, xz, yz = (packed[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def classify_gaussians(
    cov: jnp.ndarray,
    counts: jnp.ndarray,
    cfg: StructureFactorConfig = StructureFactorConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Eigen-classify (..., 3, 3) Gaussians into surfels / edges.

    Returns (is_plane, is_line, normal, direction, eigvals) where normal is
    the smallest eigenvector (surfel normal) and direction the largest
    (edge direction). Cells with fewer than min_voxel_points observations
    classify as neither (their spectrum is noise).
    """
    lam = sym3x3_eigvals(cov)                       # (..., 3) ascending
    lam = jnp.maximum(lam, 0.0)
    enough = counts >= cfg.min_voxel_points
    is_plane = enough & (lam[..., 0] < cfg.plane_ratio * lam[..., 1])
    is_line = enough & (~is_plane) & (lam[..., 1] < cfg.line_ratio * lam[..., 2])
    normal = sym3x3_smallest_eigvec(cov)
    direction = sym3x3_largest_eigvec(cov)
    return is_plane, is_line, normal, direction, lam


def build_structure_factors(
    kf_index: jnp.ndarray,
    p_body: jnp.ndarray,
    p_world: jnp.ndarray,
    mask: jnp.ndarray,
    vmap: VoxelHashMap,
    cfg: StructureFactorConfig = StructureFactorConfig(),
) -> Tuple[PlaneFactors, LineFactors, PointFactors]:
    """Match keyframe points against map Gaussians and emit typed factors.

    kf_index (P,): keyframe id per point; p_body (P,3): point in keyframe
    body frame; p_world (P,3): the same point under the current keyframe
    pose estimate (used only for voxel association); mask (P,).

    Every point yields exactly one row in EACH returned container, with
    class membership expressed through the masks (fixed shapes, no
    compaction): plane cells -> PlaneFactors (normal + offset form,
    radarFactor.hpp:105-137), edge cells -> LineFactors through mu +- h*dir
    (radarFactor.hpp:11-54), blob cells -> point-to-point against the
    Gaussian mean (radarFactor.hpp:140-171).
    """
    coords = _voxel_coords(p_world, vmap.voxel_size)
    slot, found = voxel_map_lookup_slots(vmap, coords)

    n = jnp.maximum(vmap.stat_n[slot], 1.0)
    mu = vmap.stat_sum[slot] / n[:, None]
    ex2 = vmap.stat_sq[slot] / n[:, None]
    packed = jnp.stack([
        ex2[:, 0] - mu[:, 0] * mu[:, 0],
        ex2[:, 1] - mu[:, 1] * mu[:, 1],
        ex2[:, 2] - mu[:, 2] * mu[:, 2],
        ex2[:, 3] - mu[:, 0] * mu[:, 1],
        ex2[:, 4] - mu[:, 0] * mu[:, 2],
        ex2[:, 5] - mu[:, 1] * mu[:, 2],
    ], axis=-1)
    cov = unpack_cov(packed)
    is_plane, is_line, normal, direction, lam = classify_gaussians(
        cov, vmap.stat_n[slot], cfg)

    d2 = jnp.sum((p_world - mu) ** 2, axis=-1)
    ok = (mask > 0.5) & found & (d2 < cfg.max_dist * cfg.max_dist)
    var0 = cfg.sigma0 * cfg.sigma0
    w_plane = cfg.weight_scale / (lam[..., 0] + var0)
    w_line = cfg.weight_scale / (lam[..., 1] + var0)
    w_point = cfg.weight_scale / (lam[..., 2] + var0)

    f32 = p_body.dtype
    planes = PlaneFactors.build(
        kf_index, p_body, normal,
        -jnp.sum(normal * mu, axis=-1),
        weight=w_plane,
        mask=(ok & is_plane).astype(f32))
    h = 0.5 * vmap.voxel_size
    lines = LineFactors.build(
        kf_index, p_body, mu - h * direction, mu + h * direction,
        weight=w_line,
        mask=(ok & is_line).astype(f32))
    points = PointFactors.build(
        kf_index, p_body, mu,
        weight=w_point,
        mask=(ok & ~is_plane & ~is_line).astype(f32))
    return planes, lines, points
