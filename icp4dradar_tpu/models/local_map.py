"""Local-map window ICP refinement (ref USE_LOCAL_MAP compile-time feature,
src/iterative_closest_point.cpp:637-684): consecutive 15-scan windows of
world-frame points are ICP-aligned (current window -> previous window) and
the correction transforms logged to icp_map.txt (:793-812).

Here it is a config-driven post-processing pass over pipeline outputs: all
window pairs are registered in one vmapped ICP batch instead of serially
every 15th frame.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from icp4dradar_tpu.config import IcpConfig
from icp4dradar_tpu.geom import se3_apply
from icp4dradar_tpu.registration.icp import icp_point_to_point


def build_windows(
    scans_xyz: np.ndarray,
    scans_mask: np.ndarray,
    poses: np.ndarray,
    window: int = 15,
    points_per_window: int = 4096,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Accumulate world-frame clouds per window of `window` frames.

    Returns (windows (W, points_per_window, 3), masks (W, points_per_window)).
    Oversized windows are uniformly subsampled to the fixed budget.
    """
    F = scans_xyz.shape[0]
    rng = np.random.default_rng(seed)
    out_pts, out_msk = [], []
    for start in range(0, F - window + 1, window):
        pts = []
        for k in range(start, start + window):
            m = scans_mask[k] > 0.5
            world = scans_xyz[k][m] @ poses[k][:3, :3].T + poses[k][:3, 3]
            pts.append(world)
        cloud = np.concatenate(pts, 0).astype(np.float32)
        if len(cloud) > points_per_window:
            sel = rng.choice(len(cloud), points_per_window, replace=False)
            cloud = cloud[sel]
        buf = np.zeros((points_per_window, 3), np.float32)
        msk = np.zeros(points_per_window, np.float32)
        buf[: len(cloud)] = cloud
        msk[: len(cloud)] = 1.0
        out_pts.append(buf)
        out_msk.append(msk)
    return np.stack(out_pts), np.stack(out_msk)


def local_map_refinement(
    scans_xyz: np.ndarray,
    scans_mask: np.ndarray,
    poses: np.ndarray,
    window: int = 15,
    points_per_window: int = 4096,
    cfg: IcpConfig = IcpConfig(),
) -> np.ndarray:
    """ICP of each window against its predecessor -> (W-1, 4, 4) corrections
    (the reference's icp2 transforms). Batched with vmap."""
    if scans_xyz.shape[0] < 2 * window:
        return np.zeros((0, 4, 4), np.float32)
    wins, masks = build_windows(scans_xyz, scans_mask, poses, window,
                                points_per_window)
    if len(wins) < 2:
        return np.zeros((0, 4, 4), np.float32)
    src = jnp.asarray(wins[1:])
    tgt = jnp.asarray(wins[:-1])
    src_m = jnp.asarray(masks[1:])
    tgt_m = jnp.asarray(masks[:-1])

    def one(s, t, sm, tm):
        return icp_point_to_point(s, t, sm, tm, cfg=cfg).transform

    T = jax.vmap(one)(src, tgt, src_m, tgt_m)
    return np.asarray(T)
