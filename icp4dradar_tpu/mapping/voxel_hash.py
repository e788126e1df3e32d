"""Voxel-hash incremental map: flat arrays + scatter arbitration, no pointers.

Replaces the reference's 1.8k-LoC pthread ikd-Tree
(third_party/ikd-Tree/ikd_Tree.{h,cpp}) with a functional, jit-compiled
open-addressing hash grid. Behavioral parity targets:

- on-insert voxel downsampling keeping the point nearest the voxel center
  (`Add_Points` downsample path, ikd_Tree.cpp:422-497; 0.5 m leaf,
  src/radar_odometry.cpp:348)
- point/box delete (`Delete_Points`/`Delete_by_range`, ikd_Tree.cpp:522-564)
  — O(C) masked clear instead of lazy tree deletion
- radius / box / sector search (ikd_Tree.cpp:1024-1140; sector = 80 m radius
  with +-60 deg heading window, :1114-1117, src/radar_odometry.cpp:392-396)
- nearest-neighbor lookup via a 27-voxel stencil gather
  (`Nearest_Search`, ikd_Tree.cpp:368-398)

The concurrency machinery (op-log, 6 mutexes, rebuild thread,
ikd_Tree.cpp:169-351) has no counterpart: map updates are pure functions of
(map, scan) -> map, so the entire class of races is unrepresentable
(SURVEY.md §5 race-detection call-out).

Insertion uses R rounds of scatter-min arbitration: every candidate point
carries its own probe offset; in each round candidates either compete for
their voxel's slot (nearest-to-center wins, including the incumbent), claim
an empty slot, or advance to the next probe slot on hash collision. All
rounds are fixed-shape vector ops — no data-dependent control flow.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from icp4dradar_tpu.ops.compaction import mask_compact

_P1, _P2, _P3 = 73856093, 19349669, 83492791  # classic spatial-hash primes
_EMPTY = jnp.int32(0x7FFFFFFF)


@struct.dataclass
class VoxelHashMap:
    """One point per voxel, open-addressed. All arrays length C (capacity).

    Besides the representative point (keep-nearest-center, ikd-Tree
    semantics), every voxel maintains an incremental Gaussian over ALL
    points ever routed to it (count / sum / packed second moment) — the
    VGICP-style distribution map that replaces per-frame kNN covariance
    estimation in scan-to-map registration (registration/vgicp.py).
    """

    keys: jnp.ndarray        # (C, 3) int32 voxel coords of occupant
    points: jnp.ndarray      # (C, 3) f32 stored point (nearest voxel center)
    intensity: jnp.ndarray   # (C,) f32
    occupied: jnp.ndarray    # (C,) f32 {0, 1}
    stat_n: jnp.ndarray      # (C,) f32 point count
    stat_sum: jnp.ndarray    # (C, 3) f32 sum of points
    stat_sq: jnp.ndarray     # (C, 6) f32 sum of [xx,yy,zz,xy,xz,yz]
    voxel_size: float = struct.field(pytree_node=False, default=0.5)
    max_probes: int = struct.field(pytree_node=False, default=8)

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    @property
    def num_voxels(self) -> jnp.ndarray:
        return jnp.sum(self.occupied)

    def voxel_means(self) -> jnp.ndarray:
        """(C,3) per-voxel mean (zeros where empty)."""
        n = jnp.maximum(self.stat_n, 1.0)[:, None]
        return self.stat_sum / n

    def voxel_covs_packed(self, min_count: float = 3.0,
                          fallback_var: float = 0.01) -> jnp.ndarray:
        """(C,6) packed covariance [xx,yy,zz,xy,xz,yz]; voxels with fewer
        than `min_count` points fall back to an isotropic blob."""
        n = jnp.maximum(self.stat_n, 1.0)[:, None]
        mu = self.stat_sum / n
        ex2 = self.stat_sq / n
        cov = jnp.stack([
            ex2[:, 0] - mu[:, 0] * mu[:, 0],
            ex2[:, 1] - mu[:, 1] * mu[:, 1],
            ex2[:, 2] - mu[:, 2] * mu[:, 2],
            ex2[:, 3] - mu[:, 0] * mu[:, 1],
            ex2[:, 4] - mu[:, 0] * mu[:, 2],
            ex2[:, 5] - mu[:, 1] * mu[:, 2],
        ], axis=-1)
        iso = jnp.asarray([fallback_var, fallback_var, fallback_var,
                           0.0, 0.0, 0.0], dtype=cov.dtype)
        thin = (self.stat_n < min_count)[:, None]
        return jnp.where(thin, iso[None, :], cov)


def voxel_map_create(
    capacity: int = 1 << 18, voxel_size: float = 0.5, max_probes: int = 8,
    dtype=jnp.float32,
) -> VoxelHashMap:
    if capacity & (capacity - 1):
        raise ValueError("capacity must be a power of two")
    return VoxelHashMap(
        keys=jnp.full((capacity, 3), _EMPTY, dtype=jnp.int32),
        points=jnp.zeros((capacity, 3), dtype=dtype),
        intensity=jnp.zeros((capacity,), dtype=dtype),
        occupied=jnp.zeros((capacity,), dtype=dtype),
        stat_n=jnp.zeros((capacity,), dtype=dtype),
        stat_sum=jnp.zeros((capacity, 3), dtype=dtype),
        stat_sq=jnp.zeros((capacity, 6), dtype=dtype),
        voxel_size=voxel_size,
        max_probes=max_probes,
    )


def _voxel_coords(xyz: jnp.ndarray, voxel_size: float) -> jnp.ndarray:
    return jnp.floor(xyz / voxel_size).astype(jnp.int32)


def _hash(coords: jnp.ndarray, capacity: int) -> jnp.ndarray:
    h = coords[..., 0] * _P1 ^ coords[..., 1] * _P2 ^ coords[..., 2] * _P3
    return h & (capacity - 1)


def _center_dist2(xyz: jnp.ndarray, coords: jnp.ndarray, voxel_size: float) -> jnp.ndarray:
    center = (coords.astype(xyz.dtype) + 0.5) * voxel_size
    return jnp.sum((xyz - center) ** 2, axis=-1)


def voxel_map_insert(
    vmap: VoxelHashMap,
    xyz: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    intensity: Optional[jnp.ndarray] = None,
) -> VoxelHashMap:
    """Insert a padded batch of points with keep-nearest-center downsampling.

    Semantics per voxel: after insertion the stored point is the one nearest
    the voxel center among {previous occupant} U {batch points in that voxel}
    (ikd_Tree.cpp:442-455). Points that cannot be placed within max_probes
    probes (table pressure) are dropped.
    """
    n = xyz.shape[0]
    if mask is None:
        mask = jnp.ones(n, dtype=xyz.dtype)
    if intensity is None:
        intensity = jnp.zeros(n, dtype=xyz.dtype)
    C = vmap.capacity
    L = vmap.voxel_size

    coords = _voxel_coords(xyz, L)
    h0 = _hash(coords, C)
    d2c = _center_dist2(xyz, coords, L)
    big = jnp.asarray(1e30, xyz.dtype)
    idx_n = jnp.arange(n, dtype=jnp.int32)

    # per-point raw second moments for the voxel Gaussian accumulators
    sq6 = jnp.stack([
        xyz[:, 0] * xyz[:, 0], xyz[:, 1] * xyz[:, 1], xyz[:, 2] * xyz[:, 2],
        xyz[:, 0] * xyz[:, 1], xyz[:, 0] * xyz[:, 2], xyz[:, 1] * xyz[:, 2],
    ], axis=-1)

    state = dict(
        keys=vmap.keys, points=vmap.points, inten=vmap.intensity,
        occ=vmap.occupied,
        sn=vmap.stat_n, ssum=vmap.stat_sum, ssq=vmap.stat_sq,
        alive=mask > 0.5,
        offset=jnp.zeros(n, dtype=jnp.int32),
    )

    def round_fn(state, _):
        keys, points, inten, occ = state["keys"], state["points"], state["inten"], state["occ"]
        sn, ssum, ssq = state["sn"], state["ssum"], state["ssq"]
        alive, offset = state["alive"], state["offset"]
        slot = (h0 + offset) & (C - 1)

        slot_keys = keys[slot]                       # (N,3)
        slot_used = slot_keys[..., 0] != _EMPTY      # occupied or tombstone
        slot_occ = occ[slot] > 0.5
        same = jnp.all(slot_keys == coords, axis=-1) & slot_used & alive
        empty = (~slot_used) & alive

        # --- same-voxel competition: nearest-to-center wins (incl. incumbent)
        # Tombstoned slots (deleted; keys kept so probe chains stay intact)
        # have no incumbent: candidates revive them.
        occ_d2c = _center_dist2(points, keys, L)     # (C,) incumbent distances
        inc_d2c = jnp.where(slot_occ, occ_d2c[slot], big)
        # scatter-min candidate distances per contested slot (+1 dump bin)
        dbuf = jnp.full((C + 1,), big, xyz.dtype)
        dbuf = dbuf.at[jnp.where(same, slot, C)].min(jnp.where(same, d2c, big))
        cand_is_min = same & (d2c <= dbuf[:C][slot])
        # tie-break equal-distance candidates by lowest index
        ibuf = jnp.full((C + 1,), jnp.int32(n))
        ibuf = ibuf.at[jnp.where(cand_is_min, slot, C)].min(
            jnp.where(cand_is_min, idx_n, n)
        )
        cand_win = cand_is_min & (ibuf[:C][slot] == idx_n) & (d2c < inc_d2c)
        # scatter winning candidate payloads (losers target the C dump row);
        # winning a tombstoned slot revives it
        w_slot = jnp.where(cand_win, slot, C)
        points = points.at[w_slot, :].set(xyz, mode="drop")
        inten = inten.at[w_slot].set(intensity, mode="drop")
        occ = occ.at[w_slot].set(1.0, mode="drop")

        # --- empty-slot claims: lowest candidate index wins the slot
        cbuf = jnp.full((C + 1,), jnp.int32(n))
        cbuf = cbuf.at[jnp.where(empty, slot, C)].min(jnp.where(empty, idx_n, n))
        claim_win = empty & (cbuf[:-1][slot] == idx_n)
        cw_slot = jnp.where(claim_win, slot, C)
        keys = keys.at[cw_slot, :].set(coords, mode="drop")
        points = points.at[cw_slot, :].set(xyz, mode="drop")
        inten = inten.at[cw_slot].set(intensity, mode="drop")
        occ = occ.at[cw_slot].set(1.0, mode="drop")

        # --- Gaussian accumulators: every candidate that RESOLVED to a slot
        # this round (matched its voxel, or claimed it) contributes its raw
        # moments, win or lose — the voxel distribution covers all routed
        # points, not just the kept representative.
        resolved = same | claim_win
        r_slot = jnp.where(resolved, slot, C)
        sn = sn.at[r_slot].add(1.0, mode="drop")
        ssum = ssum.at[r_slot, :].add(xyz, mode="drop")
        ssq = ssq.at[r_slot, :].add(sq6, mode="drop")

        # --- liveness update
        # same-voxel contenders are resolved (won or lost) -> dead
        # empty-claim winners -> dead
        # empty-claim losers: if winner has same coords, stay (compete next
        #   round via the 'same' path, offset unchanged); else advance probe.
        lost_claim = empty & ~claim_win
        winner_idx = jnp.clip(cbuf[:-1][slot], 0, n - 1)
        winner_same_coords = jnp.all(coords[winner_idx] == coords, axis=-1)
        advance = (alive & ~same & ~empty) | (lost_claim & ~winner_same_coords)
        stay = lost_claim & winner_same_coords
        alive = stay | advance
        offset = offset + advance.astype(jnp.int32)

        return dict(keys=keys, points=points, inten=inten, occ=occ,
                    sn=sn, ssum=ssum, ssq=ssq,
                    alive=alive, offset=offset), None

    # early exit: most batches resolve in 1-2 rounds (low load factor);
    # each round touches C-sized arrays, so skipping dead rounds is ~4x
    def cond_fn(carry):
        state, rnd = carry
        return (rnd < vmap.max_probes) & jnp.any(state["alive"])

    def body_fn(carry):
        state, rnd = carry
        state, _ = round_fn(state, None)
        return (state, rnd + 1)

    state, _ = jax.lax.while_loop(cond_fn, body_fn, (state, jnp.int32(0)))
    return vmap.replace(
        keys=state["keys"], points=state["points"],
        intensity=state["inten"], occupied=state["occ"],
        stat_n=state["sn"], stat_sum=state["ssum"], stat_sq=state["ssq"],
    )


# ----------------------------------------------------------------------
# Queries
# ----------------------------------------------------------------------
def voxel_map_radius_search(
    vmap: VoxelHashMap,
    center: jnp.ndarray,
    radius: float,
    out_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """All map points within `radius` of `center` (3,), compacted to
    (out_size, 3) + mask + count. O(C) masked scan — trivially vectorized
    (ikd-Tree `Radius_Search`, ikd_Tree.cpp:408-414)."""
    d2 = jnp.sum((vmap.points - center) ** 2, axis=-1)
    sel = (vmap.occupied > 0.5) & (d2 < radius * radius)
    return mask_compact(vmap.points, sel.astype(vmap.points.dtype), out_size)


def voxel_map_box_search(
    vmap: VoxelHashMap,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    out_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Axis-aligned box query (ikd-Tree `Box_Search`, ikd_Tree.cpp:401-406)."""
    inside = jnp.all((vmap.points >= lo) & (vmap.points <= hi), axis=-1)
    sel = (vmap.occupied > 0.5) & inside
    return mask_compact(vmap.points, sel.astype(vmap.points.dtype), out_size)


def voxel_map_sector_search(
    vmap: VoxelHashMap,
    center: jnp.ndarray,
    radius: float,
    heading_deg: jnp.ndarray,
    half_angle_deg: float,
    out_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Heading sector query: points within `radius` whose bearing from
    `center` is within +-half_angle of `heading_deg` (wrap-aware).

    Reference: `Sector_Search` visits every node filtering by
    calc_heading (ikd_Tree.cpp:1114-1117, 1434-1448); called with
    RADAR_RADIUS=80, +-60 deg (src/radar_odometry.cpp:392-396).
    """
    delta = vmap.points - center
    d2 = jnp.sum(delta * delta, axis=-1)
    bearing = jnp.arctan2(delta[..., 1], delta[..., 0]) * 180.0 / jnp.pi
    diff = jnp.abs((bearing - heading_deg + 180.0) % 360.0 - 180.0)
    sel = (vmap.occupied > 0.5) & (d2 < radius * radius) & (diff < half_angle_deg)
    return mask_compact(vmap.points, sel.astype(vmap.points.dtype), out_size)


def voxel_map_sector_search_with_stats(
    vmap: VoxelHashMap,
    center: jnp.ndarray,
    radius: float,
    heading_deg: jnp.ndarray,
    half_angle_deg: float,
    out_size: int,
    min_count: float = 3.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sector query that also emits each voxel's Gaussian: returns
    (points (P,3), mask (P,), count (), means (P,3), covs_packed (P,6)).

    The distribution payload is what scan-to-map VGICP registers against —
    no per-frame kNN covariance estimation (registration/vgicp.py)."""
    delta = vmap.points - center
    d2 = jnp.sum(delta * delta, axis=-1)
    bearing = jnp.arctan2(delta[..., 1], delta[..., 0]) * 180.0 / jnp.pi
    diff = jnp.abs((bearing - heading_deg + 180.0) % 360.0 - 180.0)
    sel = (vmap.occupied > 0.5) & (d2 < radius * radius) & (diff < half_angle_deg)
    payload = jnp.concatenate(
        [vmap.points, vmap.voxel_means(), vmap.voxel_covs_packed(min_count)],
        axis=-1,
    )  # (C, 12)
    out, mask, count = mask_compact(payload, sel.astype(vmap.points.dtype), out_size)
    return out[:, :3], mask, count, out[:, 3:6], out[:, 6:12]


def voxel_map_delete_box(
    vmap: VoxelHashMap, lo: jnp.ndarray, hi: jnp.ndarray
) -> VoxelHashMap:
    """Clear all voxels whose stored point lies in [lo, hi] (ikd-Tree
    `Delete_by_range`, ikd_Tree.cpp:656-718 — immediate, not lazy)."""
    inside = jnp.all((vmap.points >= lo) & (vmap.points <= hi), axis=-1)
    kill = (vmap.occupied > 0.5) & inside
    # Tombstone: clear occupancy but KEEP keys so open-addressing probe
    # chains through this slot remain intact; insertion revives on key match.
    # Gaussian accumulators reset so a revived voxel starts fresh.
    return vmap.replace(
        occupied=jnp.where(kill, 0.0, vmap.occupied),
        stat_n=jnp.where(kill, 0.0, vmap.stat_n),
        stat_sum=jnp.where(kill[:, None], 0.0, vmap.stat_sum),
        stat_sq=jnp.where(kill[:, None], 0.0, vmap.stat_sq),
    )


def voxel_map_stencil_neighbors(
    vmap: VoxelHashMap,
    queries: jnp.ndarray,
    stencil_radius: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Candidate map points around each query from the (2s+1)^3 voxel
    stencil: the gather-based replacement for per-point kd-tree descent
    (`Nearest_Search`, ikd_Tree.cpp:368-398; stencil reach 2s*L covers the
    reference MAX_SEARCH_RADIUS=2.0 at L=0.5, src/radar_odometry.cpp:35).

    queries: (N,3) -> (points (N, K, 3), valid (N, K)) with K=(2s+1)^3.
    Each voxel contributes its single stored point.
    """
    C = vmap.capacity
    L = vmap.voxel_size
    base = _voxel_coords(queries, L)                     # (N,3)
    s = stencil_radius
    r = jnp.arange(-s, s + 1, dtype=jnp.int32)
    offsets = jnp.stack(jnp.meshgrid(r, r, r, indexing="ij"), axis=-1).reshape(-1, 3)
    K = offsets.shape[0]

    coords = base[:, None, :] + offsets[None, :, :]       # (N,K,3)
    h = _hash(coords, C)
    found_pts = jnp.zeros(queries.shape[:1] + (K, 3), dtype=queries.dtype)
    found = jnp.zeros(queries.shape[:1] + (K,), dtype=bool)

    def probe(carry, j):
        found_pts, found = carry
        slot = (h + j) & (C - 1)
        sk = vmap.keys[slot]                              # (N,K,3)
        so = vmap.occupied[slot] > 0.5
        hit = jnp.all(sk == coords, axis=-1) & so & (~found)
        pts = vmap.points[slot]
        found_pts = jnp.where(hit[..., None], pts, found_pts)
        found = found | hit
        # stop probing a chain at the first empty slot: the voxel cannot be
        # further along (insertion never skips an empty slot)
        return (found_pts, found), None

    (found_pts, found), _ = jax.lax.scan(
        probe, (found_pts, found),
        jnp.arange(vmap.max_probes, dtype=jnp.int32),
    )
    return found_pts, found


def voxel_map_knn(
    vmap: VoxelHashMap,
    queries: jnp.ndarray,
    k: int,
    stencil_radius: int = 1,
    max_dist: float = jnp.inf,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest map points per query from the voxel stencil (the ikd-Tree
    `Nearest_Search` k-NN + max_dist gate, ikd_Tree.cpp:368-398).

    queries: (N,3) -> (dists2 (N,k), points (N,k,3)); slots beyond the
    available neighbors carry +inf distance. Reach is bounded by the stencil:
    (stencil_radius + 0.5) * voxel_size around the query's voxel.
    """
    cand, valid = voxel_map_stencil_neighbors(vmap, queries, stencil_radius)
    d2 = jnp.sum((cand - queries[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(valid & (d2 < max_dist * max_dist), d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, k)
    pts = jnp.take_along_axis(cand, idx[..., None], axis=1)
    return -neg, pts
