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

Insertion first dedupes the batch per voxel with ONE lexicographic sort
(voxel id, center distance): the per-voxel winner becomes the sole
candidate and the batch's Gaussian moments are segment-summed at the
winner row. Probe rounds then operate on batch-sized gathers/scatters
only — each round a candidate either competes with its voxel's incumbent
(nearest-to-center wins), claims an empty slot (scatter-min arbitrated
against other voxels hashing there), or advances its probe offset. An
early-exit while_loop skips rounds once every candidate has resolved;
typical batches finish in 1-2 rounds.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from icp4dradar_tpu.ops.compaction import mask_compact

_P1, _P2, _P3 = 73856093, 19349669, 83492791  # classic spatial-hash primes
import numpy as _np
_EMPTY = _np.int32(0x7FFFFFFF)  # numpy, not jnp: no backend init at import


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
    leader_budget: Optional[int] = None,
) -> VoxelHashMap:
    """Insert a padded batch of points with keep-nearest-center downsampling.

    Semantics per voxel: after insertion the stored point is the one nearest
    the voxel center among {previous occupant} U {batch points in that voxel}
    (ikd_Tree.cpp:442-455). Points that cannot be placed within max_probes
    probes (table pressure) are dropped.

    `leader_budget` (static): cap on distinct voxels per batch. TPU scatter/
    gather time scales LINEARLY with update rows (measured r5: insert 1.7 ms
    at 2048 rows -> 9.4 ms at 16384), and after the dedupe sort only the
    per-voxel leaders carry work — compacting them to a fixed budget makes
    every probe-round and deposit op pay O(budget) instead of O(N). Batches
    whose unique-voxel count exceeds the budget drop the overflow leaders
    (hash-order — an unbiased subset; the same pressure policy as
    max_probes, and overlapping later batches re-insert them). Intended for
    the blocked runners' multi-frame batches where consecutive scans revisit
    mostly the same voxels; None keeps every leader."""
    n = xyz.shape[0]
    if mask is None:
        mask = jnp.ones(n, dtype=xyz.dtype)
    if intensity is None:
        intensity = jnp.zeros(n, dtype=xyz.dtype)
    C = vmap.capacity
    L = vmap.voxel_size
    ft = xyz.dtype
    big = jnp.asarray(1e30, ft)
    iota = jnp.arange(n, dtype=jnp.int32)

    valid = mask > 0.5
    xyz = jnp.where(valid[:, None], xyz, 0.0)      # padded rows may be junk
    intensity = jnp.where(valid, intensity, 0.0)
    coords = _voxel_coords(xyz, L)
    h0 = _hash(coords, C)
    d2c = _center_dist2(xyz, coords, L)

    # ---- phase 1: ONE lexicographic sort dedupes the batch per voxel.
    # Sort by (hash, voxel coords, center distance); invalid rows carry the
    # out-of-range hash C so they form their own runs at the end. lax.sort is
    # stable, so equal-distance candidates keep lowest-original-index order
    # (the reference's tie-break).
    h_key = jnp.where(valid, h0, jnp.int32(C))
    c_key = jnp.where(valid[:, None], coords, _EMPTY)
    d_key = jnp.where(valid, d2c, big)
    h_s, c0_s, c1_s, c2_s, d_s, perm = jax.lax.sort(
        (h_key, c_key[:, 0], c_key[:, 1], c_key[:, 2], d_key, iota),
        num_keys=5,
    )
    c_s = jnp.stack([c0_s, c1_s, c2_s], axis=-1)
    payload = jnp.concatenate(
        [xyz, intensity[:, None], valid.astype(ft)[:, None],
         jnp.stack([
             xyz[:, 0] * xyz[:, 0], xyz[:, 1] * xyz[:, 1],
             xyz[:, 2] * xyz[:, 2], xyz[:, 0] * xyz[:, 1],
             xyz[:, 0] * xyz[:, 2], xyz[:, 1] * xyz[:, 2],
         ], axis=-1)],
        axis=-1,
    )[perm]                                         # (N, 11)
    xyz_s, int_s = payload[:, :3], payload[:, 3]

    # run leaders: first row of each (hash, coords) run = the per-voxel
    # winner (min center distance, then lowest original index)
    prev_differs = (h_s[1:] != h_s[:-1]) | jnp.any(c_s[1:] != c_s[:-1], axis=-1)
    leader = jnp.concatenate([jnp.ones((1,), bool), prev_differs])

    # segment-sum the Gaussian moments [count, sum3, sq6] onto leader rows
    # with a REVERSE segmented scan: each row accumulates rightward until the
    # next run boundary, so the run total lands on the leader. (A global
    # cumsum + difference catastrophically cancels in f32 — world-scale
    # second moments summed over the whole batch reach ~1e7 while per-voxel
    # values are ~1e2; segmented partial sums never mix runs.)
    moments = jnp.concatenate(
        [payload[:, 4:5], payload[:, :3], payload[:, 5:]], axis=-1)  # (N, 10)

    def seg_combine(a, b):
        # inclusive segmented sum; flags mark segment starts in scan order
        va, fa = a
        vb, fb = b
        return va * (1.0 - fb) + vb, jnp.maximum(fa, fb)

    # in right-to-left scan order a segment STARTS at its run's last row
    is_end = jnp.concatenate([leader[1:], jnp.ones((1,), bool)])
    flags = is_end.astype(ft)[:, None]
    seg, _ = jax.lax.associative_scan(
        seg_combine, (moments, flags), reverse=True)  # meaningful at leaders

    alive0 = leader & (h_s < C)

    # ---- optional leader compaction: shrink every downstream scatter/
    # gather from N rows to `leader_budget` rows (two compaction scatters —
    # one float payload, one int — keep coordinates bit-exact at any world
    # scale). seg is only meaningful at leader rows, which is exactly what
    # survives.
    if leader_budget is not None and leader_budget < n:
        Lb = int(leader_budget)
        fpay = jnp.concatenate(
            [xyz_s, int_s[:, None], d_s[:, None], seg], axis=-1)  # (N, 15)
        fcomp, cmask, _ = mask_compact(fpay, alive0.astype(ft), Lb)
        ipay = jnp.concatenate([c_s, h_s[:, None]], axis=-1)      # (N, 4)
        icomp, _, _ = mask_compact(ipay, alive0.astype(jnp.int32), Lb)
        xyz_s, int_s = fcomp[:, :3], fcomp[:, 3]
        d_s = fcomp[:, 4]
        seg = fcomp[:, 5:]
        c_s, h_s = icomp[:, :3], icomp[:, 3]
        alive0 = cmask > 0.5
        n = Lb
        iota = jnp.arange(n, dtype=jnp.int32)

    # ---- phase 2: probe rounds resolve each leader to its final SLOT only
    # (match its voxel's slot or claim an empty one). Key insights: (a)
    # dedupe guarantees one leader per voxel, so a slot written this batch is
    # never re-read this batch — incumbent competition, representative writes
    # and stats deposits all defer to one post-loop step; only the key table
    # stays live across rounds (claims steer later probes). (b) every
    # gather/scatter has a high FIXED cost on TPU, so each round examines a
    # WINDOW of W consecutive probe slots in ONE gather — one round resolves
    # nearly all candidates. Claims happen only at a candidate's FIRST empty
    # slot (the open-addressing no-hole invariant later lookups rely on);
    # losers re-probe from that slot after the winner fills it.
    # W=4 is MEASURED optimal (r5 bisect on v5e, 2048 pts -> 2^18 slots):
    # widening to the full probe budget (W=8, one static round) read 1.19 ms
    # vs 1.15, and folding the two post-loop deposits into one (C,15)
    # read-modify-write scatter read 2.95 ms — the 15-lane row layout pads
    # to 128 lanes and the wide gather+set traffic dwarfs the saved
    # dispatches. The op-count model undercounts what XLA already elides in
    # the second static round; this chain is at its wall.
    W = min(4, vmap.max_probes)
    w_iota = jnp.arange(W, dtype=jnp.int32)
    mp = jnp.int32(vmap.max_probes)

    def round_fn(keysT, r_slot, same, offset, alive, _rnd):
        base = h_s + offset
        slots = (base[:, None] + w_iota[None, :]) & (C - 1)   # (N, W)
        slots_q = jnp.where(alive[:, None], slots, C)
        gk = keysT.at[slots_q].get(mode="fill", fill_value=0x7FFFFFFF)
        valid_w = (offset[:, None] + w_iota[None, :]) < mp    # probe cap
        used = gk[..., 0] != _EMPTY
        match = jnp.all(gk == c_s[:, None, :], axis=-1) & used & valid_w
        empty = (~used) & valid_w
        matchpos = jnp.min(jnp.where(match, w_iota[None, :], W), axis=1)
        emptypos = jnp.min(jnp.where(empty, w_iota[None, :], W), axis=1)

        # a match anywhere in the window wins (an empty can never precede a
        # voxel's slot in its chain — tombstones keep keys — so preferring
        # the match is both equivalent and duplicate-proof)
        same_r = alive & (matchpos < W)
        wants_claim = alive & ~same_r & (emptypos < W)
        e_slot = (base + emptypos) & (C - 1)
        # racing claims for one slot arbitrate by scatter-min on sorted row
        cbuf = jnp.full((C + 1,), jnp.int32(n))
        cbuf = cbuf.at[jnp.where(wants_claim, e_slot, C)].min(
            jnp.where(wants_claim, iota, n))
        claim_win = wants_claim & (
            cbuf.at[jnp.where(wants_claim, e_slot, C)].get(
                mode="fill", fill_value=int(n)) == iota)
        keysT = keysT.at[jnp.where(claim_win, e_slot, C), :].set(
            c_s, mode="drop")

        slot_res = jnp.where(same_r, (base + matchpos) & (C - 1), e_slot)
        resolved = same_r | claim_win
        r_slot = jnp.where(resolved, slot_res, r_slot)
        same = same | same_r
        # claim losers re-probe from the contested slot; others skip the
        # whole window
        offset = offset + jnp.where(wants_claim & ~claim_win, emptypos, W)
        alive = alive & ~resolved & (offset < mp)
        return keysT, r_slot, same, offset, alive

    keysT, r_slot, same, offset, alive = round_fn(
        vmap.keys, jnp.full((n,), C, jnp.int32),
        jnp.zeros((n,), bool), jnp.zeros((n,), jnp.int32), alive0, 0)

    def cond_fn(carry):
        _, _, _, _, alive, rnd = carry
        # backstop only — claim losers make progress every round because the
        # winner filled the contested slot
        return (rnd < 2 * vmap.max_probes) & jnp.any(alive)

    def body_fn(carry):
        keysT, r_slot, same, offset, alive, rnd = carry
        keysT, r_slot, same, offset, alive = round_fn(
            keysT, r_slot, same, offset, alive, rnd)
        return (keysT, r_slot, same, offset, alive, rnd + 1)

    keysT, r_slot, same, _, _, _ = jax.lax.while_loop(
        cond_fn, body_fn, (keysT, r_slot, same, offset, alive, jnp.int32(1)),
    )

    # ---- phase 3: one post-loop pass settles payloads.
    # Same-voxel competition: nearest-to-center wins vs the incumbent
    # (tombstones — keys kept on delete so probe chains stay intact — have
    # no incumbent and are revived by any candidate; claims always win).
    repT = jnp.concatenate(
        [vmap.points, vmap.intensity[:, None], vmap.occupied[:, None]],
        axis=-1,
    )
    grep = repT.at[jnp.where(r_slot < C, r_slot, C)].get(
        mode="fill", fill_value=0.0)
    incumbent = (grep[:, 4] > 0.5) & same
    inc_d2c = jnp.where(incumbent, _center_dist2(grep[:, :3], c_s, L), big)
    win = (d_s < inc_d2c) & (r_slot < C)
    rep_new = jnp.concatenate(
        [xyz_s, int_s[:, None], jnp.ones((n, 1), ft)], axis=-1)
    repT = repT.at[jnp.where(win, r_slot, C), :].set(rep_new, mode="drop")

    # Gaussian accumulators: every resolved leader deposits its run's summed
    # moments, win or lose — the distribution covers all routed points, not
    # just the kept representative.
    statsT = jnp.concatenate(
        [vmap.stat_n[:, None], vmap.stat_sum, vmap.stat_sq], axis=-1)
    statsT = statsT.at[r_slot, :].add(seg, mode="drop")

    return vmap.replace(
        keys=keysT, points=repT[:, :3],
        intensity=repT[:, 3], occupied=repT[:, 4],
        stat_n=statsT[:, 0], stat_sum=statsT[:, 1:4], stat_sq=statsT[:, 4:],
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
    fallback_var: float = 0.01,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sector query that also emits each voxel's Gaussian: returns
    (points (P,3), mask (P,), count (), means (P,3), covs_packed (P,6)).

    The distribution payload is what scan-to-map VGICP registers against —
    no per-frame kNN covariance estimation (registration/vgicp.py).

    The RAW accumulators [n, sum3, sq6] are compacted and the mean/cov math
    runs on the (out_size, ...) result — 16x fewer elementwise ops than
    evaluating them over every table slot."""
    delta = vmap.points - center
    d2 = jnp.sum(delta * delta, axis=-1)
    bearing = jnp.arctan2(delta[..., 1], delta[..., 0]) * 180.0 / jnp.pi
    diff = jnp.abs((bearing - heading_deg + 180.0) % 360.0 - 180.0)
    sel = (vmap.occupied > 0.5) & (d2 < radius * radius) & (diff < half_angle_deg)
    payload = jnp.concatenate(
        [vmap.points, vmap.stat_n[:, None], vmap.stat_sum, vmap.stat_sq],
        axis=-1,
    )  # (C, 13)
    out, mask, count = mask_compact(payload, sel.astype(vmap.points.dtype), out_size)
    n = jnp.maximum(out[:, 3:4], 1.0)
    mu = out[:, 4:7] / n
    ex2 = out[:, 7:13] / n
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
    thin = out[:, 3:4] < min_count
    cov = jnp.where(thin, iso[None, :], cov)
    return out[:, :3], mask, count, mu, cov


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


def voxel_map_forget_far(
    vmap: VoxelHashMap, center: jnp.ndarray, radius: float
) -> VoxelHashMap:
    """Tombstone every voxel farther than `radius` from `center` — the
    long-run memory-maintenance policy (localization only ever queries the
    80 m sector around the vehicle, so distant map falls out of use; the
    reference's analog is ikd-Tree `Delete_by_range` box deletes,
    ikd_Tree.cpp:656-718, which FAST-LIO-style pipelines drive the same
    way). O(C) masked clear; keys stay (probe chains intact), freed slots
    revive on key match like every tombstone."""
    d2 = jnp.sum((vmap.points - center) ** 2, axis=-1)
    kill = (vmap.occupied > 0.5) & (d2 > radius * radius)
    return vmap.replace(
        occupied=jnp.where(kill, 0.0, vmap.occupied),
        stat_n=jnp.where(kill, 0.0, vmap.stat_n),
        stat_sum=jnp.where(kill[:, None], 0.0, vmap.stat_sum),
        stat_sq=jnp.where(kill[:, None], 0.0, vmap.stat_sq),
    )


def voxel_map_rehash(vmap: VoxelHashMap) -> VoxelHashMap:
    """Rebuild the table from live voxels only, releasing every tombstone.

    Tombstones keep their keys so probe chains stay intact, which means a
    slot once used is never reclaimable by a DIFFERENT voxel — after heavy
    forgetting (voxel_map_forget_far) the table fills with dead keys and
    new-territory inserts start dropping. Rehashing moves the live entries
    (unique keys — no dedupe or incumbent competition needed) into a fresh
    table: one claim-arbitration scatter per probe round, then one payload
    scatter. The analog of ikd-Tree's re-balance rebuild (ikd_Tree.cpp:
    633-653), as a pure function. Live entries whose fresh chain exceeds
    max_probes are dropped (same pressure policy as insertion)."""
    C = vmap.capacity
    live = vmap.occupied > 0.5
    h0 = _hash(vmap.keys, C)
    iota = jnp.arange(C, dtype=jnp.int32)

    keys_new = jnp.full((C, 3), _EMPTY, dtype=jnp.int32)
    slot_res = jnp.full((C,), C, dtype=jnp.int32)
    offset = jnp.zeros((C,), jnp.int32)
    alive = live

    def cond_fn(carry):
        _, _, _, alive, rnd = carry
        return (rnd < vmap.max_probes) & jnp.any(alive)

    def body_fn(carry):
        keys_new, slot_res, offset, alive, rnd = carry
        slot = (h0 + offset) & (C - 1)
        slot_q = jnp.where(alive, slot, C)
        gk = keys_new.at[slot_q].get(mode="fill", fill_value=0x7FFFFFFF)
        empty = (gk[:, 0] == _EMPTY) & alive
        # arbitrate concurrent claims for one slot by row index
        cbuf = jnp.full((C + 1,), jnp.int32(C))
        cbuf = cbuf.at[jnp.where(empty, slot, C)].min(
            jnp.where(empty, iota, C))
        win = empty & (cbuf.at[jnp.where(empty, slot, C)].get(
            mode="fill", fill_value=C) == iota)
        keys_new = keys_new.at[jnp.where(win, slot, C), :].set(
            vmap.keys, mode="drop")
        slot_res = jnp.where(win, slot, slot_res)
        alive = alive & ~win
        offset = offset + jnp.where(alive, 1, 0)
        return keys_new, slot_res, offset, alive, rnd + 1

    keys_new, slot_res, _, _, _ = jax.lax.while_loop(
        cond_fn, body_fn,
        (keys_new, slot_res, offset, alive, jnp.int32(0)))

    payload = jnp.concatenate(
        [vmap.points, vmap.intensity[:, None],
         jnp.ones((C, 1), vmap.points.dtype),
         vmap.stat_n[:, None], vmap.stat_sum, vmap.stat_sq], axis=-1)
    buf = jnp.zeros((C, payload.shape[1]), payload.dtype)
    buf = buf.at[slot_res, :].set(payload, mode="drop")
    return vmap.replace(
        keys=keys_new,
        points=buf[:, :3],
        intensity=buf[:, 3],
        occupied=buf[:, 4],
        stat_n=buf[:, 5],
        stat_sum=buf[:, 6:9],
        stat_sq=buf[:, 9:],
    )


def voxel_map_maybe_rehash(
    vmap: VoxelHashMap, tombstone_fraction: float = 0.1
) -> VoxelHashMap:
    """Rehash when tombstones exceed `tombstone_fraction` of capacity —
    the jit-safe maintenance trigger (lax.cond; identical pytree shapes)."""
    tombs = jnp.sum((vmap.keys[:, 0] != _EMPTY) & (vmap.occupied <= 0.5))
    return jax.lax.cond(
        tombs > tombstone_fraction * vmap.capacity,
        voxel_map_rehash, lambda v: v, vmap)


def voxel_map_delete_points(
    vmap: VoxelHashMap,
    pts: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> VoxelHashMap:
    """Delete the voxels containing the given points (ikd-Tree
    `Delete_Points` / `Delete_by_point`, ikd_Tree.cpp:522-542). Granularity
    is the voxel: the map stores one representative per voxel, so deleting
    "a point" tombstones its voxel. Unmatched points are no-ops."""
    n = pts.shape[0]
    if mask is None:
        mask = jnp.ones(n, dtype=pts.dtype)
    C = vmap.capacity
    coords = _voxel_coords(pts, vmap.voxel_size)
    h = _hash(coords, C)
    valid = mask > 0.5

    slot_found = jnp.full((n,), C, dtype=jnp.int32)

    def probe(carry, j):
        slot_found = carry
        slot = (h + j) & (C - 1)
        hit = (jnp.all(vmap.keys[slot] == coords, axis=-1)
               & (vmap.occupied[slot] > 0.5) & valid & (slot_found >= C))
        return jnp.where(hit, slot, slot_found), None

    slot_found, _ = jax.lax.scan(
        probe, slot_found, jnp.arange(vmap.max_probes, dtype=jnp.int32))

    idx = jnp.where(slot_found < C, slot_found, C)
    occ = vmap.occupied.at[idx].set(0.0, mode="drop")
    sn = vmap.stat_n.at[idx].set(0.0, mode="drop")
    ss = vmap.stat_sum.at[idx].set(0.0, mode="drop")
    sq = vmap.stat_sq.at[idx].set(0.0, mode="drop")
    return vmap.replace(occupied=occ, stat_n=sn, stat_sum=ss, stat_sq=sq)


def voxel_map_add_box(
    vmap: VoxelHashMap, lo: jnp.ndarray, hi: jnp.ndarray
) -> VoxelHashMap:
    """Reverse a box delete: revive tombstoned voxels whose stored point
    lies in [lo, hi] (ikd-Tree `Add_Point_Boxes` / `Add_by_range`,
    ikd_Tree.cpp:500-519 — flips lazy-delete flags back inside the box).
    Revived voxels keep their representative point/intensity; Gaussian
    accumulators restart (they were cleared at delete), so the voxel carries
    the isotropic fallback covariance until re-observed."""
    has_key = vmap.keys[:, 0] != _EMPTY
    inside = jnp.all((vmap.points >= lo) & (vmap.points <= hi), axis=-1)
    revive = has_key & inside & (vmap.occupied <= 0.5)
    return vmap.replace(
        occupied=jnp.where(revive, 1.0, vmap.occupied))


def voxel_map_delete_box_acquire(
    vmap: VoxelHashMap,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    out_size: int,
) -> Tuple[VoxelHashMap, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Box delete that also returns the removed representative points
    (compacted to (out_size, 3) + mask + count). The functional counterpart
    of ikd-Tree's deleted-points drain `acquire_removed_points`
    (ikd_Tree.cpp:567-581) and the `Delete_Point_Boxes` removal count
    (:544-564) — no hidden mutable buffer; the delete op itself hands back
    what it removed."""
    inside = jnp.all((vmap.points >= lo) & (vmap.points <= hi), axis=-1)
    kill = (vmap.occupied > 0.5) & inside
    pts, mask, count = mask_compact(
        vmap.points, kill.astype(vmap.points.dtype), out_size)
    return voxel_map_delete_box(vmap, lo, hi), pts, mask, count


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
    L = vmap.voxel_size
    base = _voxel_coords(queries, L)                     # (N,3)
    s = stencil_radius
    r = jnp.arange(-s, s + 1, dtype=jnp.int32)
    offsets = jnp.stack(jnp.meshgrid(r, r, r, indexing="ij"), axis=-1).reshape(-1, 3)
    coords = base[:, None, :] + offsets[None, :, :]       # (N,K,3)
    return _lookup_voxels(vmap, coords)


def voxel_map_lookup_slots(
    vmap: VoxelHashMap, coords: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Resolve integer voxel coordinates (..., 3) to their hash-table slots:
    -> (slot (...,) int32, found (...) bool). Slot is 0 where not found —
    gate every gather through `found`. One widened gather per probe round
    over the whole coordinate block (TPU: op count, not row count, is the
    cost driver)."""
    C = vmap.capacity
    h = _hash(coords, C)
    slot0 = jnp.zeros(coords.shape[:-1], dtype=jnp.int32)
    found0 = jnp.zeros(coords.shape[:-1], dtype=bool)

    def probe(carry, j):
        slots, found = carry
        slot = (h + j) & (C - 1)
        sk = vmap.keys[slot]                              # (...,3)
        so = vmap.occupied[slot] > 0.5
        hit = jnp.all(sk == coords, axis=-1) & so & (~found)
        slots = jnp.where(hit, slot, slots)
        found = found | hit
        return (slots, found), None

    (slots, found), _ = jax.lax.scan(
        probe, (slot0, found0), jnp.arange(vmap.max_probes))
    return slots, found


def _lookup_voxels(
    vmap: VoxelHashMap, coords: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather the stored point of each integer voxel coordinate (..., 3)
    -> (points (..., 3), found (...)). One widened gather per probe round
    over the whole coordinate block (TPU: op count, not row count, is the
    cost driver)."""
    C = vmap.capacity
    h = _hash(coords, C)
    found_pts = jnp.zeros(coords.shape[:-1] + (3,), dtype=vmap.points.dtype)
    found = jnp.zeros(coords.shape[:-1], dtype=bool)

    def probe(carry, j):
        found_pts, found = carry
        slot = (h + j) & (C - 1)
        sk = vmap.keys[slot]                              # (...,3)
        so = vmap.occupied[slot] > 0.5
        hit = jnp.all(sk == coords, axis=-1) & so & (~found)
        pts = vmap.points[slot]
        found_pts = jnp.where(hit[..., None], pts, found_pts)
        found = found | hit
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


def voxel_map_knn_exact(
    vmap: VoxelHashMap,
    queries: jnp.ndarray,
    k: int,
    max_dist: float = 2.0,
    chunk: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """EXACT k nearest map points per query within max_dist — the whole-map
    `Nearest_Search` + max_dist gate (ikd_Tree.cpp:368-398;
    MAX_SEARCH_RADIUS=2.0 at src/radar_odometry.cpp:35), without the
    stencil-reach bound of voxel_map_knn.

    TPU formulation of branch-and-bound descent: candidate voxel offsets out
    to max_dist are pre-sorted (at trace time) by a static lower bound on
    their distance to the query's voxel, then visited in fixed-size chunks
    inside a while_loop. Each chunk is ONE widened gather (op count, not row
    count, drives cost); the loop exits early once every query's k-th best
    distance beats the next chunk's lower bound — the same pruning the
    kd-tree's `calc_box_dist` test performs, batched.

    `max_dist` must be a static Python float (it fixes the candidate set).
    queries: (N,3) -> (dists2 (N,k), points (N,k,3)); missing neighbors
    carry +inf distance.
    """
    import numpy as np

    if not np.isfinite(max_dist) or max_dist <= 0:
        raise ValueError("voxel_map_knn_exact needs a finite max_dist > 0")
    L = vmap.voxel_size
    R = int(np.floor(max_dist / L)) + 1
    r = np.arange(-R, R + 1)
    offs = np.stack(np.meshgrid(r, r, r, indexing="ij"), -1).reshape(-1, 3)
    # lower bound: any point in the query's voxel vs any point in the offset
    # voxel is at least L * (|o_i| - 1) apart per axis
    dmin = L * np.sqrt(
        (np.maximum(np.abs(offs) - 1, 0).astype(np.float64) ** 2).sum(-1))
    keep = dmin <= max_dist
    offs, dmin = offs[keep], dmin[keep]
    order = np.argsort(dmin, kind="stable")
    offs, dmin = offs[order], dmin[order]
    n_off = offs.shape[0]
    chunk = min(chunk, n_off)
    n_chunks = -(-n_off // chunk)
    pad = n_chunks * chunk - n_off
    offs_p = np.pad(offs, ((0, pad), (0, 0)))
    valid_p = np.pad(np.ones(n_off, bool), (0, pad))
    # squared lower bound of chunk c's first (closest) offset; consulted
    # BEFORE visiting chunk c — if every query's k-th best already beats it,
    # no later voxel can improve the answer (dmin is ascending)
    lb2 = np.full(n_chunks + 1, np.inf, np.float32)
    lb2[:n_chunks] = (dmin[::chunk] ** 2).astype(np.float32)
    chunk_off = jnp.asarray(offs_p.reshape(n_chunks, chunk, 3), jnp.int32)
    chunk_valid = jnp.asarray(valid_p.reshape(n_chunks, chunk))
    lb2 = jnp.asarray(lb2)

    N = queries.shape[0]
    base = _voxel_coords(queries, L)                     # (N,3)
    best_d2 = jnp.full((N, k), jnp.inf, queries.dtype)
    best_pts = jnp.zeros((N, k, 3), queries.dtype)
    md2 = jnp.asarray(max_dist * max_dist, queries.dtype)

    def cond(state):
        best_d2, _, c = state
        return (c < n_chunks) & jnp.any(best_d2[:, k - 1] > lb2[c])

    def body(state):
        best_d2, best_pts, c = state
        o = chunk_off[c]                                 # (CH,3)
        coords = base[:, None, :] + o[None, :, :]        # (N,CH,3)
        pts, found = _lookup_voxels(vmap, coords)
        d2 = jnp.sum((pts - queries[:, None, :]) ** 2, axis=-1)
        d2 = jnp.where(found & chunk_valid[c] & (d2 < md2), d2, jnp.inf)
        all_d2 = jnp.concatenate([best_d2, d2], axis=-1)
        all_pts = jnp.concatenate([best_pts, pts], axis=1)
        neg, idx = jax.lax.top_k(-all_d2, k)
        return (-neg, jnp.take_along_axis(all_pts, idx[..., None], axis=1),
                c + 1)

    best_d2, best_pts, _ = jax.lax.while_loop(
        cond, body, (best_d2, best_pts, jnp.int32(0)))
    return best_d2, best_pts
