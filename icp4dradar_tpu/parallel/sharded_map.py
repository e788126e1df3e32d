"""Spatially-sharded voxel map over a device mesh.

SURVEY.md §7 step 7 ("map blocks sharded by PartitionSpec"): the hash table
is split into contiguous slot ranges, one per device — map memory and
insert/query work scale with the mesh. Candidate scans are replicated
(a scan is ~2k points; the map is ~10 MB/device), each device arbitrates
only the slots it owns, and the per-candidate liveness state (a few (N,)
vectors) is psum-combined between probe rounds — that is the ONLY
cross-device traffic during insertion. Queries compact per-shard and
all-gather fixed-size results.

The per-round arbitration mirrors mapping/voxel_hash.py::voxel_map_insert
(keep-nearest-center, tombstone revive) restricted to the local slot range;
equality with the single-device map is tested in tests/test_sharded_map.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from icp4dradar_tpu.mapping.voxel_hash import (
    VoxelHashMap,
    _EMPTY,
    _center_dist2,
    _hash,
    _voxel_coords,
    voxel_map_create,
)


def sharded_map_create(
    mesh: Mesh,
    capacity: int = 1 << 18,
    voxel_size: float = 0.5,
    max_probes: int = 8,
    axis: str = "dp",
) -> VoxelHashMap:
    """A VoxelHashMap whose (C, ...) arrays are sharded along the mesh axis."""
    n = mesh.shape[axis]
    if capacity % n:
        raise ValueError("capacity must divide the mesh size")
    vm = voxel_map_create(capacity, voxel_size, max_probes)
    sharding = jax.NamedSharding(mesh, P(axis))
    sharding2 = jax.NamedSharding(mesh, P(axis, None))

    def place(x):
        return jax.device_put(x, sharding2 if x.ndim == 2 else sharding)

    return jax.tree.map(place, vm)


def _local_insert_round(local, cand, slot_base, Cl, voxel_size):
    """One arbitration round over this device's slot range. `local` holds the
    local array slices; `cand` the replicated candidate state. Returns
    (updated local arrays, per-candidate (advance, die) owned-here flags)."""
    (keys, points, inten, occ, sn, ssum, ssq) = local
    (coords, xyz, intensity, sq6, d2c, idx_n, alive, slot) = cand
    n = xyz.shape[0]

    mine = (slot >= slot_base) & (slot < slot_base + Cl) & alive
    lslot = jnp.clip(slot - slot_base, 0, Cl - 1)

    slot_keys = keys[lslot]
    slot_used = slot_keys[..., 0] != _EMPTY
    slot_occ = occ[lslot] > 0.5
    same = jnp.all(slot_keys == coords, axis=-1) & slot_used & mine
    empty = (~slot_used) & mine

    big = jnp.asarray(1e30, xyz.dtype)
    occ_d2c = _center_dist2(points, keys, voxel_size)
    inc_d2c = jnp.where(slot_occ, occ_d2c[lslot], big)

    dbuf = jnp.full((Cl + 1,), big, xyz.dtype)
    dbuf = dbuf.at[jnp.where(same, lslot, Cl)].min(jnp.where(same, d2c, big))
    cand_is_min = same & (d2c <= dbuf[:Cl][lslot])
    ibuf = jnp.full((Cl + 1,), jnp.int32(n))
    ibuf = ibuf.at[jnp.where(cand_is_min, lslot, Cl)].min(
        jnp.where(cand_is_min, idx_n, n)
    )
    cand_win = cand_is_min & (ibuf[:Cl][lslot] == idx_n) & (d2c < inc_d2c)
    w_slot = jnp.where(cand_win, lslot, Cl)
    points = points.at[w_slot, :].set(xyz, mode="drop")
    inten = inten.at[w_slot].set(intensity, mode="drop")
    occ = occ.at[w_slot].set(1.0, mode="drop")

    cbuf = jnp.full((Cl + 1,), jnp.int32(n))
    cbuf = cbuf.at[jnp.where(empty, lslot, Cl)].min(jnp.where(empty, idx_n, n))
    claim_win = empty & (cbuf[:Cl][lslot] == idx_n)
    cw_slot = jnp.where(claim_win, lslot, Cl)
    keys = keys.at[cw_slot, :].set(coords, mode="drop")
    points = points.at[cw_slot, :].set(xyz, mode="drop")
    inten = inten.at[cw_slot].set(intensity, mode="drop")
    occ = occ.at[cw_slot].set(1.0, mode="drop")

    resolved = same | claim_win
    r_slot = jnp.where(resolved, lslot, Cl)
    sn = sn.at[r_slot].add(1.0, mode="drop")
    ssum = ssum.at[r_slot, :].add(xyz, mode="drop")
    ssq = ssq.at[r_slot, :].add(sq6, mode="drop")

    lost_claim = empty & ~claim_win
    winner_idx = jnp.clip(cbuf[:Cl][lslot], 0, n - 1)
    winner_same = jnp.all(coords[winner_idx] == coords, axis=-1)
    advance = (mine & ~same & ~empty) | (lost_claim & ~winner_same)
    die = resolved
    return (keys, points, inten, occ, sn, ssum, ssq), advance, die


def shard_local_insert(
    local_vm: VoxelHashMap,
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    intensity: jnp.ndarray,
    axis: str,
    C: int,
    Cl: int,
) -> VoxelHashMap:
    """Full probe-round insert of a REPLICATED candidate batch into this
    device's slot range. Must run inside a shard_map region over `axis`:
    one psum per probe round propagates the slot owner's per-candidate
    verdict; everything else is local. Shared by sharded_map_insert and the
    end-to-end distributed pipeline (distributed_pipeline.py)."""
    L = local_vm.voxel_size
    max_probes = local_vm.max_probes
    n = xyz.shape[0]
    d = jax.lax.axis_index(axis)
    slot_base = d * Cl
    coords = _voxel_coords(xyz, L)
    h0 = _hash(coords, C)
    d2c = _center_dist2(xyz, coords, L)
    sq6 = jnp.stack([
        xyz[:, 0] * xyz[:, 0], xyz[:, 1] * xyz[:, 1],
        xyz[:, 2] * xyz[:, 2], xyz[:, 0] * xyz[:, 1],
        xyz[:, 0] * xyz[:, 2], xyz[:, 1] * xyz[:, 2],
    ], axis=-1)
    idx_n = jnp.arange(n, dtype=jnp.int32)

    state = (
        (local_vm.keys, local_vm.points, local_vm.intensity,
         local_vm.occupied, local_vm.stat_n, local_vm.stat_sum,
         local_vm.stat_sq),
        mask > 0.5,
        jnp.zeros(n, dtype=jnp.int32),
    )

    def round_fn(state, _):
        local, alive, offset = state
        slot = (h0 + offset) & (C - 1)
        cand = (coords, xyz, intensity, sq6, d2c, idx_n, alive, slot)
        local, advance_l, die_l = _local_insert_round(
            local, cand, slot_base, Cl, L
        )
        # exactly one device owns each live candidate's current slot:
        # psum propagates the owner's verdict to everyone
        advance = jax.lax.psum(advance_l.astype(jnp.int32), axis) > 0
        die = jax.lax.psum(die_l.astype(jnp.int32), axis) > 0
        alive = alive & ~die
        offset = offset + (advance & alive).astype(jnp.int32)
        return (local, alive, offset), None

    # early exit on global liveness (alive is psum-synchronized)
    def cond_fn(carry):
        (local, alive, offset), rnd = carry
        return (rnd < max_probes) & jnp.any(alive)

    def body_fn(carry):
        st, rnd = carry
        st, _ = round_fn(st, None)
        return (st, rnd + 1)

    (local, _, _), _ = jax.lax.while_loop(
        cond_fn, body_fn, (state, jnp.int32(0))
    )
    return local_vm.replace(
        keys=local[0], points=local[1], intensity=local[2],
        occupied=local[3], stat_n=local[4], stat_sum=local[5],
        stat_sq=local[6],
    )


def shard_local_rehash(local_vm: VoxelHashMap, axis: str, C: int,
                       Cl: int) -> VoxelHashMap:
    """Distributed tombstone reclamation: rebuild the WHOLE sharded table
    from live voxels only, inside a shard_map region over `axis`.

    The sharded analog of mapping.voxel_hash.voxel_map_rehash (itself the
    analog of ikd-Tree's re-balance rebuild, ikd_Tree.cpp:633-653): live
    entries restart their probe chains at _hash(key), so an entry can move
    ACROSS shard boundaries (its fresh chain may land in another device's
    slot range). Each device all-gathers the live rows once (O(C) payload —
    maintenance-rate traffic, not per-frame), then claims only slots it
    owns; per-round psums propagate each candidate's claim verdict exactly
    like shard_local_insert. Claim arbitration is by global old-slot index,
    matching the single-device rehash row for row. Live entries whose fresh
    chain exceeds max_probes drop (same pressure policy as insertion)."""
    d = jax.lax.axis_index(axis)
    slot_base = d * Cl

    keys_g = jax.lax.all_gather(local_vm.keys, axis, tiled=True)    # (C,3)
    live_g = jax.lax.all_gather(local_vm.occupied > 0.5, axis,
                                tiled=True)                         # (C,)
    payload_l = jnp.concatenate(
        [local_vm.points, local_vm.intensity[:, None],
         local_vm.stat_n[:, None], local_vm.stat_sum, local_vm.stat_sq],
        axis=-1)                                                    # (Cl,14)
    payload_g = jax.lax.all_gather(payload_l, axis, tiled=True)     # (C,14)

    h0 = _hash(keys_g, C)
    iota = jnp.arange(C, dtype=jnp.int32)
    keys_new = jnp.full((Cl, 3), _EMPTY, dtype=jnp.int32)
    # payload + occupied flag column
    buf = jnp.zeros((Cl, 15), payload_g.dtype)

    def cond_fn(carry):
        _, _, alive, _, rnd = carry
        return (rnd < local_vm.max_probes) & jnp.any(alive)

    def body_fn(carry):
        keys_new, buf, alive, offset, rnd = carry
        slot = (h0 + offset) & (C - 1)
        mine = (slot >= slot_base) & (slot < slot_base + Cl) & alive
        lslot = jnp.clip(slot - slot_base, 0, Cl - 1)
        taken = keys_new[lslot, 0] != _EMPTY
        empty = (~taken) & mine
        # arbitrate concurrent claims for one local slot by old-slot index
        cbuf = jnp.full((Cl + 1,), jnp.int32(C))
        cbuf = cbuf.at[jnp.where(empty, lslot, Cl)].min(
            jnp.where(empty, iota, C))
        win = empty & (cbuf[:Cl][lslot] == iota)
        w = jnp.where(win, lslot, Cl)
        keys_new = keys_new.at[w, :].set(keys_g, mode="drop")
        row = jnp.concatenate(
            [payload_g, jnp.ones((C, 1), payload_g.dtype)], axis=-1)
        buf = buf.at[w, :].set(row, mode="drop")
        die = jax.lax.psum(win.astype(jnp.int32), axis) > 0
        advance = jax.lax.psum((mine & ~win).astype(jnp.int32), axis) > 0
        alive = alive & ~die
        offset = offset + (advance & alive).astype(jnp.int32)
        return keys_new, buf, alive, offset, rnd + 1

    keys_new, buf, _, _, _ = jax.lax.while_loop(
        cond_fn, body_fn,
        (keys_new, buf, live_g, jnp.zeros((C,), jnp.int32), jnp.int32(0)))
    return local_vm.replace(
        keys=keys_new,
        points=buf[:, :3],
        intensity=buf[:, 3],
        stat_n=buf[:, 4],
        stat_sum=buf[:, 5:8],
        stat_sq=buf[:, 8:14],
        occupied=buf[:, 14],
    )


def shard_local_maybe_rehash(
    local_vm: VoxelHashMap, axis: str, C: int, Cl: int,
    tombstone_fraction: float = 0.1,
) -> VoxelHashMap:
    """Rehash when GLOBAL tombstones exceed `tombstone_fraction` of
    capacity. The trigger count is psum'd, so every device takes the same
    lax.cond branch — the collectives inside the rehash stay aligned."""
    tombs_l = jnp.sum((local_vm.keys[:, 0] != _EMPTY)
                      & (local_vm.occupied <= 0.5))
    tombs = jax.lax.psum(tombs_l, axis)
    return jax.lax.cond(
        tombs > tombstone_fraction * C,
        lambda v: shard_local_rehash(v, axis, C, Cl),
        lambda v: v, local_vm)


def sharded_map_insert(
    vmap: VoxelHashMap,
    mesh: Mesh,
    xyz: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    intensity: Optional[jnp.ndarray] = None,
    axis: str = "dp",
) -> VoxelHashMap:
    """Insert a replicated candidate batch into the sharded map."""
    n_dev = mesh.shape[axis]
    C = vmap.capacity
    Cl = C // n_dev
    n = xyz.shape[0]
    if mask is None:
        mask = jnp.ones(n, dtype=xyz.dtype)
    if intensity is None:
        intensity = jnp.zeros(n, dtype=xyz.dtype)

    map_specs = jax.tree.map(lambda x: P(axis) if x.ndim == 1 else P(axis, None), vmap)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(map_specs, P(), P(), P()),
        out_specs=map_specs,
        check_vma=False,
    )
    def run(local_vm, xyz_, mask_, inten_):
        return shard_local_insert(local_vm, xyz_, mask_, inten_, axis, C, Cl)

    return run(vmap, xyz, mask, intensity)


def sharded_map_rehash(
    vmap: VoxelHashMap,
    mesh: Mesh,
    axis: str = "dp",
) -> VoxelHashMap:
    """Host-level entry for the distributed rehash (see shard_local_rehash)."""
    n_dev = mesh.shape[axis]
    C = vmap.capacity
    Cl = C // n_dev
    map_specs = jax.tree.map(
        lambda x: P(axis) if x.ndim == 1 else P(axis, None), vmap)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(map_specs,),
        out_specs=map_specs,
        check_vma=False,
    )
    def run(local_vm):
        return shard_local_rehash(local_vm, axis, C, Cl)

    return run(vmap)


def shard_local_sector_stats(
    local_vm: VoxelHashMap,
    center: jnp.ndarray,
    radius: float,
    heading_deg: jnp.ndarray,
    half_angle_deg: float,
    per: int,
    min_count: float = 3.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """This shard's slice of the sector query with per-voxel Gaussians,
    compacted to `per` rows. Pure local math (no collectives) — the union
    of all shards' rows equals the single-device
    voxel_map_sector_search_with_stats output set, row for row (the raw
    [n, sum3, sq6] accumulators are compacted first, identical stats math),
    PROVIDED no shard overflows its quota. The per-shard quota `per` is
    usually submap_max_points / n; voxels hash-distribute ~uniformly across
    slot ranges but not exactly, so a hot shard past `per` sector voxels
    drops its excess while other shards have slack — a truncation pattern
    the single-device path (one global budget) doesn't have. Size `per`
    with headroom when sector occupancy can approach the submap budget
    (run_scan_to_map_distributed inherits this caveat)."""
    from icp4dradar_tpu.ops.compaction import mask_compact

    delta = local_vm.points - center
    d2 = jnp.sum(delta * delta, axis=-1)
    bearing = jnp.arctan2(delta[..., 1], delta[..., 0]) * 180.0 / jnp.pi
    diff = jnp.abs((bearing - heading_deg + 180.0) % 360.0 - 180.0)
    sel = (local_vm.occupied > 0.5) & (d2 < radius * radius) \
        & (diff < half_angle_deg)
    payload = jnp.concatenate(
        [local_vm.points, local_vm.stat_n[:, None], local_vm.stat_sum,
         local_vm.stat_sq],
        axis=-1,
    )  # (Cl, 13)
    out, mask, count = mask_compact(
        payload, sel.astype(local_vm.points.dtype), per)
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
    iso = jnp.asarray([0.01, 0.01, 0.01, 0.0, 0.0, 0.0], dtype=cov.dtype)
    thin = out[:, 3:4] < min_count
    cov = jnp.where(thin, iso[None, :], cov)
    return out[:, :3], mask, count, mu, cov


def sharded_sector_search_with_stats(
    vmap: VoxelHashMap,
    mesh: Mesh,
    center: jnp.ndarray,
    radius: float,
    heading_deg: jnp.ndarray,
    half_angle_deg: float,
    out_size: int,
    axis: str = "dp",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sector query over the sharded map: per-shard compaction to
    out_size/n slots, all-gathered to a fixed (out_size, ...) result.
    Returns (points, mask, count, means, covs_packed)."""
    from icp4dradar_tpu.ops.compaction import mask_compact

    n_dev = mesh.shape[axis]
    per = out_size // n_dev
    map_specs = jax.tree.map(lambda x: P(axis) if x.ndim == 1 else P(axis, None), vmap)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(map_specs, P(), P()),
        out_specs=(P(axis, None), P(axis), P(), P(axis, None), P(axis, None)),
        check_vma=False,
    )
    def run(local_vm, center_, heading_):
        delta = local_vm.points - center_
        d2 = jnp.sum(delta * delta, axis=-1)
        bearing = jnp.arctan2(delta[..., 1], delta[..., 0]) * 180.0 / jnp.pi
        diff = jnp.abs((bearing - heading_ + 180.0) % 360.0 - 180.0)
        sel = (local_vm.occupied > 0.5) & (d2 < radius * radius) \
            & (diff < half_angle_deg)
        payload = jnp.concatenate(
            [local_vm.points, local_vm.voxel_means(),
             local_vm.voxel_covs_packed()],
            axis=-1,
        )
        out, m, cnt = mask_compact(payload, sel.astype(jnp.float32), per)
        total = jax.lax.psum(cnt, axis)
        return out, m, total, out[:, 3:6], out[:, 6:12]

    out, m, total, means, covs = run(vmap, center, heading_deg)
    return out[:, :3], m, total[0] if total.ndim else total, means, covs
