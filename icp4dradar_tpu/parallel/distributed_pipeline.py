"""End-to-end multi-device scan-to-map odometry: the full `main_task`
tracked-frame loop (src/radar_odometry.cpp:311-434) running ON THE MESH.

Round-1 built the distributed components (spatially-sharded voxel map,
ring-sweep VGICP, factor-sharded GN); this module chains them into a
pipeline that tracks a whole sequence without the map ever living on one
device. ONE shard_map region wraps the whole sequence; inside it a
lax.scan drives the per-frame step:

  1. REVE ego-velocity + inlier extraction — replicated compute (a scan is
     ~80 KB; redundant per-device math is cheaper than any reshard).
  2. Doppler-prior pose prediction (models/scan_to_map.py semantics).
  3. Sector submap query: each device compacts ITS slot range's sector
     voxels + Gaussians locally (shard_local_sector_stats) — the submap is
     born sharded, no all-gather.
  4. Ring-sweep VGICP Gauss-Newton: submap shards rotate over the mesh via
     ppermute inside each sweep, running-best merge, frozen-payload normal
     equations; the 6x6 solve is replicated (ring_vgicp.py pattern,
     cloud-centered frame included).
  5. Tracking-health gate (models/scan_to_map.py::_apply_tracking_gate).
  6. Sharded insert of the corrected world points (shard_local_insert:
     per-round psum arbitration over slot owners).
  7. Optional forget-far maintenance — elementwise over local slots.

Cross-device traffic per frame: the insert's per-round liveness psums, the
ring's ppermutes, and the GN scalars' pmeans — all O(N + submap/n), never
O(map). Per-device memory is O(C/n) map + O(N) scan, so map capacity
scales with the mesh.

Equality with the single-device run_scan_to_map (same config, VGICP path)
is exact up to f32 reduction order — tested in
tests/test_distributed_pipeline.py on the 8-device CPU mesh.

Long-run maintenance matches the single-device flagship: forget-far is
elementwise over local slots, and tombstone reclamation runs as the
DISTRIBUTED rehash (sharded_map.shard_local_rehash — all-gather live rows,
claim-arbitrate per shard, psum verdicts) under the same psum'd
tombstone-fraction trigger, so a long distributed run never hits the
"table full of dead keys, new territory stops inserting" failure
(docs/PERFORMANCE.md). `block > 1` additionally amortizes the fixed-cost
map ops exactly like models/scan_to_map.py::run_scan_to_map_blocked: ONE
sector query + ONE batched insert per block of frames, frames inside a
block registering against a submap frozen at block start, with the
const-velocity rotation prior cutting GN sweeps on turns.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from icp4dradar_tpu.config import PipelineConfig
from icp4dradar_tpu.geom import se3_apply, se3_exp, se3_identity, se3_inverse
from icp4dradar_tpu.geom.linalg import solve_spd6
from icp4dradar_tpu.geom.so3 import matrix_to_rpy
from icp4dradar_tpu.io.scan import RadarScan
from icp4dradar_tpu.mapping.voxel_hash import VoxelHashMap, voxel_map_forget_far
from icp4dradar_tpu.ops.vgicp_fused import (
    best_payload_to_rows,
    merge_best_rows,
    radar_point_covariances_packed,
    vgicp_accumulators_from_best_xla,
    vgicp_iteration,
    vgicp_sweep_best_xla,
)
from icp4dradar_tpu.parallel.sharded_map import (
    shard_local_insert,
    shard_local_maybe_rehash,
    shard_local_sector_stats,
    sharded_map_create,
)
from icp4dradar_tpu.preprocess.reve import estimate_ego_velocity


def _ring_gn_align(
    T0: jnp.ndarray,
    sx: jnp.ndarray,
    sm: jnp.ndarray,
    sc: jnp.ndarray,
    tm: jnp.ndarray,
    tc: jnp.ndarray,
    tmask: jnp.ndarray,
    axis: str,
    perm,
    on_tpu: bool,
    max_correspondence_dist: float,
    cov_eps: float,
    lm_lambda: float,
    max_iterations: int,
    transformation_epsilon: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Distributed GN against ring-rotating submap shards; must run inside
    a shard_map over `axis`. tm/tc/tmask are THIS device's shard; the scan
    arrives replicated and each device sweeps only ITS 1/n slice (per-device
    compute (N/n)·M — slice partials psum into the full accumulators).
    Returns replicated (T, fitness, iterations). Same structure as
    ring_vgicp._cached_ring_align's body, inlined here so it composes into
    the per-frame step (the standalone version owns its own shard_map).
    Requires N divisible by the mesh size (RadarScan budgets are powers of
    two; checked by run_scan_to_map_distributed)."""
    n_ring = len(perm)
    d = jax.lax.axis_index(axis)
    Nl = sx.shape[0] // n_ring
    sl = lambda x: jax.lax.dynamic_slice_in_dim(x, d * Nl, Nl)
    sx_l, sm_l, sc_l = sl(sx), sl(sm), sl(sc)

    def sweep(T):
        best0 = jnp.concatenate(
            [jnp.full((Nl, 1), 1e30, sx.dtype), jnp.zeros((Nl, 9), sx.dtype)],
            axis=-1)

        def step(carry, _):
            best, tm_, tc_, tmask_ = carry
            if on_tpu:
                _, _, _, _, _, b = vgicp_iteration(
                    T, sx_l, sm_l, sc_l, tm_, tc_, tmask_,
                    max_correspondence_dist=max_correspondence_dist,
                    cov_eps=cov_eps, return_best=True)
                rows = best_payload_to_rows(b, Nl)
            else:
                rows = vgicp_sweep_best_xla(T, sx_l, tm_, tc_, tmask_)
            best = merge_best_rows(best, rows)
            tm_ = jax.lax.ppermute(tm_, axis, perm)
            tc_ = jax.lax.ppermute(tc_, axis, perm)
            tmask_ = jax.lax.ppermute(tmask_, axis, perm)
            return (best, tm_, tc_, tmask_), None

        (best, _, _, _), _ = jax.lax.scan(
            step, (best0, tm, tc, tmask), None, length=n_ring)
        return vgicp_accumulators_from_best_xla(
            T, sx_l, sm_l, sc_l, best,
            max_correspondence_dist=max_correspondence_dist,
            cov_eps=cov_eps)

    def cond(state):
        _, it, delta, _, _ = state
        return (it < max_iterations) & (delta > transformation_epsilon)

    def body(state):
        T, it, _, _, _ = state
        # slice partials -> full accumulators, replicated on every device
        H, g, cost, wsum, d2sum = jax.tree.map(
            lambda x: jax.lax.psum(x, axis), sweep(T))
        H = H + lm_lambda * jnp.eye(6, dtype=T.dtype)
        xi = solve_spd6(H, -g)
        xi = jnp.where(jnp.isfinite(xi), xi, 0.0)
        return (se3_exp(xi) @ T, it + 1, jnp.sum(jnp.abs(xi)), wsum, d2sum)

    zero = jnp.zeros((), sx.dtype)
    T, iters, _, wsum, d2sum = jax.lax.while_loop(
        cond, body,
        (T0, jnp.int32(0), jnp.asarray(jnp.inf, sx.dtype), zero, zero))
    fitness = d2sum / jnp.maximum(wsum, 1.0)
    return T, fitness, iters


@functools.lru_cache(maxsize=8)
def _cached_distributed_run(mesh: Mesh, axis: str, cfg: PipelineConfig,
                            use_doppler_prior: bool, forget: bool,
                            block: int = 0, use_cv_rot: bool = False,
                            has_prior: bool = False):
    """Build the whole-sequence shard_map ONCE per (mesh, axis, cfg) — the
    jit cache must survive across calls (CLAUDE.md: TPU recompiles go
    through the tunnel). `block > 1` compiles the amortized-map-ops variant
    (one sector query + one batched insert per block, const-velocity
    rotation prior optional) mirroring run_scan_to_map_blocked."""
    from icp4dradar_tpu.models.scan_to_map import _apply_tracking_gate
    from icp4dradar_tpu.geom.so3 import so3_project

    n = mesh.shape[axis]
    C = cfg.voxel_map.capacity
    Cl = C // n
    # per-shard sector quota, with optional slack against hash imbalance at
    # saturation (VoxelMapConfig.shard_quota_slack); rounded up to a
    # sublane multiple so the compacted buffers tile cleanly
    per = cfg.voxel_map.submap_max_points // n
    slack = float(getattr(cfg.voxel_map, "shard_quota_slack", 1.0))
    if slack != 1.0:
        per = -(-int(per * slack) // 8) * 8
    vmcfg = cfg.voxel_map
    gicp = cfg.gicp
    on_tpu = jax.default_backend() == "tpu"
    perm = [(i, (i + 1) % n) for i in range(n)]

    from icp4dradar_tpu.mapping.voxel_hash import voxel_map_create

    vm_shape = jax.eval_shape(
        lambda: voxel_map_create(C, vmcfg.voxel_size, vmcfg.max_probes))
    map_specs = jax.tree.map(
        lambda x: P(axis) if len(x.shape) == 1 else P(axis, None), vm_shape)

    def maintain(vm, position):
        if forget:
            vm = voxel_map_forget_far(vm, position, vmcfg.forget_radius)
            vm = shard_local_maybe_rehash(
                vm, axis, C, Cl, vmcfg.rehash_tombstone_fraction)
        return vm

    def ring_register(pose, scan_xyz, inlier_mask, src_cov6,
                      tm_centered, tc, tmask, center):
        """Ring GN in the cloud-centered frame (vgicp.py rationale:
        km-scale world coordinates cancel catastrophically in f32);
        `center` is the frame the frozen submap was shifted by."""
        T0 = pose.at[:3, 3].add(-center)
        T, fitness, iters = _ring_gn_align(
            T0, scan_xyz, inlier_mask, src_cov6,
            tm_centered, tc, tmask, axis, perm, on_tpu,
            gicp.max_correspondence_dist, gicp.cov_epsilon,
            gicp.lm_lambda, gicp.max_iterations,
            gicp.vgicp_transformation_epsilon)
        return T.at[:3, 3].add(center), fitness, iters

    def local(local_vm, pose0, scans, keys, priors):
        def frame_step(carry, inp):
            vm, pose = carry
            scan, k = inp[0], inp[1]
            est = estimate_ego_velocity(scan, k, cfg.reve)

            has_map = jax.lax.psum(jnp.sum(vm.occupied), axis) > 0.5
            if has_prior:
                # body-frame motion prior (IMU rotation, preprocess/imu.py)
                # composed into the prediction once the map exists -- the
                # single-device scan_to_map_step semantics
                pd = inp[2]
                pose = jnp.where(has_map, pose @ pd, pose)
            if use_doppler_prior:
                delta_t = pose[:3, :3] @ est.velocity
                pose = pose.at[:3, 3].add(jnp.where(
                    est.valid & has_map, delta_t, jnp.zeros_like(delta_t)))

            heading = matrix_to_rpy(pose[:3, :3])[2]
            _, tmask, cnt_l, tm, tc = shard_local_sector_stats(
                vm, pose[:3, 3], vmcfg.sector_radius, heading,
                vmcfg.sector_half_angle_deg, per)
            sub_n = jax.lax.psum(cnt_l, axis)

            src_cov6 = radar_point_covariances_packed(
                scan.xyz, gicp.sigma_range, gicp.sigma_azimuth,
                gicp.sigma_elevation)

            center = pose[:3, 3]
            new_T, fitness, _iters = ring_register(
                pose, scan.xyz, est.inlier_mask, src_cov6,
                tm - center[None, :], tc, tmask, center)

            insert_mask = est.inlier_mask
            new_T, insert_mask, _ = _apply_tracking_gate(
                cfg, pose, new_T, fitness, insert_mask)

            corrected = se3_apply(new_T, scan.xyz)
            vm = shard_local_insert(
                vm, corrected, insert_mask, scan.intensity, axis, C, Cl)
            vm = maintain(vm, new_T[:3, 3])

            out = (new_T, new_T @ se3_inverse(pose), est.velocity,
                   est.valid, fitness, jnp.sum(est.inlier_mask), sub_n,
                   _iters)
            return (vm, new_T), out

        frame_xs = ((scans, keys, priors) if has_prior else (scans, keys))
        if block <= 1:
            (vm, _), outs = jax.lax.scan(
                frame_step, (local_vm, pose0), frame_xs)
            return vm, outs

        # ---- blocked variant: warmup per-frame, then amortized blocks ----
        F = scans.xyz.shape[0]
        F0 = block
        nblocks = (F - F0) // block
        dt = scans.xyz.dtype

        warm_xs = jax.tree.map(lambda x: x[:F0], frame_xs)
        (vm, pose), warm_outs = jax.lax.scan(
            frame_step, (local_vm, pose0), warm_xs)
        # bootstrap the const-velocity rotation from the last warmup delta
        warm_T = warm_outs[0]
        warm_delta = se3_inverse(warm_T[-2]) @ warm_T[-1]
        prev_rot0 = jnp.eye(4, dtype=dt).at[:3, :3].set(
            so3_project(warm_delta[:3, :3]))

        rest = jax.tree.map(
            lambda x: x[F0:].reshape((nblocks, block) + x.shape[1:]), scans)
        # frame-parallel precompute: REVE + measurement covariances depend
        # only on the raw scan (replicated compute, one vmapped dispatch)
        rest_flat = jax.tree.map(lambda x: x[F0:], scans)
        est_all = jax.vmap(
            lambda s, k: estimate_ego_velocity(s, k, cfg.reve)
        )(rest_flat, keys[F0:])
        est_blocks = jax.tree.map(
            lambda x: x.reshape((nblocks, block) + x.shape[1:]), est_all)
        NP = scans.xyz.shape[1]
        cov_blocks = radar_point_covariances_packed(
            rest_flat.xyz.reshape(-1, 3), gicp.sigma_range,
            gicp.sigma_azimuth, gicp.sigma_elevation,
        ).reshape(nblocks, block, NP, 6)

        def blk_frame_step(carry, inp):
            pose, prev_rot, frozen = carry
            tm_c, tc, tmask, sub_n, center = frozen
            scan, est, src_cov6 = inp[0], inp[1], inp[2]
            pose_in = pose
            if has_prior:
                # measured prior takes precedence over the const-velocity
                # heuristic (run_scan_to_map_blocked semantics)
                pose = pose @ inp[3]
            elif use_cv_rot:
                pose = pose @ prev_rot
            if use_doppler_prior:
                pose = pose.at[:3, 3].add(jnp.where(
                    est.valid, pose[:3, :3] @ est.velocity,
                    jnp.zeros_like(est.velocity)))
            new_T, fitness, _iters = ring_register(
                pose, scan.xyz, est.inlier_mask, src_cov6,
                tm_c, tc, tmask, center)
            insert_mask = est.inlier_mask
            new_T, insert_mask, _ = _apply_tracking_gate(
                cfg, pose, new_T, fitness, insert_mask)
            delta = se3_inverse(pose_in) @ new_T
            new_rot = jnp.eye(4, dtype=delta.dtype).at[:3, :3].set(
                so3_project(delta[:3, :3]))
            out = (new_T, new_T @ se3_inverse(pose), est.velocity,
                   est.valid, fitness, jnp.sum(est.inlier_mask), sub_n,
                   _iters)
            world_pts = se3_apply(new_T, scan.xyz)
            return (new_T, new_rot, frozen), (out, world_pts, insert_mask,
                                              scan.intensity)

        def block_step(carry, inp):
            vm, pose, prev_rot = carry
            scans_b, est_b, cov_b = inp[0], inp[1], inp[2]
            heading = matrix_to_rpy(pose[:3, :3])[2]
            center = pose[:3, 3]
            _, tmask, cnt_l, tm, tc = shard_local_sector_stats(
                vm, center, vmcfg.sector_radius, heading,
                vmcfg.sector_half_angle_deg, per)
            sub_n = jax.lax.psum(cnt_l, axis)
            frozen = (tm - center[None, :], tc, tmask, sub_n, center)
            blk_xs = ((scans_b, est_b, cov_b, inp[3]) if has_prior
                      else (scans_b, est_b, cov_b))
            (pose, prev_rot, _), (outs, world_pts, masks, intens) = \
                jax.lax.scan(blk_frame_step, (pose, prev_rot, frozen),
                             blk_xs)
            vm = shard_local_insert(
                vm, world_pts.reshape(-1, 3), masks.reshape(-1),
                intens.reshape(-1), axis, C, Cl)
            vm = maintain(vm, pose[:3, 3])
            return (vm, pose, prev_rot), outs

        blk_step_xs = (rest, est_blocks, cov_blocks)
        if has_prior:
            pr_blocks = priors[F0:].reshape(nblocks, block, 4, 4)
            blk_step_xs = blk_step_xs + (pr_blocks,)
        (vm, _, _), blk_outs = jax.lax.scan(
            block_step, (vm, pose, prev_rot0), blk_step_xs)
        blk_outs = jax.tree.map(
            lambda x: x.reshape((nblocks * block,) + x.shape[2:]), blk_outs)
        outs = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0),
            warm_outs, blk_outs)
        return vm, outs

    if has_prior:
        entry_fn = local
        in_specs = (map_specs, P(), P(), P(), P())
    else:
        def entry_fn(local_vm, pose0, scans, keys):
            return local(local_vm, pose0, scans, keys, None)
        in_specs = (map_specs, P(), P(), P())
    fn = jax.shard_map(
        entry_fn, mesh=mesh,
        in_specs=in_specs,
        out_specs=(map_specs, (P(),) * 8),
        check_vma=False,
    )
    return jax.jit(fn)


def run_scan_to_map_distributed(
    scans: RadarScan,
    mesh: Mesh,
    cfg: PipelineConfig = PipelineConfig(),
    key: Optional[jax.Array] = None,
    axis: str = "dp",
    use_doppler_prior: bool = True,
    block: int = 0,
    use_const_velocity_rot: bool = False,
    init_map: Optional[VoxelHashMap] = None,
    init_pose: Optional[jnp.ndarray] = None,
    priors: Optional[jnp.ndarray] = None,
):
    """Track a stacked (F, ...) sequence on the mesh; the map lives sharded
    the whole time. Returns (final sharded VoxelHashMap, outs dict with
    per-frame world_T / correction / velocity / velocity_valid / fitness /
    num_inliers / submap_points / iterations).

    `init_map` / `init_pose`: resume a distributed run from checkpointed
    state (save_distributed_state / load_distributed_state) — tracking
    continues against the restored sharded map from the restored pose,
    the reference pipeline's missing crash-recovery story (SURVEY.md §5).

    `block > 1`: amortize the fixed-cost map ops — one sector query + one
    batched insert per `block` frames (submap frozen at block start, the
    run_scan_to_map_blocked design on the mesh); needs
    (F - block) % block == 0. `use_const_velocity_rot`: predict each
    frame's heading change from the previous refined body delta (blocked
    mode only — the per-frame path keeps reference semantics).

    `priors` (F, 4, 4): optional per-frame body-frame motion priors (e.g.
    preprocess.imu.imu_prior_deltas) composed into the pose prediction once
    the map exists — same semantics as scan_to_map_step's `prior_delta`
    (the reference queues IMU and discards it,
    src/radar_odometry.cpp:359-362; here it is live on the mesh too). In
    blocked mode a measured prior supersedes the const-velocity rotation
    heuristic, matching run_scan_to_map_blocked.

    Requires cfg.gicp.use_vgicp (the distributed registration is the ring
    VGICP sweep) and capacity / submap_max_points divisible by the mesh.

    Submap quota caveat: each device compacts its sector voxels to
    submap_max_points/n rows (shard_local_sector_stats). Hash placement is
    ~uniform but not exact, so when sector occupancy approaches the submap
    budget a hot shard can truncate while others have slack — size
    submap_max_points with headroom over the expected sector voxel count."""
    n = mesh.shape[axis]
    if not cfg.gicp.use_vgicp:
        raise ValueError("distributed pipeline requires cfg.gicp.use_vgicp")
    if cfg.voxel_map.capacity % n or cfg.voxel_map.submap_max_points % n:
        raise ValueError(
            f"capacity {cfg.voxel_map.capacity} and submap_max_points "
            f"{cfg.voxel_map.submap_max_points} must be divisible by mesh "
            f"size {n}")
    if scans.xyz.shape[1] % n:
        raise ValueError(
            f"scan point budget {scans.xyz.shape[1]} must be divisible by "
            f"mesh size {n} (the ring sweep shards the scan)")
    if key is None:
        key = jax.random.key(cfg.seed)
    F = scans.xyz.shape[0]
    if block > 1 and (F - block) % block != 0:
        raise ValueError(
            f"blocked distributed run needs (F - block) % block == 0, got "
            f"F={F}, block={block}")
    keys = jax.random.split(key, F)
    if priors is not None:
        priors = jnp.asarray(priors, scans.xyz.dtype)
        if priors.shape != (F, 4, 4):
            raise ValueError(
                f"priors must be (F, 4, 4) = ({F}, 4, 4), got {priors.shape}")
    import math
    forget = math.isfinite(cfg.voxel_map.forget_radius)

    if init_map is not None:
        if init_map.capacity != cfg.voxel_map.capacity:
            raise ValueError(
                f"init_map capacity {init_map.capacity} != config capacity "
                f"{cfg.voxel_map.capacity}")
        vm = init_map
    else:
        vm = sharded_map_create(
            mesh, capacity=cfg.voxel_map.capacity,
            voxel_size=cfg.voxel_map.voxel_size,
            max_probes=cfg.voxel_map.max_probes, axis=axis)
    pose0 = (se3_identity(scans.xyz.dtype) if init_pose is None
             else jnp.asarray(init_pose, scans.xyz.dtype))
    fn = _cached_distributed_run(mesh, axis, cfg, bool(use_doppler_prior),
                                 forget, int(block),
                                 bool(use_const_velocity_rot),
                                 has_prior=priors is not None)
    args = (vm, pose0, scans, keys)
    if priors is not None:
        args = args + (priors,)
    vm, raw = fn(*args)
    names = ("world_T", "correction", "velocity", "velocity_valid",
             "fitness", "num_inliers", "submap_points", "iterations")
    return vm, dict(zip(names, raw))


def save_distributed_state(path: str, vm: VoxelHashMap,
                           pose: jnp.ndarray, frame: int = 0) -> None:
    """Checkpoint a distributed run: the sharded map gathers to host npz
    plus the current pose and frame index (utils/checkpoint.py format).
    The reference's only analog is its CSV record/replay fixture
    (src/iterative_closest_point.cpp:188-206); map/pose state there is
    never persisted."""
    from icp4dradar_tpu.utils.checkpoint import save_checkpoint

    save_checkpoint(path, {"map": vm, "pose": jnp.asarray(pose)},
                    metadata={"frame": int(frame),
                              "capacity": int(vm.capacity),
                              "voxel_size": float(vm.voxel_size),
                              "max_probes": int(vm.max_probes)})


def load_distributed_state(path: str, mesh: Mesh, axis: str = "dp"):
    """Restore (sharded VoxelHashMap, pose (4,4), frame index) from a
    save_distributed_state checkpoint, placing the map arrays sharded over
    `mesh` — the mesh size may differ from the one that saved (capacity
    must remain divisible)."""
    from icp4dradar_tpu.mapping.voxel_hash import voxel_map_create
    from icp4dradar_tpu.utils.checkpoint import load_checkpoint

    import numpy as np

    # peek metadata for static fields, then build a structural template
    import json as _json
    f = np.load(path if path.endswith(".npz") else path + ".npz")
    meta = _json.loads(bytes(f["__meta__"]).decode())
    if "capacity" not in meta:
        raise ValueError(
            f"checkpoint {path} has no 'capacity' metadata — not a "
            "save_distributed_state checkpoint (or written by a pre-r4 "
            "version; re-save it)")
    template_vm = voxel_map_create(
        capacity=int(meta["capacity"]),
        voxel_size=meta.get("voxel_size", 0.5),
        max_probes=int(meta.get("max_probes", 8)))
    state, meta = load_checkpoint(
        path, {"map": template_vm, "pose": jnp.eye(4, dtype=jnp.float32)})
    vm_host, pose = state["map"], state["pose"]
    vm_host = template_vm.replace(
        **{k: jnp.asarray(getattr(vm_host, k))
           for k in ("keys", "points", "intensity", "occupied",
                     "stat_n", "stat_sum", "stat_sq")})
    sharding1 = jax.NamedSharding(mesh, P(axis))
    sharding2 = jax.NamedSharding(mesh, P(axis, None))
    vm = jax.tree.map(
        lambda x: jax.device_put(
            jnp.asarray(x), sharding2 if x.ndim == 2 else sharding1),
        vm_host)
    return vm, jnp.asarray(pose), int(meta.get("frame", 0))
