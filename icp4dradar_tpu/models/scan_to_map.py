"""Scan-to-map GICP odometry against the voxel-hash map — the
`radar_odometry` pipeline, TPU-native.

Reference main_task (src/radar_odometry.cpp:311-434): REVE ego-velocity
estimate extracts the inlier scan (:328-342); first scan builds the map
(:344-350); each tracked frame transforms the scan to the world frame,
inserts it (:382-390), sector-searches an 80 m +-60 deg submap around the
current position (:392-396), FastGICP-aligns scan vs submap (:399-406), and
left-composes the correction `currOdom = T_gicp * currOdom` (:411-412).

Deliberate change (SURVEY.md §7 "what we do NOT carry over"): the reference
uses the lidar GT pose as the mapping pose (:367-377). Here the pipeline's
own pose tracks the map by default, and registration runs BEFORE insertion
so drift is corrected before it contaminates the map; set
`insert_before_registration=True` (+ feed `gt_pose`) for reference-parity
behavior.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from icp4dradar_tpu.config import PipelineConfig
from icp4dradar_tpu.geom import se3_apply, se3_identity, se3_inverse
from icp4dradar_tpu.geom.so3 import matrix_to_rpy, so3_project
from icp4dradar_tpu.io.scan import RadarScan
from icp4dradar_tpu.mapping import (
    VoxelHashMap,
    voxel_map_create,
    voxel_map_forget_far,
    voxel_map_insert,
    voxel_map_maybe_rehash,
    voxel_map_sector_search,
)
from icp4dradar_tpu.mapping.voxel_hash import voxel_map_sector_search_with_stats
from icp4dradar_tpu.preprocess.reve import estimate_ego_velocity
from icp4dradar_tpu.registration.gicp import GicpResult, gicp_align
from icp4dradar_tpu.registration.vgicp import vgicp_align, vgicp_align_block
from icp4dradar_tpu.ops.vgicp_fused import radar_point_covariances_packed


def _tracking_gate_enabled(cfg: PipelineConfig) -> bool:
    import math

    return (math.isfinite(cfg.tracking.max_fitness)
            or math.isfinite(cfg.tracking.max_correction_t)
            or math.isfinite(cfg.tracking.max_correction_rot_deg))


def _forget_enabled(cfg: PipelineConfig) -> bool:
    import math

    return math.isfinite(cfg.voxel_map.forget_radius)


def _apply_tracking_gate(cfg: PipelineConfig, pose, new_T, fitness,
                         insert_mask):
    """Reject implausible corrections: keep the predicted pose and zero the
    insert mask (a bad registration must not poison the map). Identity when
    both gates are inf (reference-parity blind composition)."""
    if not _tracking_gate_enabled(cfg):
        return new_T, insert_mask, jnp.asarray(True)
    t = cfg.tracking
    corr_t = jnp.linalg.norm(new_T[:3, 3] - pose[:3, 3])
    # rotation-correction angle from the relative rotation's trace (a
    # rotation-first walk-off can keep translation and fitness plausible)
    dR = pose[:3, :3].T @ new_T[:3, :3]
    cos_a = jnp.clip((jnp.trace(dR) - 1.0) * 0.5, -1.0, 1.0)
    corr_r = jnp.degrees(jnp.arccos(cos_a))
    accept = ((fitness < t.max_fitness) & (corr_t < t.max_correction_t)
              & (corr_r < t.max_correction_rot_deg))
    new_T = jnp.where(accept, new_T, pose)
    insert_mask = insert_mask * accept.astype(insert_mask.dtype)
    return new_T, insert_mask, accept


@struct.dataclass
class ScanToMapState:
    world_T: jnp.ndarray        # (4,4) current odometry (ref currOdom)
    vmap: VoxelHashMap


@struct.dataclass
class ScanToMapOutput:
    world_T: jnp.ndarray        # (4,4) pose after this frame
    correction: jnp.ndarray     # (4,4) GICP correction transform
    velocity: jnp.ndarray       # (3,) REVE ego velocity
    velocity_sigma: jnp.ndarray # (3,)
    velocity_valid: jnp.ndarray # () bool
    fitness: jnp.ndarray        # () GICP fitness
    num_inliers: jnp.ndarray    # () inlier point count
    submap_points: jnp.ndarray  # () sector submap size
    iterations: jnp.ndarray     # () GN sweeps the registration ran
    insert_mask: jnp.ndarray    # (N,) gated inlier mask actually inserted
                                # (REVE inliers x tracking-gate accept) —
                                # the accumulation ring must reuse it, NOT
                                # scan.mask (raw masks readmit the ghosts/
                                # dynamics REVE filtered)


def scan_to_map_init(cfg: PipelineConfig = PipelineConfig(), dtype=jnp.float32) -> ScanToMapState:
    vm = voxel_map_create(
        capacity=cfg.voxel_map.capacity,
        voxel_size=cfg.voxel_map.voxel_size,
        max_probes=cfg.voxel_map.max_probes,
        dtype=dtype,
    )
    return ScanToMapState(world_T=se3_identity(dtype), vmap=vm)


def scan_to_map_step(
    state: ScanToMapState,
    scan: RadarScan,
    key: jax.Array,
    cfg: PipelineConfig = PipelineConfig(),
    gt_pose: Optional[jnp.ndarray] = None,
    insert_before_registration: bool = False,
    use_doppler_prior: bool = False,
    prior_delta: Optional[jnp.ndarray] = None,
    aux_world_xyz: Optional[jnp.ndarray] = None,
    aux_mask: Optional[jnp.ndarray] = None,
    insert_override: Optional[Tuple[jnp.ndarray, jnp.ndarray,
                                    jnp.ndarray]] = None,
) -> Tuple[ScanToMapState, ScanToMapOutput]:
    """One tracked frame. Empty map (first frame) degenerates to an identity
    correction and seeds the map — no special-casing needed.

    `prior_delta` (4,4): body-frame motion prior for this frame (e.g. the
    IMU rotation from preprocess.imu.imu_prior_deltas), composed into the
    predicted pose before registration.

    `aux_world_xyz` (A,3) + `aux_mask` (A,): extra WORLD-frame points used
    for registration only — the multi-frame accumulation path for sparse
    vendors (cfg.accumulate_scans): previous scans at their refined poses
    re-join the current frame's GN through the predicted pose, multiplying
    the constraint count of a TI-class 41-pt scan. CRITICAL: aux points
    must NOT already be in the map — a point registering against its own
    voxel contributes a zero residual rigidly attached to the prediction,
    turning the window into a stay-at-prediction prior that drowns the real
    constraints (measured 0.95 -> 18 m ATE on ti_mmwave, r5). Pair with
    `insert_override` so insertion lags the accumulation window.

    `insert_override` (xyz_world (N,3), mask, intensity): insert THESE
    points instead of the current corrected scan (the delayed-insertion
    half of accumulation — the oldest window entry enters the map as the
    newest enters the window). On an empty map the current scan still
    seeds it (the window has not filled yet)."""
    vmcfg = cfg.voxel_map
    est = estimate_ego_velocity(scan, key, cfg.reve)
    inlier_mask = est.inlier_mask

    pose = state.world_T if gt_pose is None else gt_pose
    if prior_delta is not None and gt_pose is None:
        has_map_p = state.vmap.num_voxels > 0
        pose = jnp.where(has_map_p, pose @ prior_delta, pose)
    if use_doppler_prior and gt_pose is None:
        # advance the pose by one frame of Doppler ego motion before
        # registration (velocity is in the body frame) — but only once the
        # map exists: the first scan must seed the map at the initial pose
        has_map = state.vmap.num_voxels > 0
        delta_t = pose[:3, :3] @ est.velocity
        pose = pose.at[:3, 3].add(
            jnp.where(est.valid & has_map, delta_t, jnp.zeros_like(delta_t))
        )

    world_pts = se3_apply(pose, scan.xyz)
    vmap = state.vmap
    if insert_before_registration:
        vmap = voxel_map_insert(vmap, world_pts, inlier_mask, scan.intensity)

    heading = matrix_to_rpy(pose[:3, :3])[2]
    reg_xyz, reg_mask = scan.xyz, inlier_mask
    if aux_world_xyz is not None:
        # past scans re-expressed in the CURRENT predicted sensor frame:
        # exact at the prediction, and the residual correction (~cm) only
        # perturbs them by its own magnitude — well inside the 2 m gate
        aux_sensor = se3_apply(se3_inverse(pose), aux_world_xyz)
        reg_xyz = jnp.concatenate([scan.xyz, aux_sensor], axis=0)
        am = (jnp.ones(aux_world_xyz.shape[0], inlier_mask.dtype)
              if aux_mask is None else aux_mask.astype(inlier_mask.dtype))
        reg_mask = jnp.concatenate([inlier_mask, am], axis=0)
    if cfg.gicp.use_vgicp:
        # register the sensor-frame scan against the voxel distribution map
        # (fused VGICP kernel); the refined pose comes out directly
        submap, submask, sub_n, sub_mean, sub_cov = (
            voxel_map_sector_search_with_stats(
                vmap, pose[:3, 3], vmcfg.sector_radius, heading,
                vmcfg.sector_half_angle_deg, vmcfg.submap_max_points,
                min_count=vmcfg.stats_min_count,
                fallback_var=vmcfg.stats_fallback_var,
            )
        )
        src_cov6 = radar_point_covariances_packed(
            reg_xyz, cfg.gicp.sigma_range, cfg.gicp.sigma_azimuth,
            cfg.gicp.sigma_elevation,
        )
        g = vgicp_align(
            reg_xyz, sub_mean, sub_cov, reg_mask, submask,
            src_cov6=src_cov6, init_transform=pose, cfg=cfg.gicp,
            tgt_count=sub_n,
        )
        new_T = g.transform
    else:
        submap, submask, sub_n = voxel_map_sector_search(
            vmap, pose[:3, 3], vmcfg.sector_radius, heading,
            vmcfg.sector_half_angle_deg, vmcfg.submap_max_points,
        )
        tgt_cov = None
        if cfg.gicp.use_exact_map_knn:
            # whole-map exact k-NN neighborhoods for the submap's
            # covariances (kd-tree Nearest_Search semantics incl. the
            # 2.0 m gate) — removes the sector-edge truncation of
            # submap-local k-NN; see GicpConfig.use_exact_map_knn
            from icp4dradar_tpu.mapping import voxel_map_knn_exact
            from icp4dradar_tpu.registration.gicp import (
                covariances_from_neighbors,
            )

            d2n, pn = voxel_map_knn_exact(
                vmap, submap, cfg.gicp.k_correspondences,
                max_dist=cfg.gicp.max_correspondence_dist)
            tgt_cov = covariances_from_neighbors(
                submap, pn, jnp.isfinite(d2n), cfg.gicp.cov_epsilon)
        reg_world = world_pts
        if aux_world_xyz is not None:
            reg_world = jnp.concatenate([world_pts, aux_world_xyz], axis=0)
        g = gicp_align(reg_world, submap, reg_mask, submask,
                       cfg=cfg.gicp, tgt_cov=tgt_cov)
        new_T = g.transform @ pose              # left-compose (ref :412)

    insert_mask = inlier_mask
    new_T, insert_mask, _ = _apply_tracking_gate(
        cfg, pose, new_T, g.fitness, insert_mask)
    correction = new_T @ se3_inverse(pose)
    if not insert_before_registration:
        if insert_override is not None:
            ow, om, oi = insert_override
            vmap = voxel_map_insert(vmap, ow, om, oi)
            # seed: while the delayed window fills, an empty map would
            # leave nothing to register against — frame 0 inserts directly
            corrected = se3_apply(new_T, scan.xyz)
            seed = (state.vmap.num_voxels == 0).astype(insert_mask.dtype)
            vmap = voxel_map_insert(vmap, corrected, insert_mask * seed,
                                    scan.intensity)
        else:
            corrected = se3_apply(new_T, scan.xyz)
            vmap = voxel_map_insert(vmap, corrected, insert_mask,
                                    scan.intensity)
    if _forget_enabled(cfg):
        vmap = voxel_map_forget_far(vmap, new_T[:3, 3], vmcfg.forget_radius)
        vmap = voxel_map_maybe_rehash(vmap, vmcfg.rehash_tombstone_fraction)

    new_state = ScanToMapState(world_T=new_T, vmap=vmap)
    out = ScanToMapOutput(
        world_T=new_T,
        correction=correction,
        velocity=est.velocity,
        velocity_sigma=est.sigma,
        velocity_valid=est.valid,
        fitness=g.fitness,
        num_inliers=jnp.sum(inlier_mask),
        submap_points=sub_n,
        iterations=g.iterations,
        insert_mask=insert_mask,
    )
    return new_state, out


def run_scan_to_map(
    scans: RadarScan,
    cfg: PipelineConfig = PipelineConfig(),
    key: Optional[jax.Array] = None,
    gt_poses: Optional[jnp.ndarray] = None,
    insert_before_registration: bool = False,
    use_doppler_prior: bool = True,
    prior_deltas: Optional[jnp.ndarray] = None,
    use_const_velocity_rot: bool = False,
    init_state: Optional[ScanToMapState] = None,
) -> Tuple[ScanToMapState, ScanToMapOutput]:
    """lax.scan the tracked-frame step over a stacked sequence (F, ...) in
    one device call. Returns (final state incl. the built map, stacked
    per-frame outputs). `prior_deltas` (F,4,4): optional per-frame body
    motion priors (see preprocess.imu). `use_const_velocity_rot`: predict
    each frame's heading change from the previous frame's refined body
    delta (rotation only — translation stays with the measured Doppler
    prior), cutting GN sweeps on turning trajectories. `init_state`:
    continue tracking from an existing {pose, map} (micro-batched
    streaming, resume) instead of a fresh map."""
    if key is None:
        key = jax.random.key(cfg.seed)
    F = scans.xyz.shape[0]
    keys = jax.random.split(key, F)

    accum = max(int(cfg.accumulate_scans), 1)
    NP = scans.xyz.shape[1]

    def step(carry, inp):
        state, prev_rot, ring = carry
        scan, k = inp[0], inp[1]
        rest = inp[2:]
        gt = rest[0] if gt_poses is not None else None
        pd = rest[-1] if prior_deltas is not None else None
        if use_const_velocity_rot and pd is None:
            pd = prev_rot
        if ring is not None:
            # window = the last (k-1) refined-but-not-yet-inserted scans;
            # they register as extra constraints while the OLDEST entry is
            # what enters the map this frame (delayed insertion keeps the
            # window out of the map — see scan_to_map_step's aux caveat)
            ring_w, ring_m, ring_i = ring
            aux_w = ring_w.reshape(-1, 3)
            aux_m = ring_m.reshape(-1)
            override = (ring_w[0], ring_m[0], ring_i[0])
        else:
            aux_w = aux_m = override = None
        new_state, out = scan_to_map_step(
            state, scan, k, cfg, gt_pose=gt,
            insert_before_registration=insert_before_registration,
            use_doppler_prior=use_doppler_prior,
            prior_delta=pd,
            aux_world_xyz=aux_w, aux_mask=aux_m,
            insert_override=override,
        )
        delta = se3_inverse(state.world_T) @ new_state.world_T
        new_rot = jnp.eye(4, dtype=delta.dtype).at[:3, :3].set(
            so3_project(delta[:3, :3]))
        if ring is not None:
            # push this frame's refined world points, shift the inserted
            # oldest out; the GATED inlier mask rides along (raw scan.mask
            # would readmit the ghosts/dynamics REVE filtered)
            w = se3_apply(new_state.world_T, scan.xyz)
            ring = (jnp.concatenate([ring_w[1:], w[None]], axis=0),
                    jnp.concatenate([ring_m[1:], out.insert_mask[None]],
                                    axis=0),
                    jnp.concatenate([ring_i[1:], scan.intensity[None]],
                                    axis=0))
        return (new_state, new_rot, ring), out

    inputs = [scans, keys]
    if gt_poses is not None:
        inputs.append(gt_poses)
    if prior_deltas is not None:
        inputs.append(jnp.asarray(prior_deltas))
    ring0 = None
    if accum > 1:
        ring0 = (jnp.zeros((accum - 1, NP, 3), scans.xyz.dtype),
                 jnp.zeros((accum - 1, NP), scans.mask.dtype),
                 jnp.zeros((accum - 1, NP), scans.xyz.dtype))
    init = (init_state if init_state is not None
            else scan_to_map_init(cfg, scans.xyz.dtype),
            jnp.eye(4, dtype=scans.xyz.dtype), ring0)
    (state, _, _), outs = jax.lax.scan(step, init, tuple(inputs))
    return state, outs


def _sort_scans_by_sensor_x(scans: RadarScan) -> RadarScan:
    """Reorder every scan's points by sensor-frame x (invalid rows last).

    Point order inside a RadarScan is contractually meaningless (masks ride
    along), but sorted order makes each 512-point source block of the fused
    VGICP kernel occupy a narrow band along the forward axis — the
    precondition for band gating (ops/vgicp_fused.py). ONE batched sort for
    the whole sequence; every downstream stage is order-invariant."""
    def one(xyz, dop, inten, mask):
        key = jnp.where(mask > 0.5, xyz[:, 0],
                        jnp.asarray(jnp.inf, xyz.dtype))
        _, xs, ys, zs, d, it, m = jax.lax.sort(
            (key, xyz[:, 0], xyz[:, 1], xyz[:, 2], dop, inten, mask),
            num_keys=1)
        return jnp.stack([xs, ys, zs], axis=-1), d, it, m

    xyz, dop, inten, mask = jax.vmap(one)(
        scans.xyz, scans.doppler, scans.intensity, scans.mask)
    return scans.replace(xyz=xyz, doppler=dop, intensity=inten, mask=mask)


def _sort_submap_by_axis(sub_mean, sub_cov, submask, axis2):
    """Sort compacted submap rows by their projection onto `axis2` (2,);
    invalid rows keep +inf keys so front-packed count gating stays valid."""
    u = jnp.where(submask > 0.5,
                  sub_mean[:, 0] * axis2[0] + sub_mean[:, 1] * axis2[1],
                  jnp.asarray(jnp.inf, sub_mean.dtype))
    parts = jax.lax.sort(
        (u, sub_mean[:, 0], sub_mean[:, 1], sub_mean[:, 2],
         sub_cov[:, 0], sub_cov[:, 1], sub_cov[:, 2], sub_cov[:, 3],
         sub_cov[:, 4], sub_cov[:, 5], submask),
        num_keys=1)
    mean_s = jnp.stack(parts[1:4], axis=-1)
    cov_s = jnp.stack(parts[4:10], axis=-1)
    return mean_s, cov_s, parts[10]


def run_scan_to_map_blocked(
    scans: RadarScan,
    cfg: PipelineConfig = PipelineConfig(),
    key: Optional[jax.Array] = None,
    block: int = 4,
    use_doppler_prior: bool = True,
    prior_deltas: Optional[jnp.ndarray] = None,
    use_const_velocity_rot: bool = False,
    use_band_gating: bool = True,
    parallel_frames: bool = True,
    init_state: Optional[ScanToMapState] = None,
    rigid_union: bool = False,
    sequential_fallback: bool = True,
) -> Tuple[ScanToMapState, ScanToMapOutput]:
    """Scan-to-map tracking with map updates amortized over `block` frames.

    `sequential_fallback` (default on): when any frame of a parallel block
    looks lost after the joint GN (effective fitness above the tracking
    gate — includes the matched-weight loss signal), the whole block
    re-tracks SEQUENTIALLY inside a lax.cond: healthy blocks never pay it,
    adverse blocks (sparse TI-class scans, dynamic-heavy scenes — measured
    walk-offs to 8-18 m without it) get the r4 path's per-frame correction
    chaining. Set False under vmap (run_scan_to_map_batch does): a vmapped
    lax.cond executes BOTH branches, which would make serving pay the
    sequential path always.

    `rigid_union` (sparse-vendor mitigation, cfg-driven via
    run_odometry --accumulate): register each block's scans as ONE rigid
    cloud — every scan pre-transformed into the block-end sensor frame
    through the prior chain, a single GN correction shared by the whole
    block. A TI-class 41-pt scan underconstrains 6-DoF GN; the union gives
    the solver block * 41 constraints while each scan still registers
    exactly once against a map that never contains it (no self-anchoring —
    the failure mode that sank per-frame window accumulation, measured
    0.95 -> 4-18 m ATE in r5). Trajectory within a block is piecewise-rigid
    (prior-shaped), which at radar frame rates is well under the sparse
    regime's noise floor.

    On TPU every gather/scatter/sort has a large FIXED cost, so the per-frame
    map work (sector query ~1 ms, insert ~2 ms) dominates the tracked-frame
    step while the registration itself is ~2 ms. This runner performs ONE
    sector query and ONE batched insert per `block` frames: frames inside a
    block register against a submap frozen at the block start, and their
    corrected world points are inserted together afterwards.

    `parallel_frames` (default, r5): predict every pose in the block by
    chaining the motion priors from the block-start pose, then register ALL
    frames in one joint frame-parallel GN (vgicp_align_block — one fused
    kernel sweep per GN iteration for the whole block). Corrections are
    absolute against the shared frozen submap, so within-block prior drift
    (bounded by `block` frames of prior error, well inside the 2 m gate)
    does not compound. False keeps the r4 sequential inner scan (each frame
    seeds the next prediction with its own correction) — measurably slower:
    the per-frame GN while_loop paid ~0.08 ms/iteration of orchestration.

    Map staleness is bounded by `block` frames of motion — negligible against
    the 80 m sector radius (src/radar_odometry.cpp:36) at radar frame rates.
    The first `block` frames run the exact per-frame step to bootstrap the
    map. Requires (F - block) % block == 0; use run_scan_to_map otherwise.
    """
    if key is None:
        key = jax.random.key(cfg.seed)
    F = scans.xyz.shape[0]
    if block <= 1 or (init_state is None and F <= block):
        return run_scan_to_map(
            scans, cfg, key=key, use_doppler_prior=use_doppler_prior,
            prior_deltas=prior_deltas,
            use_const_velocity_rot=use_const_velocity_rot,
            init_state=init_state)
    if init_state is not None:
        # continuation (micro-batched streaming): the map is already warm —
        # every frame runs blocked, no bootstrap; cv-rot re-seeds from
        # identity for the first block (one block of slightly-wider priors)
        if F % block != 0:
            raise ValueError(
                f"run_scan_to_map_blocked with init_state needs "
                f"F % block == 0, got F={F}, block={block}")
        F0 = 0
    elif (F - block) % block != 0:
        raise ValueError(
            f"run_scan_to_map_blocked needs (F - block) % block == 0, got "
            f"F={F}, block={block}")
    else:
        F0 = block                     # warmup frames (per-frame updates)
    vmcfg = cfg.voxel_map
    nblocks = (F - F0) // block
    kwarm, kblocks = jax.random.split(key)
    if use_band_gating:
        # band gating precondition: source blocks must occupy narrow bands
        # along the forward axis (one batched sort for the whole sequence)
        scans = _sort_scans_by_sensor_x(scans)

    if F0 > 0:
        warm_scans = jax.tree.map(lambda x: x[:F0], scans)
        warm_pd = (None if prior_deltas is None
                   else jnp.asarray(prior_deltas)[:F0])
        state, warm_outs = run_scan_to_map(
            warm_scans, cfg, key=kwarm, use_doppler_prior=use_doppler_prior,
            prior_deltas=warm_pd,
            use_const_velocity_rot=use_const_velocity_rot)
        warm_delta = se3_inverse(warm_outs.world_T[-2]) @ warm_outs.world_T[-1]
        prev_rot0 = jnp.eye(4, dtype=scans.xyz.dtype).at[:3, :3].set(
            so3_project(warm_delta[:3, :3]))
    else:
        state, warm_outs = init_state, None
        prev_rot0 = jnp.eye(4, dtype=scans.xyz.dtype)

    rest = jax.tree.map(
        lambda x: x[F0:].reshape((nblocks, block) + x.shape[1:]), scans)
    keys_flat = jax.random.split(kblocks, nblocks * block)
    rest_pd = (None if prior_deltas is None else
               jnp.asarray(prior_deltas)[F0:].reshape(nblocks, block, 4, 4))

    # Frame-parallel precompute — REVE ego velocity and the measurement-model
    # scan covariances depend only on the raw scan, never on the pose chain,
    # so ONE vmapped dispatch replaces (F - F0) sequential evaluations inside
    # the scan (the per-frame runner can't do this; the frozen-submap design
    # makes preprocessing embarrassingly parallel again).
    rest_flat = jax.tree.map(lambda x: x[F0:], scans)
    est_all = jax.vmap(
        lambda s, k: estimate_ego_velocity(s, k, cfg.reve)
    )(rest_flat, keys_flat)
    est_blocks = jax.tree.map(
        lambda x: x.reshape((nblocks, block) + x.shape[1:]), est_all)
    NP = scans.xyz.shape[1]
    cov_blocks = radar_point_covariances_packed(
        rest_flat.xyz.reshape(-1, 3), cfg.gicp.sigma_range,
        cfg.gicp.sigma_azimuth, cfg.gicp.sigma_elevation,
    ).reshape(nblocks, block, NP, 6)

    def frame_step(carry, inp):
        """Register one frame against the frozen block submap; emit the
        corrected world points for the deferred insert."""
        pose, prev_rot, frozen = carry
        sub_mean, sub_cov, submask, sub_n, axis2 = frozen
        scan, est, src_cov6 = inp[0], inp[1], inp[2]
        pd = inp[3] if rest_pd is not None else None
        pose_in = pose
        if pd is not None:
            pose = pose @ pd
        elif use_const_velocity_rot:
            pose = pose @ prev_rot
        if use_doppler_prior:
            pose = pose.at[:3, 3].add(jnp.where(
                est.valid, pose[:3, :3] @ est.velocity,
                jnp.zeros_like(est.velocity)))
        g = vgicp_align(
            scan.xyz, sub_mean, sub_cov, est.inlier_mask, submask,
            src_cov6=src_cov6, init_transform=pose, cfg=cfg.gicp,
            tgt_count=sub_n, gate_axis=axis2)
        new_T = g.transform
        insert_mask = est.inlier_mask
        new_T, insert_mask, _ = _apply_tracking_gate(
            cfg, pose, new_T, g.fitness, insert_mask)
        delta = se3_inverse(pose_in) @ new_T
        new_rot = jnp.eye(4, dtype=delta.dtype).at[:3, :3].set(
            so3_project(delta[:3, :3]))
        world_pts = se3_apply(new_T, scan.xyz)
        out = ScanToMapOutput(
            world_T=new_T,
            correction=new_T @ se3_inverse(pose),
            velocity=est.velocity,
            velocity_sigma=est.sigma,
            velocity_valid=est.valid,
            fitness=g.fitness,
            num_inliers=jnp.sum(est.inlier_mask),
            submap_points=sub_n,
            iterations=g.iterations,
            insert_mask=insert_mask,
        )
        return (new_T, new_rot, frozen), (out, world_pts, insert_mask,
                                          scan.intensity)

    def block_step(carry, inp):
        state, prev_rot, held_vel, has_vel = carry
        scans_b, est_b, cov_b = inp[0], inp[1], inp[2]
        # velocity hold (r5): frames whose REVE estimate is invalid
        # (interference bursts, unalignable scans) dead-reckon on the LAST
        # valid ego velocity instead of freezing — a frozen prediction
        # falls 1 frame of motion behind per dropped frame and exits the
        # correspondence gate for good (measured: a 4-frame outage left a
        # permanent 4 m offset). Constant-velocity is exactly the platform
        # assumption the reference's 100 Hz loop makes implicitly.
        vels, valids = [], []
        hv, hb = held_vel, has_vel
        for k in range(block):
            hv = jnp.where(est_b.valid[k], est_b.velocity[k], hv)
            hb = hb | est_b.valid[k]
            vels.append(hv)
            valids.append(hb)
        est_b = est_b.replace(velocity=jnp.stack(vels),
                              valid=jnp.stack(valids))
        held_vel, has_vel = hv, hb
        pose0 = state.world_T
        heading = matrix_to_rpy(pose0[:3, :3])[2]
        _, submask, sub_n, sub_mean, sub_cov = (
            voxel_map_sector_search_with_stats(
                state.vmap, pose0[:3, 3], vmcfg.sector_radius, heading,
                vmcfg.sector_half_angle_deg, vmcfg.submap_max_points,
                min_count=vmcfg.stats_min_count,
                fallback_var=vmcfg.stats_fallback_var,
            )
        )
        if use_band_gating:
            # sort the frozen submap by the block-start forward axis; within
            # a block the heading drifts by at most `block` frames of motion,
            # so per-frame bands stay tight against these tiles
            hrad = heading * (jnp.pi / 180.0)
            axis2 = jnp.stack([jnp.cos(hrad), jnp.sin(hrad)])
            sub_mean, sub_cov, submask = _sort_submap_by_axis(
                sub_mean, sub_cov, submask, axis2)
        else:
            axis2 = None
        if parallel_frames:
            # predict every pose in the block by chaining priors from the
            # refined block-start pose (unrolled — `block` is static);
            # corrections below are absolute vs the shared frozen submap,
            # so prior drift inside the block does not compound
            pd_b = inp[3] if rest_pd is not None else None
            preds = []
            pose = pose0
            for k in range(block):
                if pd_b is not None:
                    pose = pose @ pd_b[k]
                elif use_const_velocity_rot:
                    pose = pose @ prev_rot
                if use_doppler_prior:
                    dt_k = pose[:3, :3] @ est_b.velocity[k]
                    pose = pose.at[:3, 3].add(jnp.where(
                        est_b.valid[k], dt_k, jnp.zeros_like(dt_k)))
                preds.append(pose)
            preds = jnp.stack(preds)
            if rigid_union:
                # one rigid cloud in the block-END sensor frame: scan i
                # rides at rel_i = inv(pred_last) @ pred_i, so the single
                # correction the GN finds applies to every frame's
                # prediction
                pred_last = preds[-1]
                inv_last = se3_inverse(pred_last)
                rels = jax.vmap(lambda p: inv_last @ p)(preds)
                union = jax.vmap(se3_apply)(rels, scans_b.xyz)
                NPb = scans_b.xyz.shape[1]
                gu = vgicp_align(
                    union.reshape(block * NPb, 3), sub_mean, sub_cov,
                    est_b.inlier_mask.reshape(-1), submask,
                    src_cov6=cov_b.reshape(block * NPb, 6),
                    init_transform=pred_last, cfg=cfg.gicp,
                    tgt_count=sub_n, gate_axis=axis2)
                corr = gu.transform @ inv_last
                allT = jax.vmap(lambda p: corr @ p)(preds)
                g = GicpResult(
                    transform=allT,
                    converged=jnp.broadcast_to(gu.converged, (block,)),
                    fitness=jnp.broadcast_to(gu.fitness, (block,)),
                    iterations=jnp.broadcast_to(gu.iterations, (block,)))
            else:
                g, wsum = vgicp_align_block(
                    scans_b.xyz, sub_mean, sub_cov, est_b.inlier_mask,
                    submask, cov_b, preds, cfg=cfg.gicp, tgt_count=sub_n,
                    gate_axis=axis2)
                # a frame whose prediction drifted past the correspondence
                # gate matches nothing and reports fitness 0 — fold the
                # matched fraction into an EFFECTIVE fitness so both the
                # fallback predicate and the tracking gate see the failure
                nval = jnp.maximum(jnp.sum(est_b.inlier_mask, axis=-1), 1.0)
                lost = (wsum / nval) < 0.25
                g = g.replace(fitness=jnp.where(
                    lost, jnp.asarray(1e6, g.fitness.dtype), g.fitness))

            def parallel_done(_):
                new_T, masks, _ = jax.vmap(
                    lambda p, t, f, m: _apply_tracking_gate(cfg, p, t, f, m)
                )(preds, g.transform, g.fitness, est_b.inlier_mask)
                world_pts = jax.vmap(se3_apply)(new_T, scans_b.xyz)
                outs = ScanToMapOutput(
                    world_T=new_T,
                    correction=jax.vmap(
                        lambda t, p: t @ se3_inverse(p))(new_T, preds),
                    velocity=est_b.velocity,
                    velocity_sigma=est_b.sigma,
                    velocity_valid=est_b.valid,
                    fitness=g.fitness,
                    num_inliers=jnp.sum(est_b.inlier_mask, axis=-1),
                    submap_points=jnp.broadcast_to(sub_n, (block,)),
                    iterations=g.iterations,
                    insert_mask=masks,
                )
                pose = new_T[-1]
                # cv-rot seed for the next block from the last two
                # CORRECTED poses (both ends refined — tighter than the
                # sequential path's prior-inclusive delta)
                blk_delta = se3_inverse(new_T[-2]) @ new_T[-1]
                pr = jnp.eye(4, dtype=blk_delta.dtype).at[:3, :3].set(
                    so3_project(blk_delta[:3, :3]))
                return (pose, pr, outs, world_pts, masks,
                        scans_b.intensity)

            def sequential_retrack(_):
                # adverse-regime fallback (r5): block-long prior chains can
                # drift past the correspondence gate (sparse TI-class scans,
                # dynamic-heavy scenes), where the joint GN matches nothing
                # and the one-shot re-chained salvage can only re-lock one
                # frame per pass (measured: 0.7 -> 8-18 m ATE walk-offs).
                # Re-track the WHOLE block sequentially — each frame's
                # prediction is one prior step from the previous frame's
                # CORRECTION, the property that keeps the r4 path stable.
                frame_in = [scans_b, est_b, cov_b]
                if rest_pd is not None:
                    frame_in.append(inp[3])
                (pose, pr, _), (outs_s, wpts, masks_s, intens_s) = (
                    jax.lax.scan(
                        frame_step,
                        (pose0, prev_rot,
                         (sub_mean, sub_cov, submask, sub_n, axis2)),
                        tuple(frame_in)))
                return pose, pr, outs_s, wpts, masks_s, intens_s

            if sequential_fallback and not rigid_union:
                healthy = jnp.all((g.fitness < cfg.tracking.max_fitness)
                                  & jnp.isfinite(g.fitness))
                pose, prev_rot, outs, world_pts, masks, intens = (
                    jax.lax.cond(healthy, parallel_done,
                                 sequential_retrack, None))
            else:
                pose, prev_rot, outs, world_pts, masks, intens = (
                    parallel_done(None))
        else:
            frame_in = [scans_b, est_b, cov_b]
            if rest_pd is not None:
                frame_in.append(inp[3])
            (pose, prev_rot, _), (outs, world_pts, masks, intens) = (
                jax.lax.scan(
                    frame_step,
                    (pose0, prev_rot,
                     (sub_mean, sub_cov, submask, sub_n, axis2)),
                    tuple(frame_in)))
        lb = vmcfg.block_insert_leader_budget
        vmap = voxel_map_insert(
            state.vmap,
            world_pts.reshape(-1, 3),
            masks.reshape(-1),
            intens.reshape(-1),
            leader_budget=lb if lb > 0 else None,
        )
        if _forget_enabled(cfg):
            vmap = voxel_map_forget_far(vmap, pose[:3, 3],
                                        vmcfg.forget_radius)
            # reclaim slots once tombstones pile up — without this the
            # table's keys fill permanently and new territory stops
            # inserting (tombstones preserve probe chains by design)
            vmap = voxel_map_maybe_rehash(
                vmap, vmcfg.rehash_tombstone_fraction)
        return (ScanToMapState(world_T=pose, vmap=vmap), prev_rot,
                held_vel, has_vel), outs

    block_in = [rest, est_blocks, cov_blocks]
    if rest_pd is not None:
        block_in.append(rest_pd)
    (state, _, _, _), blk_outs = jax.lax.scan(
        block_step,
        (state, prev_rot0, jnp.zeros(3, scans.xyz.dtype),
         jnp.asarray(False)),
        tuple(block_in))
    blk_outs = jax.tree.map(
        lambda x: x.reshape((nblocks * block,) + x.shape[2:]), blk_outs)
    if warm_outs is None:
        return state, blk_outs
    outs = jax.tree.map(
        lambda a, b: jnp.concatenate([a, b], axis=0), warm_outs, blk_outs)
    return state, outs


def run_scan_to_map_batch(
    scans: RadarScan,
    cfg: PipelineConfig = PipelineConfig(),
    key: Optional[jax.Array] = None,
    block: int = 0,
    **kwargs,
) -> Tuple[ScanToMapState, ScanToMapOutput]:
    """Track B independent sequences at once: `scans` has a leading batch
    axis (B, F, ...), each sequence gets its own map, and every per-frame
    stage (insert, sector query, fused VGICP) runs batched on the one chip.

    Sequential map updates bound single-sequence latency; batching is how a
    serving deployment recovers chip throughput (the multi-chip counterpart
    shards sequences across the mesh, parallel/batch.py). Map memory is
    ~18 MB/sequence at the default 2^18 capacity. `block` > 1 vmaps the
    blocked runner (amortized map updates) instead of the per-frame one."""
    if key is None:
        key = jax.random.key(cfg.seed)
    B = scans.xyz.shape[0]
    keys = jax.random.split(key, B)
    if block > 1:
        # a vmapped lax.cond runs BOTH branches, so the blocked runner's
        # sequential fallback would execute for every block of every
        # stream; serving assumes benign dense streams and disables it
        kwargs.setdefault("sequential_fallback", False)
        return jax.vmap(
            lambda s, k: run_scan_to_map_blocked(s, cfg, key=k, block=block,
                                                 **kwargs)
        )(scans, keys)
    return jax.vmap(
        lambda s, k: run_scan_to_map(s, cfg, key=k, **kwargs)
    )(scans, keys)
