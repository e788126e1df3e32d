"""Odometry + keyframe pose-graph back-end (BASELINE.md measurement
config 4): scan-to-scan front-end, keyframe graph with odometry-chain and
proximity loop-closure factors, batched SE(3) Gauss-Newton refinement —
the subsystem the reference links Ceres for but never runs
(include/radarFactor.hpp, SURVEY.md §3.5).

Flow:
1. vmapped scan-to-scan odometry (models/scan_to_scan.py)
2. keyframes every `keyframe_every` frames; chain factors = composed
   relative transforms between consecutive keyframes (high weight)
3. loop-closure candidates: keyframe pairs spatially near but temporally
   distant under the odometry estimate (fixed top-M budget); each verified
   by ICP between the keyframe scans, gated on fitness
4. distributed-or-local pose-graph GN (graph/, parallel/) over the factors
5. the full trajectory re-anchors rigidly to its segment's refined keyframe
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from icp4dradar_tpu.config import PipelineConfig, PoseGraphConfig
from icp4dradar_tpu.graph import (
    PoseGraph,
    RelPoseFactors,
    optimize_pose_graph_block,
)
from icp4dradar_tpu.io.scan import RadarScan
from icp4dradar_tpu.models.scan_to_scan import run_scan_to_scan
from icp4dradar_tpu.registration.icp import icp_point_to_point


@dataclass
class PoseGraphOdometryResult:
    poses: np.ndarray           # (F,4,4) refined trajectory
    odom_poses: np.ndarray      # (F,4,4) raw odometry trajectory
    keyframe_indices: np.ndarray  # (K,)
    keyframe_poses: np.ndarray  # (K,4,4) refined
    num_loop_closures: int
    cost: float


def _relative_between(odom: np.ndarray, a_idx: np.ndarray,
                      b_idx: np.ndarray) -> np.ndarray:
    """Batched inv(odom[a]) @ odom[b] — the odometry-implied relative
    transform between frame pairs, one einsum instead of a per-pair host
    loop (odom[b] = odom[a] · T_rel[a+1..b], so this equals the composed
    increment product). SE(3) inverse in closed form (Rᵀ, -Rᵀt) — no
    4x4 np.linalg.inv per pair."""
    Ta = odom[a_idx]
    Tb = odom[b_idx]
    Rat = np.swapaxes(Ta[:, :3, :3], -1, -2)
    out = np.tile(np.eye(4, dtype=odom.dtype), (len(a_idx), 1, 1))
    out[:, :3, :3] = np.einsum("kij,kjl->kil", Rat, Tb[:, :3, :3])
    out[:, :3, 3] = np.einsum(
        "kij,kj->ki", Rat, Tb[:, :3, 3] - Ta[:, :3, 3])
    return out


@functools.lru_cache(maxsize=8)
def _jitted_s2s_front_end(cfg: PipelineConfig):
    """One compiled front-end per config — repeated pipeline calls on the
    same shapes (containment re-gate, tests, eval rows) reuse it instead
    of re-dispatching the whole vmapped RANSAC+ICP eagerly."""
    return jax.jit(
        lambda s: run_scan_to_scan(s, cfg, use_doppler_prior=True).world_T)


@functools.lru_cache(maxsize=8)
def _jitted_s2m_front_end(cfg: PipelineConfig, block: int):
    from icp4dradar_tpu.models.scan_to_map import (
        run_scan_to_map,
        run_scan_to_map_blocked,
    )

    if block > 1:
        return jax.jit(lambda s: run_scan_to_map_blocked(
            s, cfg, block=block, use_const_velocity_rot=True)[1].world_T)
    return jax.jit(lambda s: run_scan_to_map(s, cfg)[1].world_T)


@functools.lru_cache(maxsize=8)
def _jitted_structure_miner(cfg: PipelineConfig):
    """Compiled keyframe-to-map structure-factor miner: fresh voxel map
    build + insert + Gaussian classification in ONE dispatch instead of
    dozens of eager ops through the tunnel."""
    from icp4dradar_tpu.graph.structure_factors import (
        build_structure_factors,
    )
    from icp4dradar_tpu.mapping import voxel_map_create, voxel_map_insert
    from icp4dradar_tpu.ops.compaction import mask_compact

    sc = cfg.structure
    N = sc.points_per_keyframe

    def mine(frame_poses, xyz, mask, kf_xyz, kf_mask, kf_R, kf_t):
        world = (jnp.einsum("fij,fnj->fni", frame_poses[:, :3, :3], xyz)
                 + frame_poses[:, None, :3, 3])
        vm = voxel_map_create(capacity=cfg.voxel_map.capacity,
                              voxel_size=cfg.voxel_map.voxel_size)
        # whole-trajectory batch insert: F*N rows feed ~11 scatter/gather
        # ops whose cost is LINEAR in rows (r5); compacting to per-voxel
        # leaders bounds them at half the table (unique voxels can't
        # exceed capacity anyway — overflow would drop in probe pressure)
        rows = world.shape[0] * world.shape[1]
        budget = min(rows, cfg.voxel_map.capacity // 2)
        vm = voxel_map_insert(vm, world.reshape(-1, 3), mask.reshape(-1),
                              leader_budget=budget if budget < rows
                              else None)
        comp, cmask, _ = jax.vmap(
            lambda x, m: mask_compact(x, m, N))(kf_xyz, kf_mask)
        K = kf_xyz.shape[0]
        kf_ids = jnp.repeat(jnp.arange(K, dtype=jnp.int32), N)
        p_world = (jnp.einsum("kij,knj->kni", kf_R, comp)
                   + kf_t[:, None, :]).reshape(-1, 3)
        return build_structure_factors(
            kf_ids, comp.reshape(-1, 3), p_world, cmask.reshape(-1), vm, sc)

    return jax.jit(mine)


@functools.lru_cache(maxsize=8)
def _jitted_loop_icp(icp_cfg):
    from icp4dradar_tpu.registration.icp import icp_point_to_point

    def one(s_xyz, s_mask, t_xyz, t_mask, T0):
        r = icp_point_to_point(s_xyz, t_xyz, s_mask, t_mask,
                               init_transform=T0, cfg=icp_cfg)
        return r.transform, r.gated_fitness, r.inlier_fraction

    return jax.jit(jax.vmap(one))


def run_pose_graph_odometry(
    scans: RadarScan,
    cfg: PipelineConfig = PipelineConfig(),
    keyframe_every: int = 5,
    loop_radius: float = 5.0,
    min_loop_gap: int = 20,
    max_loop_candidates: int = 16,
    loop_gated_fitness_max: float = 0.5,
    loop_min_inlier_fraction: float = 0.3,
    odom_weight: float = 100.0,
    loop_weight: float = 10.0,
    mesh=None,
    front_end: str = "scan_to_scan",
    structure_factors: bool = False,
    loop_residual_gate_t: float = 2.0,
    loop_residual_gate_r_deg: float = 10.0,
    loop_residual_gate_t_per_frame: float = 0.02,
    loop_residual_gate_r_deg_per_frame: float = 0.05,
    inject_loop_factors=None,
) -> PoseGraphOdometryResult:
    """Full pipeline. Pass a `mesh` to run the GN back-end distributed
    (parallel.distributed_optimize_pose_graph); None = single device.

    Wrong-closure containment: after the first optimization, every loop
    factor's relative-pose residual at the REFINED keyframes is checked
    against (loop_residual_gate_t [m], loop_residual_gate_r_deg); factors
    exceeding either gate are dropped and the optimization restarts from
    the odometry keyframes. Huber alone only dampens a bogus closure (a
    10 m fabrication still dragged keyframe ATE 0.8 -> 4.7 m in testing);
    the residual re-gate removes it outright, while legitimate closures —
    whose residuals the optimizer can drive to ~0 — always survive. Set
    gates to inf for the single-pass behavior.

    The gates SCALE WITH THE LOOP SPAN: at the low-weight gating solution
    a legitimate closure's residual approximately equals the odometry
    drift accumulated around the loop, so a fixed 2 m gate would drop
    exactly the long-horizon closures that matter most. The effective
    per-factor gate is `loop_residual_gate_t +
    loop_residual_gate_t_per_frame * |frame_j - frame_i|` (rotation
    analogous) — 0.02 m / 0.05 deg per frame of loop span cover typical
    radar odometry drift rates; tune the per-frame terms to your
    front-end's measured drift, or zero them for fixed gates.

    `inject_loop_factors`: list of (kf_i, kf_j, T_meas (4,4), weight)
    appended UNVERIFIED to the factor set — a fault-injection hook for
    validating the containment path (scripts/eval_suite.py wrong-closure
    row).

    `front_end`: "scan_to_scan" (pairwise ICP, the icp4radar lineage) or
    "scan_to_map" (VGICP map tracking — lower-drift odometry in, loop
    closures + GN absorb the residual long-horizon drift: the full SLAM
    combination the reference's dormant Ceres factors gesture at).

    `structure_factors`: also mine keyframe-to-map line/plane/point factors
    from the voxel map's Gaussians (graph/structure_factors.py) — the
    correspondence stage for the reference's edge/plane functors
    (include/radarFactor.hpp:11-137). These anchor every keyframe against
    shared world structure, so independent per-frame odometry noise averages
    out where between-factors alone (consistent with the odometry by
    construction) cannot move anything."""
    F = scans.xyz.shape[0]
    if front_end == "scan_to_map":
        block = cfg.pose_graph.front_end_block
        if block > 1 and not (F > block and (F - block) % block == 0):
            import warnings

            warnings.warn(
                f"scan_to_map front-end: F={F} does not fit "
                f"pose_graph.front_end_block={block} (needs F > block and "
                f"F % block == 0); falling back to the ~2x-slower per-frame "
                f"path — pad or trim the sequence, or set the block to a "
                f"divisor of F", RuntimeWarning, stacklevel=2)
            block = 0
        odom = np.asarray(_jitted_s2m_front_end(cfg, block)(scans))
    elif front_end == "scan_to_scan":
        odom = np.asarray(_jitted_s2s_front_end(cfg)(scans))
    else:
        raise ValueError(f"unknown front_end: {front_end!r}")

    kf = np.arange(0, F, keyframe_every)
    K = len(kf)
    kf_odom = odom[kf]

    # odometry chain factors between consecutive keyframes — batched
    # relative transforms, no per-keyframe composition loop
    chain_T = (_relative_between(odom, kf[:-1], kf[1:])
               if K > 1 else np.zeros((0, 4, 4), np.float32))
    fi = np.arange(K - 1, dtype=np.int32)
    fj = np.arange(1, K, dtype=np.int32)
    f_T = chain_T.astype(np.float32)
    f_w = np.full(K - 1, odom_weight, np.float32)

    # ---- loop-closure candidates: near in space, far in time ----
    d = np.linalg.norm(
        kf_odom[:, None, :3, 3] - kf_odom[None, :, :3, 3], axis=-1
    )
    gap = np.abs(kf[:, None] - kf[None, :])
    cand = (d < loop_radius) & (gap >= min_loop_gap)
    cand = np.triu(cand, 1)
    pairs = np.argwhere(cand)
    if len(pairs) > max_loop_candidates:
        order = np.argsort(d[pairs[:, 0], pairs[:, 1]])
        pairs = pairs[order[:max_loop_candidates]]

    n_loops = 0
    if len(pairs):
        # verify each candidate with ICP between the keyframe scans,
        # initialized at the odometry-implied relative transform
        src_idx = kf[pairs[:, 1]]
        tgt_idx = kf[pairs[:, 0]]
        init_T = jnp.asarray(_relative_between(odom, tgt_idx, src_idx))
        src = jax.tree.map(lambda x: x[jnp.asarray(src_idx)], scans)
        tgt = jax.tree.map(lambda x: x[jnp.asarray(tgt_idx)], scans)

        # dedicated loop-closure ICP: gated correspondences (partial FoV
        # overlap between revisits) and more iterations than the front-end
        loop_cfg = dataclasses.replace(
            cfg.icp, max_iterations=max(cfg.icp.max_iterations, 30),
            max_correspondence_dist=min(cfg.icp.max_correspondence_dist, 2.0),
            transformation_epsilon=1e-5,
        )

        T_loop, fit, frac = _jitted_loop_icp(loop_cfg)(
            src.xyz, src.mask, tgt.xyz, tgt.mask, init_T)
        T_loop = np.asarray(T_loop)
        fit = np.asarray(fit)
        frac = np.asarray(frac)
        # accept by boolean mask, not a per-candidate Python loop
        acc = ((fit < loop_gated_fitness_max)
               & (frac > loop_min_inlier_fraction))
        n_loops = int(acc.sum())
        fi = np.concatenate([fi, pairs[acc, 0].astype(np.int32)])
        fj = np.concatenate([fj, pairs[acc, 1].astype(np.int32)])
        f_T = np.concatenate([f_T, T_loop[acc].astype(np.float32)])
        f_w = np.concatenate(
            [f_w, np.full(n_loops, loop_weight, np.float32)])

    if inject_loop_factors:
        # fault-injection hook: unverified loop factors straight into the
        # factor set (the containment re-gate below must catch the bad ones)
        for (ki, kj, Tm, wt) in inject_loop_factors:
            fi = np.concatenate([fi, [np.int32(ki)]])
            fj = np.concatenate([fj, [np.int32(kj)]])
            f_T = np.concatenate([f_T, np.asarray(Tm, np.float32)[None]])
            f_w = np.concatenate([f_w, [np.float32(wt)]])
            n_loops += 1

    n_chain = K - 1

    def loop_residuals(kf_poses: np.ndarray):
        """(t_err (L,), r_err_deg (L,)) of the loop factors (entries past
        the chain) at the given keyframe poses."""
        li, lj = fi[n_chain:], fj[n_chain:]
        Tm = f_T[n_chain:]
        rel_ij = _relative_between(kf_poses, li, lj)
        # E = Tm^-1 rel_ij, closed form
        Rmt = np.swapaxes(Tm[:, :3, :3], -1, -2)
        Re = np.einsum("kij,kjl->kil", Rmt, rel_ij[:, :3, :3])
        te = np.einsum("kij,kj->ki", Rmt,
                       rel_ij[:, :3, 3] - Tm[:, :3, 3])
        t_err = np.linalg.norm(te, axis=-1)
        cos = np.clip((np.trace(Re, axis1=-2, axis2=-1) - 1.0) * 0.5,
                      -1.0, 1.0)
        return t_err, np.degrees(np.arccos(cos))

    # frame -> owning-keyframe segment, once (frames before kf[0] can't
    # exist since kf[0] == 0)
    seg = np.searchsorted(kf, np.arange(F), side="right") - 1

    def reanchor(kf_refined: np.ndarray) -> np.ndarray:
        """Re-anchor every frame to its segment's refined keyframe —
        one batched rigid correction per segment, gathered per frame
        (no per-keyframe host loop)."""
        # correction_i = kf_refined[i] @ inv(odom[kf[i]]) via closed-form
        # SE(3) inverse
        anchors = odom[kf]
        Rat = np.swapaxes(anchors[:, :3, :3], -1, -2)
        corr = np.tile(np.eye(4, dtype=odom.dtype), (K, 1, 1))
        corr[:, :3, :3] = np.einsum(
            "kij,kjl->kil", kf_refined[:, :3, :3], Rat)
        corr[:, :3, 3] = kf_refined[:, :3, 3] - np.einsum(
            "kij,kj->ki", corr[:, :3, :3], anchors[:, :3, 3])
        return np.einsum("fij,fjl->fil", corr[seg], odom)

    def mine_structure_factors(frame_poses: np.ndarray,
                               kf_poses: np.ndarray) -> dict:
        """Keyframe-to-map edge/plane factor mining at the given alignment
        (graph/structure_factors.py): all frames insert into a fresh voxel
        map, each keyframe's point budget matches against its Gaussians.
        One cached jit dispatch (_jitted_structure_miner)."""
        sc = cfg.structure
        kf_j = jnp.asarray(kf)
        planes, lines, points = _jitted_structure_miner(cfg)(
            jnp.asarray(frame_poses.astype(np.float32)),
            scans.xyz, scans.mask,
            jnp.take(scans.xyz, kf_j, axis=0),
            jnp.take(scans.mask, kf_j, axis=0),
            jnp.asarray(kf_poses[:, :3, :3].astype(np.float32)),
            jnp.asarray(kf_poses[:, :3, 3].astype(np.float32)))
        out = dict(planes=planes, lines=lines)
        if sc.use_point_factors:
            out["points"] = points
        return out

    def run_rounds(rel, kf_start):
        kf_cur = kf_start
        frames_cur = reanchor(kf_cur)
        cost_out = 0.0
        rounds = cfg.structure.rounds if structure_factors else 1
        for _ in range(rounds):
            struct_factors = (
                mine_structure_factors(frames_cur, kf_cur)
                if structure_factors else {})
            graph = PoseGraph(poses=jnp.asarray(kf_cur), rel=rel,
                              **struct_factors)
            if mesh is not None:
                # O(K) distributed back-end: block-tridiagonal assembly is
                # factor-sharded and psum'd structurally, loop closures ride
                # as replicated low-rank columns; NEVER the dense 36K² psum
                # + O(K³) replicated Cholesky (measured 85% of distributed
                # GN wall-clock at K=256 — docs/PERFORMANCE.md)
                from icp4dradar_tpu.parallel import (
                    distributed_optimize_pose_graph_block,
                )

                graph, cost = distributed_optimize_pose_graph_block(
                    graph, mesh, cfg.pose_graph
                )
            else:
                # block-sparse solver: O(K) in keyframes where the dense
                # 6Kx6K path is O(K^2) memory — equality-tested against it
                # (tests/test_graph.py::TestBlockSolver)
                # optimize_pose_graph_block jits internally (lru-cached
                # per config): eager graph solves cost ~25 ms/op through
                # the tunnel -- measured 21 s steady-state for the
                # 64-frame bag CLI before r4 (docs/PERFORMANCE.md)
                graph, cost = optimize_pose_graph_block(graph,
                                                        cfg.pose_graph)
            kf_cur = np.asarray(graph.poses)
            cost_out = float(cost)
            frames_cur = reanchor(kf_cur)
        return kf_cur, cost_out

    result_cost = 0.0
    kf_refined = kf_odom
    if len(fi):
        if n_loops and (np.isfinite(loop_residual_gate_t)
                        or np.isfinite(loop_residual_gate_r_deg)):
            # wrong-closure containment, GATING PASS: optimize once with
            # every loop factor's weight capped uniformly LOW (chain keeps
            # full information weight). No single closure can dominate, so
            # the solution stays near the chain + the mutually-consistent
            # closure majority; a bogus factor then shows its full residual
            # instead of being satisfied at the legit factors' expense
            # (measured: a confident weight-100 fabrication is driven to
            # ~0 residual by the plain optimize while dragging keyframes
            # meters — gating at that solution removes the WRONG factors).
            # Residuals at the gating solution separate cleanly: legit
            # closures sit at ~odometry drift, fabrications at their
            # fabricated offset.
            w_gate = np.asarray(f_w, np.float32).copy()
            w_gate[n_chain:] = np.minimum(w_gate[n_chain:],
                                          odom_weight * 0.01)
            rel_gate = RelPoseFactors.build(fi, fj, f_T, w_gate)
            graph_g = PoseGraph(poses=jnp.asarray(kf_odom), rel=rel_gate)
            if mesh is not None:
                from icp4dradar_tpu.parallel import (
                    distributed_optimize_pose_graph_block,
                )

                graph_g, _ = distributed_optimize_pose_graph_block(
                    graph_g, mesh, cfg.pose_graph)
            else:
                graph_g, _ = optimize_pose_graph_block(graph_g,
                                                       cfg.pose_graph)
            t_err, r_err = loop_residuals(np.asarray(graph_g.poses))
            # span-scaled gates (see docstring): drift accumulated around a
            # loop grows with its frame span, and the gating solution leaves
            # legit closures sitting at exactly that drift
            gap_l = np.abs(kf[fj[n_chain:]] - kf[fi[n_chain:]]).astype(
                np.float64)
            gate_t = (loop_residual_gate_t
                      + loop_residual_gate_t_per_frame * gap_l)
            gate_r = (loop_residual_gate_r_deg
                      + loop_residual_gate_r_deg_per_frame * gap_l)
            bad = (t_err > gate_t) | (r_err > gate_r)
            if bad.any():
                keep = np.concatenate([np.ones(n_chain, bool), ~bad])
                n_loops = int((~bad).sum())
                fi, fj = fi[keep], fj[keep]
                f_T, f_w = f_T[keep], f_w[keep]

        rel = RelPoseFactors.build(
            np.asarray(fi, np.int32), np.asarray(fj, np.int32),
            np.asarray(f_T, np.float32), np.asarray(f_w, np.float32),
        )
        kf_refined, result_cost = run_rounds(rel, kf_odom)

    poses = reanchor(kf_refined)

    return PoseGraphOdometryResult(
        poses=poses,
        odom_poses=odom,
        keyframe_indices=kf,
        keyframe_poses=kf_refined,
        num_loop_closures=n_loops,
        cost=result_cost,
    )
