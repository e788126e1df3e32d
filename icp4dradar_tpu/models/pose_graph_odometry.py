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
) -> PoseGraphOdometryResult:
    """Full pipeline. Pass a `mesh` to run the GN back-end distributed
    (parallel.distributed_optimize_pose_graph); None = single device.

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
        from icp4dradar_tpu.models.scan_to_map import (
            run_scan_to_map,
            run_scan_to_map_blocked,
        )

        block = 8
        if F > block and (F - block) % block == 0:
            _, m_outs = run_scan_to_map_blocked(
                scans, cfg, block=block, use_const_velocity_rot=True)
        else:
            _, m_outs = run_scan_to_map(scans, cfg)
        odom = np.asarray(m_outs.world_T)
    elif front_end == "scan_to_scan":
        outs = run_scan_to_scan(scans, cfg, use_doppler_prior=True)
        odom = np.asarray(outs.world_T)
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

        def one(s, t, T0):
            r = icp_point_to_point(
                s.xyz, t.xyz, s.mask, t.mask, init_transform=T0, cfg=loop_cfg
            )
            return r.transform, r.gated_fitness, r.inlier_fraction

        T_loop, fit, frac = jax.vmap(one)(src, tgt, init_T)
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
        map, each keyframe's point budget matches against its Gaussians."""
        from icp4dradar_tpu.graph.structure_factors import (
            build_structure_factors,
        )
        from icp4dradar_tpu.mapping import voxel_map_create, voxel_map_insert
        from icp4dradar_tpu.ops.compaction import mask_compact

        sc = cfg.structure
        world = (np.einsum("fij,fnj->fni", frame_poses[:, :3, :3],
                           np.asarray(scans.xyz))
                 + frame_poses[:, None, :3, 3])
        vm = voxel_map_create(capacity=cfg.voxel_map.capacity,
                              voxel_size=cfg.voxel_map.voxel_size)
        vm = voxel_map_insert(
            vm, jnp.asarray(world.reshape(-1, 3).astype(np.float32)),
            mask=jnp.asarray(np.asarray(scans.mask).reshape(-1)))

        N = sc.points_per_keyframe
        kf_xyz = jnp.asarray(np.asarray(scans.xyz)[kf])
        kf_mask = jnp.asarray(np.asarray(scans.mask)[kf])
        comp, cmask, _ = jax.vmap(
            lambda x, m: mask_compact(x, m, N))(kf_xyz, kf_mask)
        kf_ids = jnp.repeat(jnp.arange(K, dtype=jnp.int32), N)
        Rk = jnp.asarray(kf_poses[:, :3, :3].astype(np.float32))
        tk = jnp.asarray(kf_poses[:, :3, 3].astype(np.float32))
        p_world = (jnp.einsum("kij,knj->kni", Rk, comp)
                   + tk[:, None, :]).reshape(-1, 3)
        planes, lines, points = build_structure_factors(
            kf_ids, comp.reshape(-1, 3), p_world, cmask.reshape(-1), vm, sc)
        out = dict(planes=planes, lines=lines)
        if sc.use_point_factors:
            out["points"] = points
        return out

    result_cost = 0.0
    kf_refined = kf_odom
    if len(fi):
        rel = RelPoseFactors.build(
            np.asarray(fi, np.int32), np.asarray(fj, np.int32),
            np.asarray(f_T, np.float32), np.asarray(f_w, np.float32),
        )
        frames_cur = odom
        rounds = cfg.structure.rounds if structure_factors else 1
        for _ in range(rounds):
            struct_factors = (
                mine_structure_factors(frames_cur, kf_refined)
                if structure_factors else {})
            graph = PoseGraph(poses=jnp.asarray(kf_refined), rel=rel,
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
                graph, cost = optimize_pose_graph_block(graph, cfg.pose_graph)
            kf_refined = np.asarray(graph.poses)
            result_cost = float(cost)
            frames_cur = reanchor(kf_refined)

    poses = reanchor(kf_refined)

    return PoseGraphOdometryResult(
        poses=poses,
        odom_poses=odom,
        keyframe_indices=kf,
        keyframe_poses=kf_refined,
        num_loop_closures=n_loops,
        cost=result_cost,
    )
