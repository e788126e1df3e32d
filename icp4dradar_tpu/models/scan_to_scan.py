"""Scan-to-scan ICP odometry — the `icp4radar` pipeline, TPU-native.

Reference main loop (src/iterative_closest_point.cpp:263-721): read frame k
and k-1, Doppler-RANSAC fit + static/dynamic split + LSQ ego velocity on
both, point-to-point ICP current->last, right-compose pose
`currOdom = currOdom * T_icp` (:552), per-frame velocity/transform records.

Here the whole per-frame step is one jit region, and `run_scan_to_scan`
lax.scans it over a preloaded stacked sequence — the entire trajectory runs
in a single device dispatch (first-class for TPU: no per-frame host
round-trips; SURVEY.md §7 step 3).

Extensions beyond parity (all config-gated, off = reference behavior):
- `use_doppler_prior`: seed ICP with the Doppler ego-velocity translation.
- `use_static_points_only`: register on static points (ref USE_STATIC_POINTS
  flag, :29).
- tracking-health gate (cfg.tracking, same gates as scan-to-map): each
  frame's ICP delta is validated against its own Doppler prediction —
  implausible deltas (fitness, translation, rotation) are REPLACED by the
  prediction before the pose chain composes. The reference composes every
  ICP result blindly (src/iterative_closest_point.cpp:552), so one
  degenerate frame corrupts the whole downstream trajectory; here the gate
  is frame-parallel (it compares ΔT to the per-frame prior, never the
  chain), so it costs one vmapped mask — the associative_scan pose chain
  is untouched. Set all three TrackingConfig gates to inf for
  reference-parity blind composition.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from icp4dradar_tpu.config import PipelineConfig
from icp4dradar_tpu.geom import se3_from_rt, se3_identity
from icp4dradar_tpu.io.scan import RadarScan
from icp4dradar_tpu.preprocess.doppler import (
    fit_sine_ransac,
    lsq_ego_velocity,
    static_dynamic_split,
)
from icp4dradar_tpu.registration.icp import icp_point_to_point


@struct.dataclass
class ScanToScanState:
    world_T: jnp.ndarray     # (4,4) accumulated odometry (ref currOdom/Rtrans,t)
    frame: jnp.ndarray       # () int32
    last_delta: jnp.ndarray  # (4,4) last ACCEPTED frame delta (motion hold
                             # for suspect frames — same containment as the
                             # batch path's last-valid scan)


@struct.dataclass
class ScanToScanOutput:
    """Per-frame record (ref output_result.csv row + velocity/icp dumps)."""

    icp_transform: jnp.ndarray   # (4,4) frame-to-frame
    world_T: jnp.ndarray         # (4,4) pose after this frame
    velocity: jnp.ndarray        # (3,) LSQ ego velocity
    fitness: jnp.ndarray         # () ICP fitness score
    sine_A: jnp.ndarray          # () Doppler model amplitude
    sine_b: jnp.ndarray          # () Doppler model phase
    num_static: jnp.ndarray      # () static point count
    converged: jnp.ndarray       # () bool
    accepted: jnp.ndarray        # () bool — tracking gate verdict (True
                                 # when gates are inf / frame is healthy)


def scan_to_scan_init(dtype=jnp.float32) -> ScanToScanState:
    return ScanToScanState(world_T=se3_identity(dtype), frame=jnp.int32(0),
                           last_delta=se3_identity(dtype))


def _gate_relative(cfg: PipelineConfig, T_icp, init_T, fitness):
    """Frame-parallel tracking gate: validate one ICP delta against its own
    prior (the Doppler prediction, or identity without one). Returns the
    delta to compose (prior if rejected) and the accept flag. Identity
    pass-through when all gates are inf (reference-parity).

    CAVEAT (prior-less callers): with use_doppler_prior=False the prior is
    identity, so legitimate per-frame motion beyond max_correction_t (5 m
    default) or max_correction_rot_deg (25 deg) is rejected and replaced by
    identity — the pose freezes. At default gates that needs >50 m/s ego
    speed at 10 Hz; platforms moving that fast without a Doppler prior must
    widen the gates (or set them inf for reference-parity blind
    composition)."""
    import math

    t = cfg.tracking
    if not (math.isfinite(t.s2s_max_fitness)
            or math.isfinite(t.max_correction_t)
            or math.isfinite(t.max_correction_rot_deg)):
        return T_icp, jnp.asarray(True)
    corr_t = jnp.linalg.norm(T_icp[:3, 3] - init_T[:3, 3])
    dR = init_T[:3, :3].T @ T_icp[:3, :3]
    cos_a = jnp.clip((jnp.trace(dR) - 1.0) * 0.5, -1.0, 1.0)
    corr_r = jnp.degrees(jnp.arccos(cos_a))
    # NOT max_fitness: s2s P2P fitness is ungated mean d^2 (scale ~1-2 on
    # healthy partial-overlap scans; see TrackingConfig.s2s_max_fitness)
    accept = ((fitness < t.s2s_max_fitness) & (corr_t < t.max_correction_t)
              & (corr_r < t.max_correction_rot_deg))
    return jnp.where(accept, T_icp, init_T), accept


def scan_to_scan_step(
    state: ScanToScanState,
    scan_curr: RadarScan,
    scan_prev: RadarScan,
    key: jax.Array,
    cfg: PipelineConfig = PipelineConfig(),
    use_doppler_prior: bool = False,
    use_static_points_only: bool = False,
) -> Tuple[ScanToScanState, ScanToScanOutput]:
    """One odometry step: preprocess + ICP(current -> last) + pose compose."""
    k1, k2 = jax.random.split(key)
    fit_c = fit_sine_ransac(scan_curr, k1, cfg.doppler)
    static_c, _ = static_dynamic_split(scan_curr, fit_c, cfg.doppler)
    velocity, _ = lsq_ego_velocity(scan_curr, static_c)
    fit_p = fit_sine_ransac(scan_prev, k2, cfg.doppler)
    static_p, _ = static_dynamic_split(scan_prev, fit_p, cfg.doppler)

    src_mask = static_c if use_static_points_only else scan_curr.mask
    tgt_mask = static_p if use_static_points_only else scan_prev.mask

    if use_doppler_prior:
        # one frame of ego motion expressed in the previous body frame
        init_T = se3_from_rt(jnp.eye(3, dtype=velocity.dtype), velocity)
    else:
        init_T = se3_identity(velocity.dtype)

    res = icp_point_to_point(
        scan_curr.xyz, scan_prev.xyz, src_mask, tgt_mask,
        init_transform=init_T, cfg=cfg.icp,
    )
    T_rel, accepted = _gate_relative(cfg, res.transform, init_T, res.fitness)
    # Suspect-pair containment, streaming counterpart of the batch path's
    # last-valid scan: a corrupt frame poisons BOTH the ICP delta and its
    # own Doppler velocity, so the prior fallback above is no safer than
    # what it rejects — hold the last ACCEPTED delta instead (motion hold).
    import math as _math
    suspect_gate = float(cfg.tracking.s2s_suspect_fitness)
    if _math.isfinite(suspect_gate):
        suspect = res.fitness > suspect_gate
        T_rel = jnp.where(suspect, state.last_delta, T_rel)
        accepted = accepted & ~suspect
    last_delta = jnp.where(accepted, T_rel, state.last_delta)
    world_T = state.world_T @ T_rel             # right-compose (ref :552)
    new_state = ScanToScanState(world_T=world_T, frame=state.frame + 1,
                                last_delta=last_delta)
    out = ScanToScanOutput(
        icp_transform=T_rel,
        world_T=world_T,
        velocity=velocity,
        fitness=res.fitness,
        sine_A=fit_c.A,
        sine_b=fit_c.b,
        num_static=jnp.sum(static_c),
        converged=res.converged,
        accepted=accepted,
    )
    return new_state, out


def run_scan_to_scan(
    scans: RadarScan,
    cfg: PipelineConfig = PipelineConfig(),
    key: Optional[jax.Array] = None,
    use_doppler_prior: bool = False,
    use_static_points_only: bool = False,
) -> ScanToScanOutput:
    """Run the full sequence in ONE device call.

    `scans` is a stacked RadarScan with leading frame axis (F, ...). Frame 0
    pairs with itself (identity transform — ref behavior for order==0,
    src/iterative_closest_point.cpp:306-310). Returns stacked per-frame
    outputs (F, ...).

    Structure: preprocessing (RANSAC fit + split + velocity) runs ONCE per
    frame as a vmapped batch — the reference recomputes the previous scan's
    fit every frame (:433-467); here each frame's results are reused as the
    pair's target side. Then the sequential ICP + pose chain lax.scans over
    frames.
    """
    if key is None:
        key = jax.random.key(cfg.seed)
    F = scans.xyz.shape[0]
    keys = jax.random.split(key, F)

    # Phase 1: per-frame preprocessing, batched.
    def pp(scan, k):
        fit = fit_sine_ransac(scan, k, cfg.doppler)
        static, _ = static_dynamic_split(scan, fit, cfg.doppler)
        velocity, _ = lsq_ego_velocity(scan, static)
        return fit, static, velocity

    fits, statics, velocities = jax.vmap(pp)(scans, keys)

    prev = jax.tree.map(lambda x: jnp.concatenate([x[:1], x[:-1]], 0), scans)
    statics_prev = jnp.concatenate([statics[:1], statics[:-1]], 0)

    # Phase 2: frame pairs are independent — register ALL pairs in one
    # vmapped batch (the reference's serial frame loop is an artifact of its
    # single-thread design, not a data dependency).
    def register(scan_c, scan_p, static_c, static_p, velocity):
        src_mask = static_c if use_static_points_only else scan_c.mask
        tgt_mask = static_p if use_static_points_only else scan_p.mask
        if use_doppler_prior:
            init_T = se3_from_rt(jnp.eye(3, dtype=velocity.dtype), velocity)
        else:
            init_T = se3_identity(velocity.dtype)
        res = icp_point_to_point(
            scan_c.xyz, scan_p.xyz, src_mask, tgt_mask,
            init_transform=init_T, cfg=cfg.icp,
        )
        # frame-parallel tracking gate: a degenerate registration falls
        # back to the Doppler prediction instead of poisoning the chain
        T_rel, accepted = _gate_relative(cfg, res.transform, init_T,
                                         res.fitness)
        return T_rel, res.fitness, res.converged, accepted

    T_rel, fitness, converged, accepted = jax.vmap(register)(
        scans, prev, statics, statics_prev, velocities
    )
    # frame 0 pairs with itself: exactly identity (ref order==0 behavior) —
    # a prior-seeded ICP can otherwise leave a residual that shifts the
    # whole trajectory's anchor
    T_rel = T_rel.at[0].set(jnp.eye(4, dtype=T_rel.dtype))

    # Suspect-pair containment (TrackingConfig.s2s_suspect_fitness): a
    # corrupt frame (structureless returns) poisons BOTH the ICP delta and
    # its own Doppler velocity, so _gate_relative's prior fallback is no
    # safer than the thing it rejects (measured: prior-fallback gating made
    # a corrupted 512-run WORSE than blind). An unalignable pair shows up
    # as fitness orders of magnitude above healthy (0.03-2 vs 33-1000+);
    # replace such pairs with the last healthy ACCEPTED delta (motion
    # hold) via an associative last-valid scan — stays frame-parallel.
    import math as _math
    suspect_gate = float(cfg.tracking.s2s_suspect_fitness)
    if _math.isfinite(suspect_gate):
        suspect = fitness > suspect_gate
        ok = accepted & ~suspect
        ok = ok.at[0].set(True)                        # identity seed

        def last_ok(a, b):
            aT, aok = a
            bT, bok = b
            return (jnp.where(bok[..., None, None], bT, aT), aok | bok)

        held_T, _ = jax.lax.associative_scan(last_ok, (T_rel, ok))
        T_rel = jnp.where(suspect[:, None, None], held_T, T_rel)
        accepted = accepted & ~suspect

    # Phase 3: pose accumulation T_k = T_1 ... T_k is an associative prefix
    # product — parallel scan instead of a serial chain.
    world_T = jax.lax.associative_scan(jnp.matmul, T_rel)

    return ScanToScanOutput(
        icp_transform=T_rel,
        world_T=world_T,
        velocity=velocities,
        fitness=fitness,
        sine_A=fits.A,
        sine_b=fits.b,
        num_static=jnp.sum(statics, axis=-1),
        converged=converged,
        accepted=accepted,
    )


def run_scan_to_scan_replay(
    scans: RadarScan,
    icp_transforms: jnp.ndarray,
    cfg: PipelineConfig = PipelineConfig(),
    key: Optional[jax.Array] = None,
    recorded_fitness: Optional[jnp.ndarray] = None,
) -> ScanToScanOutput:
    """Re-drive the pipeline from RECORDED frame-to-frame transforms,
    skipping registration — the reference's USE_ICP_RESULT record/replay
    harness (src/iterative_closest_point.cpp:192-206, 523-540: per-frame
    4x4 + score read back from output_result.csv, ICP `align` bypassed,
    everything downstream — pose composition, submaps, outputs — re-runs).

    Preprocessing (Doppler fit / static split / LSQ velocity) still runs —
    in the reference it precedes the bypassed align call — so velocity.txt
    regenerates; transforms compose BLINDLY (no tracking gate: replay must
    reproduce the recorded trajectory bit-for-bit, gated or not).

    `icp_transforms`: (F,4,4) relative transforms (read_result_csv order).
    `recorded_fitness`: optional (F,) recorded scores to carry through."""
    if key is None:
        key = jax.random.key(cfg.seed)
    F = scans.xyz.shape[0]
    keys = jax.random.split(key, F)

    def pp(scan, k):
        fit = fit_sine_ransac(scan, k, cfg.doppler)
        static, _ = static_dynamic_split(scan, fit, cfg.doppler)
        velocity, _ = lsq_ego_velocity(scan, static)
        return fit, static, velocity

    fits, statics, velocities = jax.vmap(pp)(scans, keys)
    T_rel = jnp.asarray(icp_transforms, dtype=scans.xyz.dtype)
    world_T = jax.lax.associative_scan(jnp.matmul, T_rel)
    fitness = (jnp.zeros(F, scans.xyz.dtype) if recorded_fitness is None
               else jnp.asarray(recorded_fitness, scans.xyz.dtype))
    true_f = jnp.ones(F, bool)
    return ScanToScanOutput(
        icp_transform=T_rel,
        world_T=world_T,
        velocity=velocities,
        fitness=fitness,
        sine_A=fits.A,
        sine_b=fits.b,
        num_static=jnp.sum(statics, axis=-1),
        converged=true_f,
        accepted=true_f,
    )
