"""Golden-trajectory pipeline tests on synthetic sequences (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icp4dradar_tpu.config import PipelineConfig
from icp4dradar_tpu.io import SyntheticSequence
from icp4dradar_tpu.io.scan import stack_scans
from icp4dradar_tpu.models import (
    SubmapAccumulator,
    run_scan_to_map,
    run_scan_to_scan,
)
from icp4dradar_tpu.utils import ate_rmse


def small_cfg(**over):
    cfg = PipelineConfig().override(**{
        "voxel_map.capacity": 1 << 14,
        "voxel_map.submap_max_points": 1 << 12,
        "icp.max_iterations": 15,
        "gicp.max_iterations": 15,
        **over,
    })
    return cfg


def make_seq(frames=12, **kw):
    defaults = dict(
        # max_points >= in-range landmark count so consecutive scans observe
        # the same landmarks (otherwise subsampling noise dominates p2p ICP)
        num_frames=frames, max_points=2048, num_landmarks=4000,
        world_extent=80.0, max_range=60.0, dynamic_fraction=0.05,
        pos_noise=0.01, speed=1.0, turn_rate=0.03,
    )
    defaults.update(kw)
    return SyntheticSequence(**defaults)


class TestScanToScan:
    def test_trajectory_tracks_gt(self):
        seq = make_seq()
        scans = stack_scans([seq.scan(k) for k in range(len(seq))])
        outs = run_scan_to_scan(scans, small_cfg(), use_doppler_prior=True)
        poses = np.asarray(outs.world_T)
        ate = ate_rmse(poses[:, :3, 3], seq.poses[:, :3, 3], align=False)
        assert ate < 0.5, ate
        # velocities track GT ego velocity
        v_err = [
            np.linalg.norm(np.asarray(outs.velocity[k]) - seq.ego_velocity(k))
            for k in range(1, len(seq))
        ]
        assert np.median(v_err) < 0.15

    def test_frame0_identity(self):
        seq = make_seq(frames=3)
        scans = stack_scans([seq.scan(k) for k in range(3)])
        outs = run_scan_to_scan(scans, small_cfg())
        T0 = np.asarray(outs.icp_transform[0])
        np.testing.assert_allclose(T0, np.eye(4), atol=1e-3)

    def test_jit_caching(self):
        # second call with same shapes should not retrace (smoke: just runs)
        seq = make_seq(frames=4)
        scans = stack_scans([seq.scan(k) for k in range(4)])
        cfg = small_cfg()
        f = jax.jit(lambda s: run_scan_to_scan(s, cfg).world_T)
        a = f(scans)
        b = f(scans)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_tracking_gate_rescues_degenerate_frame(self):
        """A frame whose scan is the previous scan rigidly displaced 30 m
        makes ICP report a confident 30 m jump (low fitness, perfect
        alignment — the degenerate-geometry walk-off class). The gate must
        replace it with the Doppler prediction; blind composition (all
        gates inf, reference parity) must inherit the full jump."""
        seq = make_seq(frames=12)
        scans = stack_scans([seq.scan(k) for k in range(12)])
        bad = 6
        xyz = scans.xyz.at[bad].set(
            scans.xyz[bad - 1] + jnp.asarray([30.0, 0.0, 0.0]))
        corrupt = scans.replace(xyz=xyz, mask=scans.mask.at[bad].set(
            scans.mask[bad - 1]))

        gated = run_scan_to_scan(corrupt, small_cfg(),
                                 use_doppler_prior=True)
        blind = run_scan_to_scan(
            corrupt,
            small_cfg(**{"tracking.max_fitness": float("inf"),
                         "tracking.max_correction_t": float("inf"),
                         "tracking.max_correction_rot_deg": float("inf")}),
            use_doppler_prior=True)

        gt = seq.poses[:, :3, 3]
        ate_g = ate_rmse(np.asarray(gated.world_T)[:, :3, 3], gt, align=False)
        ate_b = ate_rmse(np.asarray(blind.world_T)[:, :3, 3], gt, align=False)
        assert not bool(gated.accepted[bad])
        # two frames fall back to the Doppler prior (the corrupted frame
        # and its successor, which registers AGAINST the corrupted scan) —
        # ~1 m residual vs a 30 m blind jump
        assert ate_g < 2.0, f"gated ATE {ate_g:.2f} m"
        # the blind-composition counterfactual inherits the 30 m jump for a
        # stretch of frames; its exact RMSE depends on how later registrations
        # partially recover, so assert RELATIVE to the gated run (not an
        # absolute magic number — that assertion was measured brittle at 7.95
        # vs a hard-coded 10.0)
        assert ate_b > 2.0 * ate_g and ate_b > 4.0, (
            f"blind ATE should dominate gated: blind {ate_b:.2f} m "
            f"vs gated {ate_g:.2f} m")


class TestVendorProfiles:
    """Dataset-shaped stressors: the pipeline must keep tracking under each
    vendor schema's FoV / dropout / multipath / angular-noise statistics
    (profiles in io/dataset.py::VENDOR_PROFILES; schemas io/formats.py,
    ref src/radar_odometry.cpp:461-572)."""

    @pytest.mark.parametrize("profile", ["coloradar", "oculii"])
    def test_scan_to_map_tracks_under_profile(self, profile):
        seq = make_seq(frames=12, vendor_profile=profile)
        scans = stack_scans([seq.scan(k) for k in range(12)])
        _, outs = run_scan_to_map(scans, small_cfg())
        est = np.asarray(outs.world_T)[:, :3, 3]
        ate = ate_rmse(est, seq.poses[:, :3, 3], align=False)
        assert ate < 1.0, f"{profile}: ATE {ate:.3f} m"

    def test_profile_actually_degrades(self):
        seq_i = make_seq(frames=2)
        seq_v = make_seq(frames=2, vendor_profile="ti_mmwave")
        ideal = seq_i.scan(1)
        deg = seq_v.scan(1)
        # fewer valid points (FoV + range + dropout) and range capped
        assert float(deg.mask.sum()) < 0.8 * float(ideal.mask.sum())
        r = np.linalg.norm(np.asarray(deg.xyz), axis=-1)
        assert r[np.asarray(deg.mask) > 0.5].max() < 31.0

    def test_dynamic_truth_guard(self):
        seq = make_seq(frames=2, vendor_profile="rio")
        with pytest.raises(ValueError):
            seq.dynamic_truth(0)


class TestScanToMap:
    def test_trajectory_tracks_gt(self):
        seq = make_seq(frames=15)
        scans = stack_scans([seq.scan(k) for k in range(len(seq))])
        state, outs = run_scan_to_map(scans, small_cfg())
        poses = np.asarray(outs.world_T)
        ate = ate_rmse(poses[:, :3, 3], seq.poses[:, :3, 3], align=False)
        assert ate < 0.5, ate
        assert int(state.vmap.num_voxels) > 100

    def test_map_grows_then_submap_found(self):
        seq = make_seq(frames=8)
        scans = stack_scans([seq.scan(k) for k in range(8)])
        state, outs = run_scan_to_map(scans, small_cfg())
        # after the first frame, sector submaps are non-empty
        assert (np.asarray(outs.submap_points)[2:] > 50).all()

    def test_knn_gicp_path_with_exact_map_knn(self):
        """The kNN-GICP fallback sourcing submap covariances from the EXACT
        whole-map k-NN (voxel_map_knn_exact consumer; kd-tree
        Nearest_Search semantics, ikd_Tree.cpp:368-398) must track like the
        default submap-local k-NN path."""
        seq = make_seq(frames=10)
        scans = stack_scans([seq.scan(k) for k in range(10)])
        base = small_cfg(**{"gicp.use_vgicp": False})
        exact = small_cfg(**{"gicp.use_vgicp": False,
                             "gicp.use_exact_map_knn": True})
        _, o_base = run_scan_to_map(scans, base)
        _, o_exact = run_scan_to_map(scans, exact)
        gt = seq.poses[:10, :3, 3]
        ate_b = ate_rmse(np.asarray(o_base.world_T)[:, :3, 3], gt,
                         align=False)
        ate_e = ate_rmse(np.asarray(o_exact.world_T)[:, :3, 3], gt,
                         align=False)
        assert np.isfinite(np.asarray(o_exact.world_T)).all()
        assert ate_e < 0.5, f"exact-kNN GICP ATE {ate_e:.3f} m"
        assert ate_e < ate_b + 0.2, (ate_e, ate_b)

    def test_blocked_matches_per_frame(self):
        # amortized map updates (one sector query + one insert per block)
        # must track the same trajectory as per-frame updates
        from icp4dradar_tpu.models import run_scan_to_map_blocked

        seq = make_seq(frames=16)
        scans = stack_scans([seq.scan(k) for k in range(len(seq))])
        cfg = small_cfg()
        _, ref = run_scan_to_map(scans, cfg)
        state, outs = run_scan_to_map_blocked(scans, cfg, block=4)
        poses = np.asarray(outs.world_T)
        assert poses.shape == np.asarray(ref.world_T).shape
        ate = ate_rmse(poses[:, :3, 3], seq.poses[:, :3, 3], align=False)
        assert ate < 0.5, ate
        # close to the per-frame runner (RNG streams differ, so not exact)
        ref_ate = ate_rmse(np.asarray(ref.world_T)[:, :3, 3],
                           seq.poses[:, :3, 3], align=False)
        assert ate < ref_ate + 0.3, (ate, ref_ate)
        assert int(state.vmap.num_voxels) > 100

    def test_blocked_const_velocity_rot_stable(self):
        # the rotation prior must stay stable over a turning trajectory
        # (regression: un-orthonormalized delta rotations fed back into the
        # pose chain exploded to NaN within ~10 frames)
        from icp4dradar_tpu.models import run_scan_to_map_blocked

        seq = make_seq(frames=24, turn_rate=0.05)
        scans = stack_scans([seq.scan(k) for k in range(len(seq))])
        _, outs = run_scan_to_map_blocked(
            scans, small_cfg(), block=4, use_const_velocity_rot=True)
        poses = np.asarray(outs.world_T)
        assert np.isfinite(poses).all()
        ate = ate_rmse(poses[:, :3, 3], seq.poses[:, :3, 3], align=False)
        assert ate < 0.5, ate
        # rotations stay orthonormal through the feedback chain
        R = poses[:, :3, :3]
        err = np.abs(R @ R.transpose(0, 2, 1) - np.eye(3)).max()
        assert err < 1e-4, err

    def test_blocked_band_gating_matches_ungated(self):
        # band gating + the sensor-x scan sort are pure optimizations: the
        # trajectory must match the ungated runner (same RNG stream; only
        # point ORDER differs, which RANSAC sampling sees — allow small slack)
        from icp4dradar_tpu.models import run_scan_to_map_blocked

        seq = make_seq(frames=16)
        scans = stack_scans([seq.scan(k) for k in range(len(seq))])
        cfg = small_cfg()
        _, a = run_scan_to_map_blocked(scans, cfg, block=4,
                                       use_band_gating=False)
        _, b = run_scan_to_map_blocked(scans, cfg, block=4,
                                       use_band_gating=True)
        pa = np.asarray(a.world_T)[:, :3, 3]
        pb = np.asarray(b.world_T)[:, :3, 3]
        assert np.isfinite(pb).all()
        assert np.abs(pa - pb).max() < 0.25, np.abs(pa - pb).max()

    def test_blocked_sequential_fallback_contains_adverse_block(self):
        """When a whole block's registrations look lost (here: a block of
        scans displaced 60 m sideways), the parallel runner's sequential
        fallback must re-track the block per-frame — pose stays finite,
        proper (det 1), and recovers after the outage (r5: without the
        fallback, adverse regimes walked off 8-18 m with collapsed
        rotations)."""
        seq = make_seq(frames=24)
        scans = stack_scans([seq.scan(k) for k in range(len(seq))])
        rng = np.random.default_rng(7)
        xyz = np.asarray(scans.xyz).copy()
        # half a block of structureless junk (interference burst) — the
        # unalignable case: effective fitness must flag it and the
        # fallback's per-frame gates must hold the prior instead
        xyz[12:16] = rng.uniform(-60, 60, xyz[12:16].shape).astype(xyz.dtype)
        scans = scans.replace(xyz=jnp.asarray(xyz))
        from icp4dradar_tpu.models import run_scan_to_map_blocked

        _, outs = run_scan_to_map_blocked(
            scans, small_cfg(), block=8, use_const_velocity_rot=True)
        P = np.asarray(outs.world_T)
        assert np.isfinite(P).all()
        dets = np.linalg.det(P[:, :3, :3])
        np.testing.assert_allclose(dets, 1.0, atol=1e-2)
        err = np.linalg.norm(P[:, :3, 3] - seq.poses[:, :3, 3], axis=1)
        assert err[-3:].max() < 0.6, err   # recovered after the outage

    def test_blocked_bad_shape_raises(self):
        from icp4dradar_tpu.models import run_scan_to_map_blocked

        seq = make_seq(frames=10)
        scans = stack_scans([seq.scan(k) for k in range(10)])
        try:
            run_scan_to_map_blocked(scans, small_cfg(), block=4)
            assert False, "expected ValueError"
        except ValueError:
            pass

    def test_gt_pose_mode_reference_parity(self):
        # feeding GT poses (ref GT-as-mapping-pose coupling) keeps corrections tiny
        seq = make_seq(frames=8)
        scans = stack_scans([seq.scan(k) for k in range(8)])
        state, outs = run_scan_to_map(
            scans, small_cfg(), gt_poses=jnp.asarray(seq.poses),
            insert_before_registration=True,
        )
        corr = np.asarray(outs.correction)
        drift = np.linalg.norm(corr[:, :3, 3], axis=-1)
        assert drift.max() < 0.5


class TestSubmapAccumulator:
    def test_emits_every_n(self, rng):
        acc = SubmapAccumulator(scans_per_submap=5)
        emitted = []
        for k in range(12):
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = [k, 0, 0]
            out = acc.add_frame(T, rng.normal(size=(50, 3)).astype(np.float32))
            if out is not None:
                emitted.append((k, out))
        assert [k for k, _ in emitted] == [4, 9]
        assert emitted[0][1].shape == (250, 3)

    def test_keyframe_local_frame(self, rng):
        # single point at the sensor origin each frame; after window closes,
        # points are expressed relative to the window-opening keyframe
        acc = SubmapAccumulator(scans_per_submap=2)
        T1 = np.eye(4, dtype=np.float32); T1[:3, 3] = [10, 0, 0]
        T2 = np.eye(4, dtype=np.float32); T2[:3, 3] = [20, 0, 0]
        out = None
        for T in (T1, T2):
            out = acc.add_frame(T, np.zeros((1, 3), np.float32))
        # keyframe at window open is identity -> world == local
        np.testing.assert_allclose(out, [[10, 0, 0], [20, 0, 0]], atol=1e-6)


class TestTrackingGate:
    def test_gate_rescues_corrupted_frames(self):
        """Frames whose registration fails (here: scans replaced by junk
        far from the map) must not corrupt the pose or the map — the gate
        keeps the predicted pose and skips insertion, and tracking recovers
        on the next good frame. Ungated (inf) parity mode diverges."""
        from icp4dradar_tpu.config import PipelineConfig

        seq = make_seq(frames=16)
        scans = stack_scans([seq.scan(k) for k in range(len(seq))])
        # corrupt frames 8-9: offset points 60 m sideways (registration
        # against the real map can only produce garbage)
        xyz = np.asarray(scans.xyz).copy()
        xyz[8:10, :, 1] += 60.0
        scans = scans.replace(xyz=jnp.asarray(xyz))

        cfg = small_cfg()                      # finite default gates
        _, outs = run_scan_to_map(scans, cfg)
        P = np.asarray(outs.world_T)
        err = np.linalg.norm(P[:, :3, 3] - seq.poses[:, :3, 3], axis=1)
        assert np.isfinite(P).all()
        # recovered after the outage: final frames back under 0.5 m
        assert err[-3:].max() < 0.5, err

    def test_s2s_motion_hold_contains_corrupt_frames(self):
        """Scan-to-scan suspect-pair containment (TrackingConfig.
        s2s_suspect_fitness): structureless frames poison both the ICP
        delta AND their own Doppler prior, so the containment replaces
        pairs touching them with the last accepted delta (motion hold).
        The held trajectory must beat blind composition, and healthy
        frames must be untouched."""
        seq = make_seq(frames=24)
        scans = stack_scans([seq.scan(k) for k in range(len(seq))])
        rng = np.random.default_rng(3)
        xyz = np.asarray(scans.xyz).copy()
        # frames 10 and 16: structureless garbage (interference burst)
        for b in (10, 16):
            xyz[b] = rng.uniform(-60, 60, xyz[b].shape).astype(xyz.dtype)
        corrupt = scans.replace(xyz=jnp.asarray(xyz))

        cfg = small_cfg()
        blind_cfg = cfg.override(**{
            "tracking.max_correction_t": float("inf"),
            "tracking.max_correction_rot_deg": float("inf"),
            "tracking.s2s_suspect_fitness": float("inf")})
        held = run_scan_to_scan(corrupt, cfg, use_doppler_prior=True)
        blind = run_scan_to_scan(corrupt, blind_cfg, use_doppler_prior=True)
        gt = seq.poses[:, :3, 3]
        ate_held = ate_rmse(np.asarray(held.world_T)[:, :3, 3], gt,
                            align=False)
        ate_blind = ate_rmse(np.asarray(blind.world_T)[:, :3, 3], gt,
                             align=False)
        assert np.isfinite(np.asarray(held.world_T)).all()
        assert ate_held < ate_blind, (ate_held, ate_blind)
        assert ate_held < 1.0, ate_held       # motion hold tracks truth
        # suspect pairs are reported rejected
        acc = np.asarray(held.accepted)
        assert not acc[10] and not acc[11] and not acc[16] and not acc[17]

        # healthy sequence: the detector never fires, so gated == blind
        # exactly (REUSES the two programs compiled above — a third
        # detector-off-but-gates-on config would cost another ~20 s CPU
        # compile for no extra coverage)
        a = run_scan_to_scan(scans, cfg, use_doppler_prior=True)
        b = run_scan_to_scan(scans, blind_cfg, use_doppler_prior=True)
        assert np.asarray(a.accepted).all()
        np.testing.assert_allclose(np.asarray(a.world_T),
                                   np.asarray(b.world_T), atol=1e-6)

    def test_replay_roundtrip_identical_trajectory(self, tmp_path):
        """Record -> replay (ref USE_ICP_RESULT, src/iterative_closest_point
        .cpp:192-206, 523-540): re-driving the pipeline from the recorded
        output_result.csv transforms must reproduce the trajectory exactly
        (composition is blind — no registration, no gate)."""
        from icp4dradar_tpu.models import run_scan_to_scan_replay
        from icp4dradar_tpu.utils import write_result_csv
        from icp4dradar_tpu.utils.trajectory import read_result_csv

        seq = make_seq(frames=8)
        scans = stack_scans([seq.scan(k) for k in range(len(seq))])
        cfg = small_cfg()
        rec = run_scan_to_scan(scans, cfg, use_doppler_prior=True)
        csv = str(tmp_path / "output_result.csv")
        write_result_csv(csv, np.asarray(rec.icp_transform),
                         np.asarray(rec.fitness), np.asarray(rec.sine_A),
                         np.asarray(rec.sine_b))
        _, T_rec, scores, _, _ = read_result_csv(csv)
        rep = run_scan_to_scan_replay(
            scans, jnp.asarray(T_rec, jnp.float32), cfg,
            recorded_fitness=jnp.asarray(scores, jnp.float32))
        # CSV stores %f (6 decimals) — bit-level after the f32 round trip
        np.testing.assert_allclose(np.asarray(rep.world_T),
                                   np.asarray(rec.world_T), atol=1e-4)
        np.testing.assert_allclose(np.asarray(rep.fitness),
                                   np.asarray(rec.fitness), atol=1e-5)
        # velocities regenerate from preprocessing (runs before the
        # bypassed align in the reference loop)
        np.testing.assert_allclose(np.asarray(rep.velocity),
                                   np.asarray(rec.velocity), atol=1e-6)

    def test_step_mode_motion_hold_matches_config(self):
        """scan_to_scan_step must apply the SAME suspect-fitness motion hold
        as the batch path (ADVICE r4: they diverged — step mode fell back to
        the prior, documented as measured-worse-than-blind)."""
        from icp4dradar_tpu.models import scan_to_scan_init, scan_to_scan_step

        seq = make_seq(frames=6)
        scans = [seq.scan(k) for k in range(6)]
        rng = np.random.default_rng(5)
        # frame 4: structureless garbage
        bad = scans[4].replace(xyz=jnp.asarray(
            rng.uniform(-60, 60, np.asarray(scans[4].xyz).shape)
            .astype(np.float32)))
        scans[4] = bad
        cfg = small_cfg()
        key = jax.random.key(0)
        state = scan_to_scan_init()
        deltas, accepts = [], []
        for k in range(1, 6):
            key, sub = jax.random.split(key)
            state, out = scan_to_scan_step(
                state, scans[k], scans[k - 1], sub, cfg,
                use_doppler_prior=True)
            deltas.append(np.asarray(out.icp_transform))
            accepts.append(bool(out.accepted))
        # the pair registering INTO frame 4 is suspect -> held to the last
        # accepted delta, and the state carries that delta forward
        assert not accepts[3]                 # pair (4 <- 3)
        np.testing.assert_allclose(deltas[3], deltas[2], atol=1e-6)

    def test_inf_gates_are_parity_noop(self):
        from icp4dradar_tpu.config import PipelineConfig

        seq = make_seq(frames=10)
        scans = stack_scans([seq.scan(k) for k in range(len(seq))])
        cfg = small_cfg()
        cfg_off = cfg.override(**{
            "tracking.max_fitness": float("inf"),
            "tracking.max_correction_t": float("inf"),
            "tracking.max_correction_rot_deg": float("inf"),
        })
        _, a = run_scan_to_map(scans, cfg)
        _, b = run_scan_to_map(scans, cfg_off)
        # healthy tracking never trips the gate: identical trajectories
        np.testing.assert_allclose(np.asarray(a.world_T),
                                   np.asarray(b.world_T), atol=1e-5)
