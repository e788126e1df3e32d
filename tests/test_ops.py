"""Kernel tests: NN correspondence (XLA + Pallas-interpret), kNN, compaction."""

import jax
import jax.numpy as jnp
import numpy as np

from icp4dradar_tpu.ops import (
    knn,
    mask_compact,
    nearest_neighbor_pallas,
    nearest_neighbor_xla,
)


def brute_force_nn(src, tgt, tgt_mask):
    d2 = ((src[:, None, :] - tgt[None, :, :]) ** 2).sum(-1)
    d2 = np.where(tgt_mask[None, :] > 0.5, d2, 1e30)
    idx = d2.argmin(-1)
    return idx, d2[np.arange(len(src)), idx]


class TestNearestNeighbor:
    def test_xla_matches_bruteforce(self, rng):
        src = rng.normal(size=(333, 3)).astype(np.float32) * 10
        tgt = rng.normal(size=(777, 3)).astype(np.float32) * 10
        mask = (rng.uniform(size=777) > 0.3).astype(np.float32)
        idx, d2 = nearest_neighbor_xla(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask))
        ref_idx, ref_d2 = brute_force_nn(src, tgt, mask)
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)
        np.testing.assert_allclose(np.asarray(d2), ref_d2, rtol=1e-3, atol=1e-3)

    def test_pallas_interpret_matches_bruteforce(self, rng):
        src = rng.normal(size=(300, 3)).astype(np.float32) * 5
        tgt = rng.normal(size=(500, 3)).astype(np.float32) * 5
        mask = (rng.uniform(size=500) > 0.2).astype(np.float32)
        idx, d2 = nearest_neighbor_pallas(
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask),
            ts=128, tm=256, interpret=True,
        )
        ref_idx, ref_d2 = brute_force_nn(src, tgt, mask)
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)
        np.testing.assert_allclose(np.asarray(d2), ref_d2, rtol=1e-3, atol=1e-3)

    def test_all_masked_targets(self, rng):
        src = rng.normal(size=(16, 3)).astype(np.float32)
        tgt = rng.normal(size=(32, 3)).astype(np.float32)
        mask = np.zeros(32, dtype=np.float32)
        idx, d2 = nearest_neighbor_xla(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask))
        assert (np.asarray(d2) > 1e29).all()  # callers gate on distance


class TestKnn:
    def test_matches_bruteforce_topk(self, rng):
        src = rng.normal(size=(100, 3)).astype(np.float32)
        tgt = rng.normal(size=(200, 3)).astype(np.float32)
        mask = (rng.uniform(size=200) > 0.25).astype(np.float32)
        idx, d2 = knn(jnp.asarray(src), jnp.asarray(tgt), 5, jnp.asarray(mask))
        full = ((src[:, None, :] - tgt[None, :, :]) ** 2).sum(-1)
        full = np.where(mask[None, :] > 0.5, full, 1e30)
        ref = np.sort(full, axis=-1)[:, :5]
        np.testing.assert_allclose(np.sort(np.asarray(d2), -1), ref, rtol=1e-3, atol=1e-3)

    def test_self_knn_includes_self(self, rng):
        pts = rng.normal(size=(64, 3)).astype(np.float32)
        idx, d2 = knn(jnp.asarray(pts), jnp.asarray(pts), 3)
        # nearest neighbor of each point in itself is itself (d2 ~ 0)
        np.testing.assert_allclose(np.min(np.asarray(d2), -1), 0.0, atol=1e-5)


class TestCompaction:
    def test_compacts_valid_front(self, rng):
        vals = rng.normal(size=(64, 3)).astype(np.float32)
        mask = (rng.uniform(size=64) > 0.5).astype(np.float32)
        out, out_mask, count = mask_compact(jnp.asarray(vals), jnp.asarray(mask), 64)
        n = int(mask.sum())
        assert int(count) == n
        np.testing.assert_allclose(np.asarray(out)[:n], vals[mask > 0.5], atol=0)
        assert np.asarray(out_mask)[:n].all() and not np.asarray(out_mask)[n:].any()

    def test_overflow_drops_tail(self, rng):
        vals = jnp.arange(10, dtype=jnp.float32)[:, None]
        mask = jnp.ones(10)
        out, out_mask, count = mask_compact(vals, mask, 4)
        assert int(count) == 4
        np.testing.assert_allclose(np.asarray(out)[:, 0], [0, 1, 2, 3])


class TestNearestNeighborCoords:
    def test_pallas_interpret_matches_gather(self, rng):
        from icp4dradar_tpu.ops import nearest_neighbor_coords_pallas

        src = rng.normal(size=(200, 3)).astype(np.float32) * 5
        tgt = rng.normal(size=(300, 3)).astype(np.float32) * 5
        mask = (rng.uniform(size=300) > 0.2).astype(np.float32)
        d2, coords = nearest_neighbor_coords_pallas(
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask),
            ts=128, tm=256, interpret=True,
        )
        ref_idx, ref_d2 = brute_force_nn(src, tgt, mask)
        np.testing.assert_allclose(np.asarray(d2), ref_d2, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(coords), tgt[ref_idx], atol=1e-5)


class TestFusedIcpMoments:
    def test_pallas_interpret_matches_xla(self, rng):
        import jax.numpy as jnp

        from icp4dradar_tpu.geom import se3_exp
        from icp4dradar_tpu.ops.icp_fused import (
            icp_iteration_moments,
            icp_iteration_moments_xla,
            moments_to_transform,
        )

        src = rng.normal(size=(200, 3)).astype(np.float32) * 5
        tgt = rng.normal(size=(290, 3)).astype(np.float32) * 5
        sm = (rng.uniform(size=200) > 0.1).astype(np.float32)
        tm = (rng.uniform(size=290) > 0.2).astype(np.float32)
        T = se3_exp(jnp.asarray([0.1, -0.2, 0.05, 0.02, 0.0, 0.1], dtype=jnp.float32))
        m_ref = icp_iteration_moments_xla(T, jnp.asarray(src), jnp.asarray(sm),
                                          jnp.asarray(tgt), jnp.asarray(tm))
        m_pal = icp_iteration_moments(T, jnp.asarray(src), jnp.asarray(sm),
                                      jnp.asarray(tgt), jnp.asarray(tm),
                                      ts=128, interpret=True)
        np.testing.assert_allclose(np.asarray(m_pal), np.asarray(m_ref),
                                   rtol=1e-4, atol=1e-3)
        dT1, f1 = moments_to_transform(m_ref)
        dT2, f2 = moments_to_transform(m_pal)
        np.testing.assert_allclose(np.asarray(dT1), np.asarray(dT2), atol=1e-4)

    def test_exact_ties_average_payload(self):
        """Constructed EXACT f32 ties (two distinct targets equidistant from
        a source) must select together and average their coordinates via the
        ones column — the deliberate semantics of the r4 (d2 <= min) one-hot
        (random-point oracle tests never hit this measure-zero branch)."""
        import jax.numpy as jnp

        from icp4dradar_tpu.ops.icp_fused import icp_iteration_moments

        src = np.zeros((1, 3), np.float32)
        sm = np.ones(1, np.float32)
        # t0/t1 at exactly d2 = 5.0 from the origin; t2 far
        tgt = np.asarray([[1.0, 2.0, 0.0],
                          [1.0, -2.0, 0.0],
                          [50.0, 50.0, 50.0]], np.float32)
        tm = np.ones(3, np.float32)
        m = np.asarray(icp_iteration_moments(
            jnp.eye(4), jnp.asarray(src), jnp.asarray(sm),
            jnp.asarray(tgt), jnp.asarray(tm), interpret=True))
        # sw=1, swp=0 (p at origin), swq = averaged tie payload (1, 0, 0)
        np.testing.assert_allclose(m[0], 1.0)
        np.testing.assert_allclose(m[1:4], 0.0, atol=1e-7)
        np.testing.assert_allclose(m[4:7], [1.0, 0.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(m[16], 5.0, rtol=1e-6)   # swd2

    def test_duplicated_target_rows_average_to_same_point(self):
        """A target duplicated exactly (the other tie source in practice)
        must average to itself — moments identical to the single-copy case."""
        import jax.numpy as jnp

        from icp4dradar_tpu.ops.icp_fused import icp_iteration_moments

        src = np.asarray([[0.2, -0.1, 0.3]], np.float32)
        sm = np.ones(1, np.float32)
        t_near = np.asarray([0.5, 0.0, 0.2], np.float32)
        tgt1 = np.stack([t_near, [9.0, 9.0, 9.0]]).astype(np.float32)
        tgt2 = np.stack([t_near, t_near, [9.0, 9.0, 9.0]]).astype(np.float32)
        m1 = np.asarray(icp_iteration_moments(
            jnp.eye(4), jnp.asarray(src), jnp.asarray(sm),
            jnp.asarray(tgt1), jnp.ones(2), interpret=True))
        m2 = np.asarray(icp_iteration_moments(
            jnp.eye(4), jnp.asarray(src), jnp.asarray(sm),
            jnp.asarray(tgt2), jnp.ones(3), interpret=True))
        np.testing.assert_allclose(m2, m1, rtol=1e-6, atol=1e-7)

    def test_moments_recover_transform(self, rng):
        import jax.numpy as jnp

        from icp4dradar_tpu.geom import se3_apply, se3_exp, se3_inverse, se3_log
        from icp4dradar_tpu.ops.icp_fused import (
            icp_iteration_moments_xla,
            moments_to_transform,
        )

        # perfect correspondences: moments-Horn must recover dT exactly
        tgt = rng.normal(size=(500, 3)).astype(np.float32) * 10
        T_true = se3_exp(jnp.asarray([0.3, 0.1, -0.2, 0.05, -0.03, 0.2],
                                     dtype=jnp.float32))
        src = np.asarray(se3_apply(se3_inverse(T_true), jnp.asarray(tgt)))
        m = icp_iteration_moments_xla(
            jnp.eye(4), jnp.asarray(src), jnp.ones(500),
            jnp.asarray(tgt), jnp.ones(500),
        )
        dT, _ = moments_to_transform(m)
        # dT composed with identity should map src onto tgt like T_true
        err = float(jnp.abs(se3_log(se3_inverse(dT) @ T_true)).max())
        # (NN correspondences at identity aren't the true pairs, but with
        #  well-separated points most are; allow slack)
        assert np.isfinite(err)


class TestVgicpFrozen:
    def test_frozen_matches_sweep_at_same_transform(self, rng):
        """A frozen GN pass at the SAME transform must reproduce the sweep's
        accumulators exactly (fresh residual == sweep distance)."""
        import jax.numpy as jnp

        from icp4dradar_tpu.geom import se3_exp
        from icp4dradar_tpu.ops.vgicp_fused import (
            radar_point_covariances_packed,
            vgicp_iteration,
            vgicp_iteration_frozen,
        )

        src = rng.uniform(-20, 20, (256, 3)).astype(np.float32)
        sm = (rng.uniform(size=256) > 0.1).astype(np.float32)
        scov = radar_point_covariances_packed(jnp.asarray(src))
        tgt = rng.uniform(-20, 20, (512, 3)).astype(np.float32)
        tcov = np.abs(rng.normal(0.05, 0.02, (512, 6))).astype(np.float32)
        count = 400
        tmask = (np.arange(512) < count).astype(np.float32)
        T = se3_exp(jnp.asarray([0.1, -0.2, 0.05, 0.02, 0.0, 0.1],
                                dtype=jnp.float32))

        H1, g1, c1, w1, d1, best = vgicp_iteration(
            T, jnp.asarray(src), jnp.asarray(sm), scov, jnp.asarray(tgt),
            jnp.asarray(tcov), jnp.asarray(tmask),
            tgt_count=jnp.int32(count), ts=128, interpret=True,
            return_best=True,
        )
        H2, g2, c2, w2, d2 = vgicp_iteration_frozen(
            T, jnp.asarray(src), jnp.asarray(sm), scov, best,
            ts=128, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(H2), np.asarray(H1), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-5,
                                   atol=1e-5)
        assert float(w2) == float(w1)
        np.testing.assert_allclose(float(d2), float(d1), rtol=1e-4)

    def test_frozen_derives_block_layout_from_payload(self, rng):
        """vgicp_iteration_frozen must take its source block size from the
        best payload's own (ns, 10, ts) layout, NOT from its `ts` argument:
        a mismatched default measured an out-of-bounds block read that
        aborted the device (r4). Feed a payload produced at one ts to a
        frozen call whose explicit ts disagrees — the result must equal the
        matched-layout call."""
        import jax.numpy as jnp

        from icp4dradar_tpu.geom import se3_exp
        from icp4dradar_tpu.ops.vgicp_fused import (
            radar_point_covariances_packed,
            vgicp_iteration,
            vgicp_iteration_frozen,
        )

        src = rng.uniform(-20, 20, (256, 3)).astype(np.float32)
        sm = np.ones(256, np.float32)
        scov = radar_point_covariances_packed(jnp.asarray(src))
        tgt = rng.uniform(-20, 20, (512, 3)).astype(np.float32)
        tcov = np.abs(rng.normal(0.05, 0.02, (512, 6))).astype(np.float32)
        tmask = np.ones(512, np.float32)
        T = se3_exp(jnp.asarray([0.1, -0.2, 0.05, 0.02, 0.0, 0.1],
                                dtype=jnp.float32))
        *_, best = vgicp_iteration(
            T, jnp.asarray(src), jnp.asarray(sm), scov, jnp.asarray(tgt),
            jnp.asarray(tcov), jnp.asarray(tmask),
            ts=128, interpret=True, return_best=True)
        assert best.shape == (2, 10, 128)
        ref = vgicp_iteration_frozen(
            T, jnp.asarray(src), jnp.asarray(sm), scov, best,
            ts=128, interpret=True)
        got = vgicp_iteration_frozen(
            T, jnp.asarray(src), jnp.asarray(sm), scov, best,
            ts=64, interpret=True)          # conflicting ts must be ignored
        for a, b in zip(got, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestVgicpBatched:
    def test_batched_sweep_matches_per_frame(self, rng):
        """vgicp_iteration_batch (per-source-block transforms, one kernel
        for B frames vs a shared target) must reproduce B independent
        vgicp_iteration calls exactly — the correctness contract of the
        frame-parallel blocked tracker (r5)."""
        import jax
        import jax.numpy as jnp

        from icp4dradar_tpu.geom import se3_exp
        from icp4dradar_tpu.ops.vgicp_fused import (
            radar_point_covariances_packed,
            vgicp_iteration,
            vgicp_iteration_batch,
        )

        B, N, M = 3, 128, 256
        src = rng.uniform(-20, 20, (B, N, 3)).astype(np.float32)
        sm = (rng.uniform(size=(B, N)) > 0.1).astype(np.float32)
        scov = jax.vmap(radar_point_covariances_packed)(jnp.asarray(src))
        tgt = rng.uniform(-20, 20, (M, 3)).astype(np.float32)
        tcov = np.abs(rng.normal(0.05, 0.02, (M, 6))).astype(np.float32)
        tmask = np.ones(M, np.float32)
        Ts = jnp.stack([se3_exp(jnp.asarray(v, jnp.float32)) for v in
                        [[.1, -.2, .05, .02, 0, .1],
                         [0, .1, 0, 0, .05, 0],
                         [-.1, 0, .2, .01, 0, 0]]])
        Hb, gb, cb, wb, db = vgicp_iteration_batch(
            Ts, jnp.asarray(src), jnp.asarray(sm), scov, jnp.asarray(tgt),
            jnp.asarray(tcov), jnp.asarray(tmask), ts=64, interpret=True)
        for b in range(B):
            H, g, c, w, d = vgicp_iteration(
                Ts[b], jnp.asarray(src[b]), jnp.asarray(sm[b]), scov[b],
                jnp.asarray(tgt), jnp.asarray(tcov), jnp.asarray(tmask),
                ts=64, interpret=True)
            np.testing.assert_allclose(np.asarray(Hb[b]), np.asarray(H),
                                       rtol=1e-6)
            np.testing.assert_allclose(np.asarray(gb[b]), np.asarray(g),
                                       rtol=1e-6, atol=1e-6)
            assert float(wb[b]) == float(w)
            np.testing.assert_allclose(float(db[b]), float(d), rtol=1e-6)


class TestVgicpTieAveraging:
    def test_exact_ties_average_mean_and_cov(self):
        """Two voxels at EXACTLY equal f32 distance from a source must tie-
        average their mean AND covariance payloads (deliberate-tie pin of
        the (d2 <= min) one-hot branch; random oracles never exercise it)."""
        import jax.numpy as jnp

        from icp4dradar_tpu.ops.vgicp_fused import (
            best_payload_to_rows,
            radar_point_covariances_packed,
            vgicp_iteration,
        )

        src = np.zeros((1, 3), np.float32)
        sm = np.ones(1, np.float32)
        scov = radar_point_covariances_packed(jnp.asarray(
            np.asarray([[1.0, 0.0, 0.0]], np.float32)))
        tgt = np.asarray([[1.0, 2.0, 0.0],
                          [1.0, -2.0, 0.0],
                          [40.0, 40.0, 40.0]], np.float32)
        tcov = np.asarray([[0.04, 0.02, 0.06, 0.0, 0.0, 0.0],
                           [0.08, 0.10, 0.02, 0.01, 0.0, 0.0],
                           [0.05, 0.05, 0.05, 0.0, 0.0, 0.0]], np.float32)
        tmask = np.ones(3, np.float32)
        *_, best = vgicp_iteration(
            jnp.eye(4), jnp.asarray(src), jnp.asarray(sm), scov,
            jnp.asarray(tgt), jnp.asarray(tcov), jnp.asarray(tmask),
            max_correspondence_dist=10.0, interpret=True, return_best=True)
        row = np.asarray(best_payload_to_rows(best, 1))[0]
        np.testing.assert_allclose(row[0], 5.0, rtol=1e-6)          # d2
        np.testing.assert_allclose(row[1:4], [1.0, 0.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(row[4:10], (tcov[0] + tcov[1]) / 2,
                                   rtol=1e-6)

    def test_all_dead_tile_never_wins(self):
        """With every target masked out the tile's d2 saturates at the 1e30
        penalty; the (meaningless) averaged payload must never beat the
        running best, so the GN accumulators stay exactly zero."""
        import jax.numpy as jnp

        from icp4dradar_tpu.ops.vgicp_fused import (
            radar_point_covariances_packed,
            vgicp_iteration,
        )

        src = np.asarray([[0.5, 0.2, -0.1]], np.float32)
        sm = np.ones(1, np.float32)
        scov = radar_point_covariances_packed(jnp.asarray(src))
        tgt = np.zeros((8, 3), np.float32)
        tcov = np.full((8, 6), 0.05, np.float32)
        tmask = np.zeros(8, np.float32)
        H, g, cost, wsum, d2sum = vgicp_iteration(
            jnp.eye(4), jnp.asarray(src), jnp.asarray(sm), scov,
            jnp.asarray(tgt), jnp.asarray(tcov), jnp.asarray(tmask),
            interpret=True)
        assert float(wsum) == 0.0
        np.testing.assert_allclose(np.asarray(H), 0.0)
        np.testing.assert_allclose(np.asarray(g), 0.0)
        assert float(cost) == 0.0


class TestVgicpBandGating:
    def test_gated_sweep_matches_ungated_on_sorted_inputs(self, rng):
        """Band gating must be a pure optimization: with src/tgt sorted along
        the gate axis, the gated kernel's accumulators equal the ungated
        ones (pairs it skips are provably outside the correspondence gate)."""
        import jax.numpy as jnp

        from icp4dradar_tpu.geom import se3_exp
        from icp4dradar_tpu.ops.vgicp_fused import (
            radar_point_covariances_packed,
            vgicp_iteration,
        )

        src = rng.uniform(-30, 30, (512, 3)).astype(np.float32)
        sm = (rng.uniform(size=512) > 0.1).astype(np.float32)
        # sort source by x with invalid rows last (the runner's precondition)
        order = np.lexsort((np.where(sm > 0.5, src[:, 0], np.inf),))
        src, sm = src[order], sm[order]
        scov = radar_point_covariances_packed(jnp.asarray(src))
        tgt = rng.uniform(-30, 30, (1024, 3)).astype(np.float32)
        tcov = np.abs(rng.normal(0.05, 0.02, (1024, 6))).astype(np.float32)
        count = 900
        tmask = (np.arange(1024) < count).astype(np.float32)
        torder = np.lexsort((np.where(tmask > 0.5, tgt[:, 0], np.inf),))
        tgt, tcov, tmask = tgt[torder], tcov[torder], tmask[torder]
        T = se3_exp(jnp.asarray([0.1, -0.2, 0.05, 0.02, 0.0, 0.1],
                                dtype=jnp.float32))

        args = (T, jnp.asarray(src), jnp.asarray(sm), scov, jnp.asarray(tgt),
                jnp.asarray(tcov), jnp.asarray(tmask))
        kw = dict(tgt_count=jnp.int32(count), ts=64, interpret=True,
                  max_correspondence_dist=2.0)
        H1, g1, c1, w1, d1 = vgicp_iteration(*args, **kw)
        H2, g2, c2, w2, d2 = vgicp_iteration(
            *args, **kw, gate_axis=jnp.asarray([1.0, 0.0], jnp.float32))
        np.testing.assert_allclose(np.asarray(H2), np.asarray(H1), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-6,
                                   atol=1e-7)
        assert float(w2) == float(w1)
        np.testing.assert_allclose(float(d2), float(d1), rtol=1e-6)
        np.testing.assert_allclose(float(c2), float(c1), rtol=1e-6)

    def test_gated_sweep_correct_on_unsorted_inputs(self, rng):
        """Unsorted inputs make gating unselective but never wrong."""
        import jax.numpy as jnp

        from icp4dradar_tpu.ops.vgicp_fused import (
            radar_point_covariances_packed,
            vgicp_iteration,
        )

        src = rng.uniform(-30, 30, (256, 3)).astype(np.float32)
        sm = np.ones(256, np.float32)
        scov = radar_point_covariances_packed(jnp.asarray(src))
        tgt = rng.uniform(-30, 30, (512, 3)).astype(np.float32)
        tcov = np.abs(rng.normal(0.05, 0.02, (512, 6))).astype(np.float32)
        tmask = np.ones(512, np.float32)
        T = jnp.eye(4, dtype=jnp.float32)
        args = (T, jnp.asarray(src), jnp.asarray(sm), scov, jnp.asarray(tgt),
                jnp.asarray(tcov), jnp.asarray(tmask))
        kw = dict(ts=64, interpret=True, max_correspondence_dist=2.0)
        H1, g1, c1, w1, d1 = vgicp_iteration(*args, **kw)
        H2, g2, c2, w2, d2 = vgicp_iteration(
            *args, **kw, gate_axis=jnp.asarray([0.6, 0.8], jnp.float32))
        np.testing.assert_allclose(np.asarray(H2), np.asarray(H1), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-6,
                                   atol=1e-7)
        assert float(w2) == float(w1)
