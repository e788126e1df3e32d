"""Voxel-hash map property tests vs numpy brute-force oracles (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from icp4dradar_tpu.mapping import (
    VoxelHashMap,
    voxel_map_create,
    voxel_map_delete_box,
    voxel_map_insert,
    voxel_map_radius_search,
    voxel_map_sector_search,
    voxel_map_stencil_neighbors,
)
from icp4dradar_tpu.mapping.voxel_hash import voxel_map_box_search


def oracle_downsample(points, voxel_size):
    """Reference semantics: one point per voxel, nearest to voxel center
    (ikd_Tree.cpp:422-497)."""
    coords = np.floor(points / voxel_size).astype(np.int64)
    center = (coords + 0.5) * voxel_size
    d2 = ((points - center) ** 2).sum(-1)
    best = {}
    for i, c in enumerate(map(tuple, coords)):
        if c not in best or d2[i] < d2[best[c]]:
            best[c] = i
    return {c: points[i] for c, i in best.items()}


class TestInsert:
    def test_downsample_semantics(self, rng):
        pts = rng.uniform(-10, 10, size=(500, 3)).astype(np.float32)
        m = voxel_map_create(capacity=1 << 12, voxel_size=0.5)
        m = voxel_map_insert(m, jnp.asarray(pts))
        oracle = oracle_downsample(pts, 0.5)
        assert int(m.num_voxels) == len(oracle)
        # every stored point equals the oracle's choice for its voxel
        occ = np.asarray(m.occupied) > 0.5
        keys = np.asarray(m.keys)[occ]
        stored = np.asarray(m.points)[occ]
        for k, p in zip(map(tuple, keys), stored):
            np.testing.assert_allclose(p, oracle[k], atol=1e-6)

    def test_incremental_keeps_nearest_center(self):
        m = voxel_map_create(capacity=1 << 8, voxel_size=1.0)
        # first point far from center of voxel (0,0,0); center = (0.5,0.5,0.5)
        p1 = np.array([[0.05, 0.05, 0.05]], np.float32)
        p2 = np.array([[0.45, 0.55, 0.5]], np.float32)  # nearer center
        m = voxel_map_insert(m, jnp.asarray(p1))
        m = voxel_map_insert(m, jnp.asarray(p2))
        assert int(m.num_voxels) == 1
        occ = np.asarray(m.occupied) > 0.5
        np.testing.assert_allclose(np.asarray(m.points)[occ][0], p2[0], atol=1e-6)
        # inserting a worse point leaves the better one in place
        m = voxel_map_insert(m, jnp.asarray(p1))
        occ = np.asarray(m.occupied) > 0.5
        np.testing.assert_allclose(np.asarray(m.points)[occ][0], p2[0], atol=1e-6)

    def test_masked_points_ignored(self, rng):
        pts = rng.uniform(-5, 5, (64, 3)).astype(np.float32)
        mask = np.zeros(64, np.float32)
        mask[:10] = 1.0
        m = voxel_map_create(capacity=1 << 10, voxel_size=0.5)
        m = voxel_map_insert(m, jnp.asarray(pts), jnp.asarray(mask))
        oracle = oracle_downsample(pts[:10], 0.5)
        assert int(m.num_voxels) == len(oracle)

    def test_hash_collision_chains(self, rng):
        # tiny capacity forces heavy probing; all distinct voxels must survive
        pts = (np.arange(48)[:, None] * np.array([1.0, 0.0, 0.0])).astype(np.float32)
        m = voxel_map_create(capacity=64, voxel_size=0.5, max_probes=32)
        m = voxel_map_insert(m, jnp.asarray(pts))
        assert int(m.num_voxels) == 48

    def test_jit_insert(self, rng):
        pts = rng.uniform(-10, 10, (256, 3)).astype(np.float32)
        m = voxel_map_create(capacity=1 << 10, voxel_size=0.5)
        f = jax.jit(voxel_map_insert)
        m2 = f(m, jnp.asarray(pts))
        m3 = voxel_map_insert(m, jnp.asarray(pts))
        assert int(m2.num_voxels) == int(m3.num_voxels)


class TestLeaderBudget:
    def test_budget_above_unique_count_is_identical(self, rng):
        """leader_budget >= distinct voxels must be a pure optimization:
        bit-identical map state vs the unbudgeted insert (r5 — every
        downstream scatter pays O(budget), not O(N))."""
        pts = rng.uniform(-10, 10, size=(600, 3)).astype(np.float32)
        inten = rng.uniform(0, 30, 600).astype(np.float32)
        a = voxel_map_insert(voxel_map_create(capacity=1 << 12),
                             jnp.asarray(pts), intensity=jnp.asarray(inten))
        b = voxel_map_insert(voxel_map_create(capacity=1 << 12),
                             jnp.asarray(pts), intensity=jnp.asarray(inten),
                             leader_budget=1024)
        assert int(a.num_voxels) <= 1024  # precondition: budget not binding
        for fa, fb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))

    def test_budget_overflow_drops_but_stays_consistent(self, rng):
        """A binding budget drops overflow leaders (pressure policy) but
        every stored voxel must still satisfy the downsample semantics and
        the occupied count must equal the kept-leader count."""
        # low load factor so probe-pressure drops can't confound the count
        pts = rng.uniform(-40, 40, size=(4096, 3)).astype(np.float32)
        m = voxel_map_insert(voxel_map_create(capacity=1 << 15),
                             jnp.asarray(pts), leader_budget=256)
        nv = int(m.num_voxels)
        assert 0 < nv <= 256
        oracle = oracle_downsample(pts, 0.5)
        occ = np.asarray(m.occupied) > 0.5
        keys = np.asarray(m.keys)[occ]
        stored = np.asarray(m.points)[occ]
        for k, p in zip(map(tuple, keys), stored):
            np.testing.assert_allclose(p, oracle[k], atol=1e-6)
        # re-inserting the same batch WITHOUT a budget completes the map
        m2 = voxel_map_insert(m, jnp.asarray(pts))
        assert int(m2.num_voxels) == len(oracle)


class TestQueries:
    def setup_map(self, rng, n=800):
        pts = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
        m = voxel_map_create(capacity=1 << 13, voxel_size=0.5)
        m = voxel_map_insert(m, jnp.asarray(pts))
        occ = np.asarray(m.occupied) > 0.5
        stored = np.asarray(m.points)[occ]
        return m, stored

    def test_radius_search_oracle(self, rng):
        m, stored = self.setup_map(rng)
        center = np.array([5.0, -3.0, 1.0], np.float32)
        out, mask, count = voxel_map_radius_search(m, jnp.asarray(center), 15.0, 1024)
        got = np.asarray(out)[np.asarray(mask) > 0.5]
        want = stored[np.linalg.norm(stored - center, axis=-1) < 15.0]
        assert got.shape[0] == want.shape[0] == int(count)
        # same point sets
        got_s = set(map(tuple, np.round(got, 4)))
        want_s = set(map(tuple, np.round(want, 4)))
        assert got_s == want_s

    def test_box_search_oracle(self, rng):
        m, stored = self.setup_map(rng)
        lo = np.array([-10, -10, -10], np.float32)
        hi = np.array([10, 10, 10], np.float32)
        out, mask, count = voxel_map_box_search(m, jnp.asarray(lo), jnp.asarray(hi), 2048)
        want = stored[((stored >= lo) & (stored <= hi)).all(-1)]
        assert int(count) == want.shape[0]

    def test_sector_search_oracle(self, rng):
        m, stored = self.setup_map(rng)
        center = np.zeros(3, np.float32)
        heading, radius, half = 30.0, 25.0, 60.0
        out, mask, count = voxel_map_sector_search(
            m, jnp.asarray(center), radius, jnp.asarray(heading), half, 2048
        )
        delta = stored - center
        d = np.linalg.norm(delta, axis=-1)
        bearing = np.degrees(np.arctan2(delta[:, 1], delta[:, 0]))
        diff = np.abs((bearing - heading + 180) % 360 - 180)
        want = stored[(d < radius) & (diff < half)]
        assert int(count) == want.shape[0]

    def test_sector_wraps_at_180(self, rng):
        m = voxel_map_create(capacity=1 << 8, voxel_size=0.5)
        pts = np.array([[-10.0, 0.2, 0.0], [-10.0, -0.2, 0.0], [10.0, 0.0, 0.0]],
                       np.float32)
        m = voxel_map_insert(m, jnp.asarray(pts))
        out, mask, count = voxel_map_sector_search(
            m, jnp.zeros(3), 20.0, jnp.asarray(179.0), 10.0, 16
        )
        assert int(count) == 2  # both near-180 points, wrap-aware

    def test_stencil_neighbors_finds_points(self, rng):
        m, stored = self.setup_map(rng)
        q = stored[:50] + rng.normal(0, 0.1, (50, 3)).astype(np.float32)
        pts, valid = voxel_map_stencil_neighbors(m, jnp.asarray(q), stencil_radius=1)
        # each query's nearest stored point should be among candidates
        d_all = np.linalg.norm(stored[None] - q[:, None], axis=-1)
        nearest = stored[d_all.argmin(1)]
        got = np.asarray(pts)
        ok = 0
        for i in range(50):
            cand = got[i][np.asarray(valid)[i]]
            if cand.size and np.min(np.linalg.norm(cand - nearest[i], axis=-1)) < 1e-5:
                ok += 1
        assert ok >= 48  # nearest can be outside stencil only for far queries


class TestKnnExact:
    """Whole-map k-NN parity (ikd_Tree.cpp:368-398 Nearest_Search +
    max_dist): VERDICT r1 missing #3 — the radius-1 stencil's reach is
    (1.5 * L); at sparse occupancy it silently returns nothing."""

    def _oracle(self, stored, q, k, max_dist):
        d2 = ((stored[None] - q[:, None]) ** 2).sum(-1)
        d2 = np.where(d2 < max_dist * max_dist, d2, np.inf)
        d2s = np.sort(d2, axis=-1)[:, :k]
        if d2s.shape[1] < k:
            d2s = np.pad(d2s, ((0, 0), (0, k - d2s.shape[1])),
                         constant_values=np.inf)
        return d2s

    def test_sparse_occupancy_beyond_stencil(self):
        from icp4dradar_tpu.mapping import voxel_map_knn, voxel_map_knn_exact

        m = voxel_map_create(capacity=1 << 10, voxel_size=0.5)
        # nearest occupied voxel is ~1.3 m from the query: outside the
        # radius-1 stencil reach (0.75 m), inside max_dist=2.0
        pts = np.array([[1.3, 0.0, 0.0], [0.0, 1.6, 0.0]], np.float32)
        m = voxel_map_insert(m, jnp.asarray(pts))
        q = np.zeros((1, 3), np.float32)
        d2_sten, _ = voxel_map_knn(m, jnp.asarray(q), k=2, stencil_radius=1)
        assert np.all(np.isinf(np.asarray(d2_sten)))  # stencil provably misses
        d2, p = voxel_map_knn_exact(m, jnp.asarray(q), k=2, max_dist=2.0)
        np.testing.assert_allclose(
            np.sqrt(np.asarray(d2)[0]), [1.3, 1.6], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(p)[0, 0], pts[0], atol=1e-6)

    def test_oracle_random_map(self, rng):
        from icp4dradar_tpu.mapping import voxel_map_knn_exact

        pts = rng.uniform(-8, 8, (300, 3)).astype(np.float32)
        m = voxel_map_create(capacity=1 << 12, voxel_size=0.5)
        m = voxel_map_insert(m, jnp.asarray(pts))
        stored = np.asarray(m.points)[np.asarray(m.occupied) > 0.5]
        q = rng.uniform(-9, 9, (64, 3)).astype(np.float32)
        for max_dist in (1.0, 2.0, 3.5):
            d2, p = voxel_map_knn_exact(m, jnp.asarray(q), k=5,
                                        max_dist=max_dist)
            want = self._oracle(stored, q, 5, max_dist)
            np.testing.assert_allclose(np.asarray(d2), want, rtol=1e-4,
                                       atol=1e-5)

    def test_max_dist_gate(self, rng):
        from icp4dradar_tpu.mapping import voxel_map_knn_exact

        m = voxel_map_create(capacity=1 << 8, voxel_size=0.5)
        m = voxel_map_insert(m, jnp.asarray(
            np.array([[3.0, 0.0, 0.0]], np.float32)))
        d2, _ = voxel_map_knn_exact(m, jnp.zeros((1, 3)), k=1, max_dist=2.0)
        assert np.isinf(float(d2[0, 0]))
        d2, _ = voxel_map_knn_exact(m, jnp.zeros((1, 3)), k=1, max_dist=3.5)
        np.testing.assert_allclose(float(d2[0, 0]), 9.0, rtol=1e-5)

    def test_jittable(self, rng):
        from icp4dradar_tpu.mapping import voxel_map_knn_exact

        pts = rng.uniform(-4, 4, (100, 3)).astype(np.float32)
        m = voxel_map_create(capacity=1 << 10, voxel_size=0.5)
        m = voxel_map_insert(m, jnp.asarray(pts))
        q = rng.uniform(-4, 4, (16, 3)).astype(np.float32)
        f = jax.jit(lambda vm, qq: voxel_map_knn_exact(vm, qq, 3, 2.0))
        d2j, pj = f(m, jnp.asarray(q))
        d2e, pe = voxel_map_knn_exact(m, jnp.asarray(q), 3, 2.0)
        np.testing.assert_allclose(np.asarray(d2j), np.asarray(d2e), rtol=1e-6)


class TestDelete:
    def test_delete_box_then_revive(self, rng):
        pts = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
        m = voxel_map_create(capacity=1 << 10, voxel_size=0.5)
        m = voxel_map_insert(m, jnp.asarray(pts))
        n0 = int(m.num_voxels)
        lo, hi = jnp.asarray([-5.0, -5, -5]), jnp.asarray([0.0, 5, 5])
        m = voxel_map_delete_box(m, lo, hi)
        stored = np.asarray(m.points)[np.asarray(m.occupied) > 0.5]
        assert (stored[:, 0] > 0).all()
        assert int(m.num_voxels) < n0
        # re-insert the same points: deleted region repopulates fully
        m = voxel_map_insert(m, jnp.asarray(pts))
        assert int(m.num_voxels) == n0


class TestDeleteApi:
    def test_delete_points(self, rng):
        from icp4dradar_tpu.mapping import voxel_map_delete_points

        pts = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
        m = voxel_map_create(capacity=1 << 10, voxel_size=0.5)
        m = voxel_map_insert(m, jnp.asarray(pts))
        n0 = int(m.num_voxels)
        stored = np.asarray(m.points)[np.asarray(m.occupied) > 0.5]
        kill = stored[:20]
        m = voxel_map_delete_points(m, jnp.asarray(kill))
        assert int(m.num_voxels) == n0 - 20
        # deleted voxels no longer contain the killed points
        left = np.asarray(m.points)[np.asarray(m.occupied) > 0.5]
        for p in kill:
            assert not (np.abs(left - p).max(-1) < 1e-6).any()
        # deleting points not in the map is a no-op
        m2 = voxel_map_delete_points(m, jnp.asarray(kill + 1000.0))
        assert int(m2.num_voxels) == int(m.num_voxels)

    def test_add_box_reverses_delete_box(self, rng):
        from icp4dradar_tpu.mapping import voxel_map_add_box

        pts = rng.uniform(-5, 5, (300, 3)).astype(np.float32)
        m = voxel_map_create(capacity=1 << 10, voxel_size=0.5)
        m = voxel_map_insert(m, jnp.asarray(pts))
        n0 = int(m.num_voxels)
        lo, hi = jnp.asarray([-5.0, -5, -5]), jnp.asarray([0.0, 5, 5])
        m = voxel_map_delete_box(m, lo, hi)
        assert int(m.num_voxels) < n0
        m = voxel_map_add_box(m, lo, hi)
        assert int(m.num_voxels) == n0

    def test_delete_box_acquire_returns_removed(self, rng):
        from icp4dradar_tpu.mapping import voxel_map_delete_box_acquire

        pts = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
        m = voxel_map_create(capacity=1 << 10, voxel_size=0.5)
        m = voxel_map_insert(m, jnp.asarray(pts))
        n0 = int(m.num_voxels)
        lo, hi = jnp.asarray([-5.0, -5, -5]), jnp.asarray([0.0, 5, 5])
        m, removed, mask, count = voxel_map_delete_box_acquire(
            m, lo, hi, out_size=256)
        assert int(count) == n0 - int(m.num_voxels)
        got = np.asarray(removed)[np.asarray(mask) > 0.5]
        assert (got[:, 0] <= 0).all()
        assert len(got) == int(count)


class TestVoxelStats:
    def test_gaussian_matches_oracle(self, rng):
        # many points into few voxels: per-voxel mean/cov match numpy
        pts = rng.uniform(0, 2, (400, 3)).astype(np.float32)  # 4^3 voxels at 0.5
        m = voxel_map_create(capacity=1 << 10, voxel_size=0.5)
        m = voxel_map_insert(m, jnp.asarray(pts))
        coords = np.floor(pts / 0.5).astype(np.int64)
        occ = np.asarray(m.occupied) > 0.5
        keys = np.asarray(m.keys)[occ]
        means = np.asarray(m.voxel_means())[occ]
        covs = np.asarray(m.voxel_covs_packed(min_count=1.0))[occ]
        ns = np.asarray(m.stat_n)[occ]
        for k, mu, c6, n in zip(map(tuple, keys), means, covs, ns):
            sel = (coords == np.asarray(k)).all(-1)
            assert int(n) == sel.sum()
            np.testing.assert_allclose(mu, pts[sel].mean(0), atol=1e-4)
            ref_cov = np.cov(pts[sel].T, bias=True) if sel.sum() > 1 else None
            if sel.sum() >= 3:
                np.testing.assert_allclose(c6[0], ref_cov[0, 0], atol=1e-3)
                np.testing.assert_allclose(c6[3], ref_cov[0, 1], atol=1e-3)

    def test_stats_accumulate_across_inserts(self, rng):
        a = rng.uniform(0, 0.5, (50, 3)).astype(np.float32)
        b = rng.uniform(0, 0.5, (70, 3)).astype(np.float32)
        m = voxel_map_create(capacity=1 << 8, voxel_size=0.5)
        m = voxel_map_insert(m, jnp.asarray(a))
        m = voxel_map_insert(m, jnp.asarray(b))
        occ = np.asarray(m.occupied) > 0.5
        n = np.asarray(m.stat_n)[occ]
        assert int(n.sum()) == 120
        mu = np.asarray(m.voxel_means())[occ][0]
        np.testing.assert_allclose(mu, np.concatenate([a, b]).mean(0), atol=1e-4)

    def test_thin_voxels_isotropic_fallback(self):
        m = voxel_map_create(capacity=1 << 8, voxel_size=0.5)
        m = voxel_map_insert(m, jnp.asarray([[0.1, 0.1, 0.1]], dtype=jnp.float32))
        occ = np.asarray(m.occupied) > 0.5
        c6 = np.asarray(m.voxel_covs_packed(min_count=3.0))[occ][0]
        np.testing.assert_allclose(c6, [0.01, 0.01, 0.01, 0, 0, 0], atol=1e-7)

    def test_sector_search_with_stats(self, rng):
        from icp4dradar_tpu.mapping.voxel_hash import (
            voxel_map_sector_search_with_stats,
        )

        pts = rng.uniform(-10, 10, (300, 3)).astype(np.float32)
        m = voxel_map_create(capacity=1 << 10, voxel_size=0.5)
        m = voxel_map_insert(m, jnp.asarray(pts))
        out, mask, cnt, means, covs = voxel_map_sector_search_with_stats(
            m, jnp.zeros(3), 20.0, jnp.asarray(0.0), 180.0, 512
        )
        assert int(cnt) == int(m.num_voxels)
        got = np.asarray(means)[np.asarray(mask) > 0.5]
        # single-point voxels: mean == stored point
        stored = np.asarray(out)[np.asarray(mask) > 0.5]
        n_per = np.asarray(m.stat_n)[np.asarray(m.occupied) > 0.5]
        if (n_per == 1).all():
            np.testing.assert_allclose(got, stored, atol=1e-5)


class TestForgetFar:
    def test_far_voxels_tombstoned_near_kept(self, rng):
        import jax.numpy as jnp

        from icp4dradar_tpu.mapping import (
            voxel_map_create,
            voxel_map_forget_far,
            voxel_map_insert,
            voxel_map_radius_search,
        )

        vm = voxel_map_create(capacity=1 << 12, voxel_size=0.5)
        near = rng.uniform(-5, 5, (64, 3)).astype(np.float32)
        far = near + np.asarray([200.0, 0, 0], np.float32)
        vm = voxel_map_insert(vm, jnp.asarray(np.concatenate([near, far])))
        n0 = int(vm.num_voxels)
        vm2 = voxel_map_forget_far(vm, jnp.zeros(3), 100.0)
        assert int(vm2.num_voxels) < n0
        # near points all still queryable
        pts, mask, cnt = voxel_map_radius_search(vm2, jnp.zeros(3), 10.0, 256)
        assert int(cnt) > 0
        _, _, cnt_far = voxel_map_radius_search(
            vm2, jnp.asarray([200.0, 0, 0]), 10.0, 256)
        assert int(cnt_far) == 0
        # forgotten voxels revive on re-insert (tombstones keep keys)
        vm3 = voxel_map_insert(vm2, jnp.asarray(far))
        _, _, cnt_re = voxel_map_radius_search(
            vm3, jnp.asarray([200.0, 0, 0]), 10.0, 256)
        assert int(cnt_re) > 0


class TestRehash:
    def test_reclaims_tombstoned_slots(self, rng):
        """Regression (review finding): tombstones keep keys, so without a
        rehash a fully-forgotten table can never host NEW voxels again."""
        import jax.numpy as jnp

        from icp4dradar_tpu.mapping import (
            voxel_map_create,
            voxel_map_forget_far,
            voxel_map_insert,
            voxel_map_rehash,
        )

        vm = voxel_map_create(capacity=1 << 10, voxel_size=0.5, max_probes=8)
        # fill the table from region A
        a = rng.uniform(-8, 8, (4096, 3)).astype(np.float32)
        vm = voxel_map_insert(vm, jnp.asarray(a))
        assert int(vm.num_voxels) > 800
        # forget everything (drive away), then try region B without rehash
        vm_f = voxel_map_forget_far(vm, jnp.asarray([1e4, 0, 0]), 100.0)
        b = rng.uniform(192, 208, (4096, 3)).astype(np.float32)
        stuck = voxel_map_insert(vm_f, jnp.asarray(b))
        rehashed = voxel_map_insert(voxel_map_rehash(vm_f), jnp.asarray(b))
        assert int(rehashed.num_voxels) > 500
        assert int(rehashed.num_voxels) > int(stuck.num_voxels) * 5

    def test_rehash_preserves_live_entries(self, rng):
        import jax.numpy as jnp

        from icp4dradar_tpu.mapping import (
            voxel_map_create,
            voxel_map_delete_box,
            voxel_map_insert,
            voxel_map_radius_search,
            voxel_map_rehash,
        )

        vm = voxel_map_create(capacity=1 << 12, voxel_size=0.5)
        pts = rng.uniform(-10, 10, (512, 3)).astype(np.float32)
        vm = voxel_map_insert(vm, jnp.asarray(pts))
        vm = voxel_map_delete_box(vm, jnp.asarray([-10, -10, -10.0]),
                                  jnp.asarray([0.0, 10, 10]))
        before, _, n_before = voxel_map_radius_search(
            vm, jnp.zeros(3), 20.0, 1024)
        vm2 = voxel_map_rehash(vm)
        after, _, n_after = voxel_map_radius_search(
            vm2, jnp.zeros(3), 20.0, 1024)
        assert int(n_after) == int(n_before)
        sb = set(map(tuple, np.asarray(before)[:int(n_before)].round(4).tolist()))
        sa = set(map(tuple, np.asarray(after)[:int(n_after)].round(4).tolist()))
        assert sa == sb
        # stats survive the move
        np.testing.assert_allclose(float(vm2.stat_n.sum()),
                                   float(vm.stat_n.sum()), rtol=1e-6)

    def test_maybe_rehash_trigger(self, rng):
        import jax.numpy as jnp

        from icp4dradar_tpu.mapping import (
            voxel_map_create,
            voxel_map_forget_far,
            voxel_map_insert,
            voxel_map_maybe_rehash,
        )
        from icp4dradar_tpu.mapping.voxel_hash import _EMPTY

        vm = voxel_map_create(capacity=1 << 10, voxel_size=0.5)
        pts = rng.uniform(-8, 8, (2048, 3)).astype(np.float32)
        vm = voxel_map_insert(vm, jnp.asarray(pts))
        vm = voxel_map_forget_far(vm, jnp.asarray([1e4, 0, 0]), 100.0)
        out = voxel_map_maybe_rehash(vm, 0.1)
        tombs = int(np.sum((np.asarray(out.keys)[:, 0] != _EMPTY)
                           & (np.asarray(out.occupied) <= 0.5)))
        assert tombs == 0        # fired: table rebuilt
        noop = voxel_map_maybe_rehash(vm, 1.5)   # unreachable threshold
        tombs2 = int(np.sum((np.asarray(noop.keys)[:, 0] != _EMPTY)
                            & (np.asarray(noop.occupied) <= 0.5)))
        assert tombs2 > 0        # below threshold: untouched
