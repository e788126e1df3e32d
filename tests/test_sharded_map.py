"""Spatially-sharded map equals the single-device map (8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icp4dradar_tpu.mapping import voxel_map_create, voxel_map_insert
from icp4dradar_tpu.mapping.voxel_hash import (
    voxel_map_forget_far,
    voxel_map_rehash,
    voxel_map_sector_search_with_stats,
)
from icp4dradar_tpu.parallel import (
    make_mesh,
    sharded_map_create,
    sharded_map_insert,
    sharded_map_rehash,
    sharded_sector_search_with_stats,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def occupied_voxel_dict(m):
    occ = np.asarray(m.occupied) > 0.5
    keys = map(tuple, np.asarray(m.keys)[occ])
    pts = np.asarray(m.points)[occ]
    ns = np.asarray(m.stat_n)[occ]
    return dict(zip(keys, zip(map(tuple, np.round(pts, 5)), ns)))


class TestShardedInsert:
    def test_matches_single_device(self, mesh, rng):
        pts = rng.uniform(-20, 20, (600, 3)).astype(np.float32)
        msk = (rng.uniform(size=600) > 0.1).astype(np.float32)

        ref = voxel_map_create(capacity=1 << 12, voxel_size=0.5)
        ref = voxel_map_insert(ref, jnp.asarray(pts), jnp.asarray(msk))

        sm = sharded_map_create(mesh, capacity=1 << 12, voxel_size=0.5)
        sm = sharded_map_insert(sm, mesh, jnp.asarray(pts), jnp.asarray(msk))

        assert int(sm.num_voxels) == int(ref.num_voxels)
        # identical voxel->(point, count) content (note: hash layout is the
        # same global slot space, so arrays should match exactly)
        assert occupied_voxel_dict(sm) == occupied_voxel_dict(ref)

    def test_incremental_inserts_match(self, mesh, rng):
        a = rng.uniform(-10, 10, (200, 3)).astype(np.float32)
        b = rng.uniform(-10, 10, (200, 3)).astype(np.float32)

        ref = voxel_map_create(capacity=1 << 11, voxel_size=0.5)
        ref = voxel_map_insert(ref, jnp.asarray(a))
        ref = voxel_map_insert(ref, jnp.asarray(b))

        sm = sharded_map_create(mesh, capacity=1 << 11, voxel_size=0.5)
        sm = sharded_map_insert(sm, mesh, jnp.asarray(a))
        sm = sharded_map_insert(sm, mesh, jnp.asarray(b))

        assert occupied_voxel_dict(sm) == occupied_voxel_dict(ref)

    def test_sharded_rehash_matches_single_device(self, mesh, rng):
        """forget-far -> rehash on the sharded map reclaims tombstones and
        lands every live voxel in the same global slot as the single-device
        voxel_map_rehash (identical claim arbitration order)."""
        pts = rng.uniform(-30, 30, (800, 3)).astype(np.float32)

        ref = voxel_map_create(capacity=1 << 12, voxel_size=0.5)
        ref = voxel_map_insert(ref, jnp.asarray(pts))
        ref = voxel_map_forget_far(ref, jnp.zeros(3), 12.0)
        ref = voxel_map_rehash(ref)

        sm = sharded_map_create(mesh, capacity=1 << 12, voxel_size=0.5)
        sm = sharded_map_insert(sm, mesh, jnp.asarray(pts))
        sm = voxel_map_forget_far(sm, jnp.zeros(3), 12.0)  # elementwise
        sm = sharded_map_rehash(sm, mesh)

        # all tombstones released
        tombs = np.sum((np.asarray(sm.keys)[:, 0] != 0x7FFFFFFF)
                       & (np.asarray(sm.occupied) <= 0.5))
        assert tombs == 0
        assert occupied_voxel_dict(sm) == occupied_voxel_dict(ref)
        # slot-exact layout equality (same arbitration order)
        np.testing.assert_array_equal(np.asarray(sm.keys),
                                      np.asarray(ref.keys))

    def test_sharded_sector_query(self, mesh, rng):
        pts = rng.uniform(-15, 15, (400, 3)).astype(np.float32)
        sm = sharded_map_create(mesh, capacity=1 << 11, voxel_size=0.5)
        sm = sharded_map_insert(sm, mesh, jnp.asarray(pts))
        out, m, cnt, means, covs = sharded_sector_search_with_stats(
            sm, mesh, jnp.zeros(3), 30.0, jnp.asarray(0.0), 180.0, 1024
        )
        ref = voxel_map_create(capacity=1 << 11, voxel_size=0.5)
        ref = voxel_map_insert(ref, jnp.asarray(pts))
        _, _, ref_cnt, _, _ = voxel_map_sector_search_with_stats(
            ref, jnp.zeros(3), 30.0, jnp.asarray(0.0), 180.0, 1024
        )
        assert int(cnt) == int(ref_cnt)
        got = set(map(tuple, np.round(np.asarray(out)[np.asarray(m) > 0.5], 4)))
        occ = np.asarray(ref.occupied) > 0.5
        want = set(map(tuple, np.round(np.asarray(ref.points)[occ], 4)))
        assert got == want
