"""Data-parallel scan processing: shard stacked scan batches over the mesh
and run preprocessing / pairwise registration with one program per device
(SURVEY.md §2: "data-parallel scan batches" — replaces nothing in the
single-threaded reference; this is the throughput path for offline
reprocessing of long sequences)."""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from icp4dradar_tpu.config import PipelineConfig
from icp4dradar_tpu.io.scan import RadarScan
from icp4dradar_tpu.preprocess.reve import estimate_ego_velocity
from icp4dradar_tpu.registration.icp import icp_point_to_point


def shard_scan_batch(scans: RadarScan, mesh: Mesh, axis: str = "dp") -> RadarScan:
    """Place a stacked (F, ...) RadarScan with the frame axis sharded."""
    def put(x):
        spec = P(axis) if x.ndim >= 1 and x.shape[0] == scans.xyz.shape[0] else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, scans)


def batched_preprocess(
    scans: RadarScan,
    key: jax.Array,
    mesh: Mesh,
    cfg: PipelineConfig = PipelineConfig(),
    axis: str = "dp",
):
    """REVE ego-velocity over a sharded scan batch: one vmapped program per
    device, no cross-device communication (embarrassingly parallel)."""
    F = scans.xyz.shape[0]
    keys = jax.random.split(key, F)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(axis), scans), P(axis)),
        out_specs=jax.tree.map(lambda _: P(axis),
                               jax.eval_shape(lambda s, k: jax.vmap(
                                   lambda sc, kk: estimate_ego_velocity(sc, kk, cfg.reve)
                               )(s, k), scans, keys)),
    )
    def run(scan_shard, key_shard):
        return jax.vmap(lambda s, k: estimate_ego_velocity(s, k, cfg.reve))(
            scan_shard, key_shard
        )

    return run(scans, keys)


def batched_icp_pairs(
    src_scans: RadarScan,
    tgt_scans: RadarScan,
    mesh: Mesh,
    cfg: PipelineConfig = PipelineConfig(),
    axis: str = "dp",
) -> jnp.ndarray:
    """Register F independent scan pairs across the mesh; returns (F,4,4).

    The building block for parallel odometry re-linearization: pairwise
    ICP results feed RelPoseFactors for the distributed pose graph."""

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(axis), src_scans),
                  jax.tree.map(lambda _: P(axis), tgt_scans)),
        out_specs=P(axis),
        # ICP's while_loop carries a replicated-constant init; disable the
        # varying-manual-axes check rather than threading pvary through it
        check_vma=False,
    )
    def run(src_shard, tgt_shard):
        def one(src, tgt):
            return icp_point_to_point(
                src.xyz, tgt.xyz, src.mask, tgt.mask, cfg=cfg.icp
            ).transform

        return jax.vmap(one)(src_shard, tgt_shard)

    return run(src_scans, tgt_scans)


def sharded_scan_to_map_batch(
    scans: RadarScan,
    mesh: Mesh,
    cfg: PipelineConfig = PipelineConfig(),
    key: Optional[jax.Array] = None,
    axis: str = "dp",
    block: int = 0,
    **kwargs,
):
    """Track B independent radar streams with B/n sequences per device —
    each sequence owns a private map, so multi-stream serving scales
    linearly over the mesh with ZERO collective traffic (the dp counterpart
    of the spatially-sharded single-map path in parallel/sharded_map.py).

    `scans`: stacked (B, F, ...) with B divisible by the mesh size.
    Returns per-sequence stacked outputs (see models.run_scan_to_map_batch).
    """
    from icp4dradar_tpu.models.scan_to_map import run_scan_to_map_batch

    B = scans.xyz.shape[0]
    n = mesh.shape[axis]
    if B % n:
        raise ValueError(f"batch {B} must divide the mesh size {n}")
    if key is None:
        key = jax.random.key(cfg.seed)
    keys = jax.random.split(key, B)

    out_shapes = jax.eval_shape(
        lambda s, k: run_scan_to_map_batch(s, cfg, key=jax.random.key(0),
                                           block=block, **kwargs),
        scans, keys,
    )

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(axis), scans), P(axis)),
        out_specs=jax.tree.map(lambda _: P(axis), out_shapes),
        check_vma=False,
    )
    def run(scan_shard, key_shard):
        from icp4dradar_tpu.models.scan_to_map import (
            run_scan_to_map,
            run_scan_to_map_blocked,
        )

        if block > 1:
            return jax.vmap(
                lambda s, k: run_scan_to_map_blocked(
                    s, cfg, key=k, block=block, **kwargs)
            )(scan_shard, key_shard)
        return jax.vmap(
            lambda s, k: run_scan_to_map(s, cfg, key=k, **kwargs)
        )(scan_shard, key_shard)

    return run(scans, keys)
