"""Distributed pose-graph Gauss-Newton over a device mesh.

The multi-chip back-end from SURVEY.md §7 step 7: factors are sharded across
the mesh's data axis; every device assembles the normal-equation
contribution of its factor shard (pose_graph_normal_equations on 1/N of the
factors), the (H, g, cost) partials are `psum`ed over ICI, and the reduced
6Kx6K system is solved replicated on every device (cheap — K keyframes,
dense Cholesky on the MXU). This is the reduced-system/psum pattern of
distributed Schur-complement bundle adjustment with the pose block as the
reduced system.

Works identically on a real pod slice and on the 8-virtual-device CPU mesh
used by tests (conftest.py) and the driver's dryrun.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from icp4dradar_tpu.config import PoseGraphConfig
from icp4dradar_tpu.graph.gauss_newton import (
    PoseGraph,
    PointFactors,
    RelPoseFactors,
    pose_graph_normal_equations,
    solve_pose_graph_step,
)


def _pad_to_multiple(x: jnp.ndarray, m: int) -> jnp.ndarray:
    pad = (-x.shape[0]) % m
    if pad == 0:
        return x
    pad_width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad_width)


def pad_factors_for_mesh(graph: PoseGraph, n: int) -> PoseGraph:
    """Pad factor arrays to a multiple of the mesh size with masked-out
    entries (identity measurements so residuals stay finite)."""
    rel, pts = graph.rel, graph.points
    if rel is not None:
        F = rel.i.shape[0]
        pad = (-F) % n
        if pad:
            eye = jnp.broadcast_to(jnp.eye(4, dtype=rel.T_meas.dtype), (pad, 4, 4))
            rel = RelPoseFactors(
                i=jnp.concatenate([rel.i, jnp.zeros(pad, jnp.int32)]),
                j=jnp.concatenate([rel.j, jnp.zeros(pad, jnp.int32)]),
                T_meas=jnp.concatenate([rel.T_meas, eye]),
                weight=jnp.concatenate([rel.weight, jnp.zeros(pad, rel.weight.dtype)]),
                mask=jnp.concatenate([rel.mask, jnp.zeros(pad, rel.mask.dtype)]),
            )
    if pts is not None:
        Pn = pts.k.shape[0]
        pad = (-Pn) % n
        if pad:
            pts = PointFactors(
                k=jnp.concatenate([pts.k, jnp.zeros(pad, jnp.int32)]),
                p_body=_pad_to_multiple(pts.p_body, n),
                q_world=_pad_to_multiple(pts.q_world, n),
                weight=jnp.concatenate([pts.weight, jnp.zeros(pad, pts.weight.dtype)]),
                mask=jnp.concatenate([pts.mask, jnp.zeros(pad, pts.mask.dtype)]),
            )
    return graph.replace(rel=rel, points=pts)


def _build_assemble(mesh: Mesh, cfg: PoseGraphConfig, axis: str,
                    has_rel: bool, has_pts: bool):
    """shard_map'd + jitted normal-equation assembly; built once per
    (mesh, cfg, factor-kinds) and cached so iterative solvers don't retrace."""
    factor_spec_rel = jax.tree.map(
        lambda _: P(axis), RelPoseFactors.build([0], [0], jnp.eye(4)[None])
    ) if has_rel else None
    factor_spec_pts = jax.tree.map(
        lambda _: P(axis),
        PointFactors.build([0], jnp.zeros((1, 3)), jnp.zeros((1, 3))),
    ) if has_pts else None

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), factor_spec_rel, factor_spec_pts),
        out_specs=(P(), P(), P()),
    )
    def assemble(poses, rel_shard, pts_shard):
        local = PoseGraph(poses=poses, rel=rel_shard, points=pts_shard)
        H, g, cost = pose_graph_normal_equations(local, cfg)
        return (
            jax.lax.psum(H, axis),
            jax.lax.psum(g, axis),
            jax.lax.psum(cost, axis),
        )

    return jax.jit(assemble)


@functools.lru_cache(maxsize=32)
def _cached_assemble(mesh: Mesh, cfg: PoseGraphConfig, axis: str,
                     has_rel: bool, has_pts: bool):
    return _build_assemble(mesh, cfg, axis, has_rel, has_pts)


def distributed_normal_equations(
    graph: PoseGraph,
    mesh: Mesh,
    cfg: PoseGraphConfig = PoseGraphConfig(),
    axis: str = "dp",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(H, g, cost) with factor shards assembled per-device and psum-reduced."""
    n = mesh.shape[axis]
    graph = pad_factors_for_mesh(graph, n)
    assemble = _cached_assemble(
        mesh, cfg, axis, graph.rel is not None, graph.points is not None
    )
    return assemble(graph.poses, graph.rel, graph.points)


def distributed_optimize_pose_graph(
    graph: PoseGraph,
    mesh: Mesh,
    cfg: PoseGraphConfig = PoseGraphConfig(),
    axis: str = "dp",
) -> Tuple[PoseGraph, jnp.ndarray]:
    """GN loop: sharded assembly + replicated solve each iteration."""
    graph = pad_factors_for_mesh(graph, mesh.shape[axis])

    def cond(state):
        _, it, delta = state
        return (it < cfg.max_iterations) & (delta > cfg.convergence_eps)

    def body(state):
        poses, it, _ = state
        gr = graph.replace(poses=poses)
        H, g, _ = distributed_normal_equations(gr, mesh, cfg, axis)
        new_poses, delta = solve_pose_graph_step(gr, H, g, cfg)
        return (new_poses, it + 1, delta)

    # python-level loop: shard_map inside lax.while_loop is restricted; the
    # iteration count is small (<= cfg.max_iterations) and each body is jitted
    state = (graph.poses, jnp.int32(0), jnp.asarray(jnp.inf, graph.poses.dtype))
    import numpy as np

    for _ in range(cfg.max_iterations):
        if float(state[2]) <= cfg.convergence_eps:
            break
        state = body(state)
    poses = state[0]
    out = graph.replace(poses=poses)
    _, _, cost = distributed_normal_equations(out, mesh, cfg, axis)
    return out, cost
