"""Distributed pose-graph Gauss-Newton over a device mesh.

The multi-chip back-end from SURVEY.md §7 step 7: factors are sharded across
the mesh's data axis; every device assembles the normal-equation
contribution of its factor shard (pose_graph_normal_equations on 1/N of the
factors), the (H, g, cost) partials are `psum`ed over ICI, and the reduced
6Kx6K system is solved replicated on every device (cheap — K keyframes,
dense Cholesky on the MXU). This is the reduced-system/psum pattern of
distributed Schur-complement bundle adjustment with the pose block as the
reduced system.

ALL factor types shard: between-factors and the single-pose families
(point / line / plane / plane-norm, include/radarFactor.hpp:11-171) pad
with masked-out rows to a mesh multiple and split row-wise.

The whole GN iteration loop runs INSIDE one shard_map'd while_loop — one
dispatch for the entire optimization, no host sync per iteration (the
convergence scalar is replicated, so every device takes the same branch).

Works identically on a real pod slice and on the 8-virtual-device CPU mesh
used by tests (conftest.py) and the driver's dryrun.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from icp4dradar_tpu.config import PoseGraphConfig
from icp4dradar_tpu.graph.gauss_newton import (
    PoseGraph,
    PointFactors,
    LineFactors,
    PlaneFactors,
    Plane3Factors,
    RelPoseFactors,
    pose_graph_normal_equations,
    solve_pose_graph_step,
)

# factor-family slots on PoseGraph that shard row-wise, with finite filler
# payloads for the masked pad rows (residual fns must stay NaN-free there:
# a 0/0 in a padded row would poison the psum through 0 * nan)
_FACTOR_FIELDS = ("rel", "points", "lines", "planes", "planes3")
# numpy, not jnp: module-level jnp arrays would initialize the JAX backends
# at import time, freezing the device count before CLI entry points can pin
# the platform (run_odometry --cpu / --distributed)
_PAD_FILLERS = {
    "T_meas": np.eye(4),
    "line_b": np.asarray([1.0, 0.0, 0.0]),
    "normal": np.asarray([0.0, 0.0, 1.0]),
    "plane_l": np.asarray([1.0, 0.0, 0.0]),
    "plane_m": np.asarray([0.0, 1.0, 0.0]),
}


def _pad_container(fac, n: int):
    """Pad every per-factor array to a multiple of n with masked-out rows."""
    F = fac.mask.shape[0]
    pad = (-F) % n
    if pad == 0:
        return fac

    def pad_field(name, x):
        fill = _PAD_FILLERS.get(name)
        if fill is not None:
            tail = jnp.broadcast_to(fill.astype(x.dtype),
                                    (pad,) + fill.shape)
        else:
            tail = jnp.zeros((pad,) + x.shape[1:], x.dtype)
        return jnp.concatenate([x, tail])

    kw = {name: pad_field(name, getattr(fac, name))
          for name in fac.__dataclass_fields__
          if isinstance(getattr(fac, name), jnp.ndarray)
          or hasattr(getattr(fac, name), "shape")}
    return fac.replace(**kw)


def pad_factors_for_mesh(graph: PoseGraph, n: int) -> PoseGraph:
    """Pad every populated factor container to a multiple of the mesh size
    (masked rows with finite filler payloads)."""
    kw = {}
    for name in _FACTOR_FIELDS:
        fac = getattr(graph, name)
        if fac is not None:
            kw[name] = _pad_container(fac, n)
    return graph.replace(**kw)


def _factor_dict(graph: PoseGraph) -> dict:
    return {name: getattr(graph, name) for name in _FACTOR_FIELDS
            if getattr(graph, name) is not None}


def _shard_specs(fdict: dict, axis: str):
    return jax.tree.map(lambda _: P(axis), fdict)


@functools.lru_cache(maxsize=32)
def _cached_assemble(mesh: Mesh, cfg: PoseGraphConfig, axis: str,
                     kinds: Tuple[str, ...]):
    """shard_map'd + jitted one-shot normal-equation assembly; cached per
    (mesh, cfg, factor-kinds) so iterative callers don't retrace."""

    def assemble(poses, fdict):
        local = PoseGraph(poses=poses, **fdict)
        H, g, cost = pose_graph_normal_equations(local, cfg)
        return (jax.lax.psum(H, axis), jax.lax.psum(g, axis),
                jax.lax.psum(cost, axis))

    def build(poses, fdict):
        shard = jax.shard_map(
            assemble, mesh=mesh,
            in_specs=(P(), _shard_specs(fdict, axis)),
            out_specs=(P(), P(), P()))
        return shard(poses, fdict)

    return jax.jit(build)


def distributed_normal_equations(
    graph: PoseGraph,
    mesh: Mesh,
    cfg: PoseGraphConfig = PoseGraphConfig(),
    axis: str = "dp",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(H, g, cost) with factor shards assembled per-device and psum-reduced."""
    n = mesh.shape[axis]
    graph = pad_factors_for_mesh(graph, n)
    fdict = _factor_dict(graph)
    assemble = _cached_assemble(mesh, cfg, axis, tuple(sorted(fdict)))
    return assemble(graph.poses, fdict)


@functools.lru_cache(maxsize=32)
def _cached_optimize(mesh: Mesh, cfg: PoseGraphConfig, axis: str,
                     kinds: Tuple[str, ...]):
    """The ENTIRE GN loop as one shard_map'd dispatch: per-iteration
    assembly is local + psum, the replicated solve and the convergence
    test run identically on every device — no host round-trips."""

    def optimize(poses, fdict):
        def cond(state):
            _, it, delta = state
            return (it < cfg.max_iterations) & (delta > cfg.convergence_eps)

        def body(state):
            poses, it, _ = state
            local = PoseGraph(poses=poses, **fdict)
            H, g, _ = pose_graph_normal_equations(local, cfg)
            H = jax.lax.psum(H, axis)
            g = jax.lax.psum(g, axis)
            new_poses, delta = solve_pose_graph_step(local, H, g, cfg)
            return (new_poses, it + 1, delta)

        init = (poses, jnp.int32(0), jnp.asarray(jnp.inf, poses.dtype))
        poses, _, _ = jax.lax.while_loop(cond, body, init)
        local = PoseGraph(poses=poses, **fdict)
        _, _, cost = pose_graph_normal_equations(local, cfg)
        return poses, jax.lax.psum(cost, axis)

    def build(poses, fdict):
        shard = jax.shard_map(
            optimize, mesh=mesh,
            in_specs=(P(), _shard_specs(fdict, axis)),
            out_specs=(P(), P()))
        return shard(poses, fdict)

    return jax.jit(build)


def distributed_optimize_pose_graph(
    graph: PoseGraph,
    mesh: Mesh,
    cfg: PoseGraphConfig = PoseGraphConfig(),
    axis: str = "dp",
) -> Tuple[PoseGraph, jnp.ndarray]:
    """GN loop: sharded assembly + replicated solve, single dispatch."""
    graph = pad_factors_for_mesh(graph, mesh.shape[axis])
    fdict = _factor_dict(graph)
    optimize = _cached_optimize(mesh, cfg, axis, tuple(sorted(fdict)))
    poses, cost = optimize(graph.poses, fdict)
    return graph.replace(poses=poses), cost


@functools.lru_cache(maxsize=32)
def _cached_assemble_block(mesh: Mesh, cfg: PoseGraphConfig, axis: str,
                           kinds: Tuple[str, ...], has_chain: bool):
    """shard_map'd one-shot BLOCK normal-equation assembly (sharded factor
    work + O(K) psum, no solve) — the per-stage timing hook the weak-scaling
    bench uses to separate sharded assembly from the replicated PCG floor."""
    from icp4dradar_tpu.graph.block_solver import block_normal_equations

    def assemble(poses, fdict, chain):
        local = PoseGraph(poses=poses, **fdict)
        ne = block_normal_equations(local, chain, None, cfg)
        return (jax.lax.psum(ne.diag, axis), jax.lax.psum(ne.off, axis),
                jax.lax.psum(ne.g, axis), jax.lax.psum(ne.cost, axis))

    def build(poses, fdict, chain):
        shard = jax.shard_map(
            assemble, mesh=mesh,
            in_specs=(P(), _shard_specs(fdict, axis),
                      jax.tree.map(lambda _: P(axis), chain)),
            out_specs=(P(), P(), P(), P()),
            check_vma=False)
        return shard(poses, fdict, chain)

    return jax.jit(build)


def distributed_block_normal_equations(
    graph: PoseGraph,
    mesh: Mesh,
    cfg: PoseGraphConfig = PoseGraphConfig(),
    axis: str = "dp",
):
    """Assembly stage of the O(K) distributed block GN, alone: sharded
    per-factor block assembly + psum of the (K,6,6)/(K-1,6,6)/(K,6)
    structure. Returns (diag, off, g, cost) replicated. Loop factors are
    excluded (they replicate in the full solver and add no sharded work)."""
    from icp4dradar_tpu.graph.block_solver import split_chain_loops

    n = mesh.shape[axis]
    chain, _ = split_chain_loops(graph.rel)
    graph = graph.replace(rel=None)
    graph = pad_factors_for_mesh(graph, n)
    if chain is not None:
        chain = _pad_container(chain, n)
    fdict = _factor_dict(graph)
    assemble = _cached_assemble_block(
        mesh, cfg, axis, tuple(sorted(fdict)), chain is not None)
    return assemble(graph.poses, fdict, chain)


@functools.lru_cache(maxsize=32)
def _cached_optimize_block(mesh: Mesh, cfg: PoseGraphConfig, axis: str,
                           kinds: Tuple[str, ...], has_chain: bool,
                           has_loops: bool):
    """Block-sparse distributed GN: each device assembles the O(K) block
    normal equations of ITS factor shard (chain between-factors + all
    single-pose families), the (K,6,6)/(K-1,6,6)/(K,6) blocks psum over
    the mesh — collective payload O(K), never the dense (6K)^2 — and the
    O(K) block-tridiagonal-preconditioned PCG solve runs replicated.
    Loop-closure factors are REPLICATED, not sharded (tens of them; their
    low-rank U columns concatenate rather than add, so every device builds
    the identical U once and it stays OUT of the psum)."""
    from icp4dradar_tpu.graph.block_solver import (
        BlockNormalEq,
        block_normal_equations,
        solve_block_step,
    )

    def optimize(poses, fdict, chain, loops):
        def normal_eq(poses):
            local = PoseGraph(poses=poses, **fdict)
            ne = block_normal_equations(local, chain, None, cfg)
            diag = jax.lax.psum(ne.diag, axis)
            off = jax.lax.psum(ne.off, axis)
            g = jax.lax.psum(ne.g, axis)
            cost = jax.lax.psum(ne.cost, axis)
            U = ne.U
            if has_loops:
                nl = block_normal_equations(
                    PoseGraph(poses=poses), None, loops, cfg)
                diag = diag + nl.diag
                off = off + nl.off
                g = g + nl.g
                cost = cost + nl.cost
                U = nl.U
            return BlockNormalEq(diag=diag, off=off, U=U, g=g, cost=cost)

        def cond(state):
            _, it, delta = state
            return (it < cfg.max_iterations) & (delta > cfg.convergence_eps)

        def body(state):
            poses, it, _ = state
            ne = normal_eq(poses)
            new_poses, delta = solve_block_step(ne, poses, cfg)
            return (new_poses, it + 1, delta)

        init = (poses, jnp.int32(0), jnp.asarray(jnp.inf, poses.dtype))
        poses, _, _ = jax.lax.while_loop(cond, body, init)
        return poses, normal_eq(poses).cost

    def build(poses, fdict, chain, loops):
        shard = jax.shard_map(
            optimize, mesh=mesh,
            in_specs=(P(), _shard_specs(fdict, axis),
                      jax.tree.map(lambda _: P(axis), chain),
                      jax.tree.map(lambda _: P(), loops)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return shard(poses, fdict, chain, loops)

    return jax.jit(build)


def distributed_optimize_pose_graph_block(
    graph: PoseGraph,
    mesh: Mesh,
    cfg: PoseGraphConfig = PoseGraphConfig(),
    axis: str = "dp",
) -> Tuple[PoseGraph, jnp.ndarray]:
    """O(K) distributed GN (block-sparse assembly + PCG solve). Between-
    factors split host-side into the sharded chain (j == i+1) and the
    replicated loop set; single-pose factor families shard row-wise.
    Matches distributed_optimize_pose_graph / optimize_pose_graph_block
    results; collective payload and solve are both O(K) instead of
    O(K^2) / O(K^3)."""
    from icp4dradar_tpu.graph.block_solver import split_chain_loops

    n = mesh.shape[axis]
    orig_rel = graph.rel
    chain, loops = split_chain_loops(graph.rel)
    graph = graph.replace(rel=None)
    graph = pad_factors_for_mesh(graph, n)
    if chain is not None:
        chain = _pad_container(chain, n)
    fdict = _factor_dict(graph)
    optimize = _cached_optimize_block(
        mesh, cfg, axis, tuple(sorted(fdict)),
        chain is not None, loops is not None)
    poses, cost = optimize(graph.poses, fdict, chain, loops)
    # hand back the caller's between-factor container untouched (the dense
    # path preserves it too; stripping it would silently lose loop closures
    # from a graph the caller re-optimizes or inspects)
    return graph.replace(poses=poses, rel=orig_rel), cost
