"""Batched SE(3) pose-graph Gauss-Newton.

What the reference links Ceres for but never runs (CMakeLists.txt:49,
include/radarFactor.hpp — SURVEY.md §3.5): a keyframe graph over odometry
chains + loop closures, solved here as dense-block normal equations on the
MXU.

Structure: K keyframe poses, unknowns are RIGHT-multiplied (body-frame)
twists xi in R^{K x 6} (T_k <- T_k exp(xi_k)). Body-frame perturbations keep
Jacobian translation arms at relative-transform / sensor scale instead of
world-position scale — with left (world) twists the chain Hessian entries
grow as (trajectory radius)^2 and the block-tridiagonal Cholesky cancels
catastrophically in f32 beyond a few hundred keyframes (the pose-graph
instance of the "center GN math on the predicted position" rule). Factors:

- RelPoseFactors: SE(3) between-factors (i, j, T_meas, weight)
- PointFactors: point-to-point world factors binding one keyframe each
  (k, p_body, q_world, weight) — the LidarDistanceFactor form that
  scan-to-map correspondences produce.

Per-factor Jacobians come from jax.jacfwd (the autodiff mirror of Ceres'
AutoDiffCostFunction), vmapped over all factors at once; blocks scatter-add
into the dense (6K, 6K) H. Gauge freedom is pinned with a prior on pose 0.
Huber robust weighting downweights outlier loop closures.

The normal-equation accumulation is exposed separately
(`pose_graph_normal_equations`) so the distributed solver
(parallel/distributed_gn.py) can psum partial (H, g) across factor shards —
the Schur/psum pattern from SURVEY.md §7 step 7.
"""

from __future__ import annotations

from typing import Optional, Tuple

import functools

import jax
import jax.numpy as jnp
from flax import struct

from icp4dradar_tpu.config import PoseGraphConfig
from icp4dradar_tpu.geom.se3 import se3_exp
from icp4dradar_tpu.graph.factors import (
    point_to_line_residual,
    point_to_plane_norm_residual,
    point_to_plane_residual,
    point_to_point_residual,
    relative_pose_residual,
)


@struct.dataclass
class RelPoseFactors:
    """Between-factors (F,): i -> j measured transforms."""

    i: jnp.ndarray        # (F,) int32
    j: jnp.ndarray        # (F,) int32
    T_meas: jnp.ndarray   # (F,4,4)
    weight: jnp.ndarray   # (F,) scalar information weight
    mask: jnp.ndarray     # (F,) {0,1}

    @classmethod
    def build(cls, i, j, T_meas, weight=None, mask=None):
        i = jnp.asarray(i, jnp.int32)
        F = i.shape[0]
        if weight is None:
            weight = jnp.ones(F, jnp.float32)
        if mask is None:
            mask = jnp.ones(F, jnp.float32)
        return cls(i=i, j=jnp.asarray(j, jnp.int32),
                   T_meas=jnp.asarray(T_meas), weight=jnp.asarray(weight),
                   mask=jnp.asarray(mask))


@struct.dataclass
class PointFactors:
    """World point-to-point factors (P,): body point p under pose k should
    land on world point q (reference LidarDistanceFactor semantics)."""

    k: jnp.ndarray        # (P,) int32 keyframe index
    p_body: jnp.ndarray   # (P,3)
    q_world: jnp.ndarray  # (P,3)
    weight: jnp.ndarray   # (P,)
    mask: jnp.ndarray     # (P,)

    @classmethod
    def build(cls, k, p_body, q_world, weight=None, mask=None):
        k = jnp.asarray(k, jnp.int32)
        P = k.shape[0]
        if weight is None:
            weight = jnp.ones(P, jnp.float32)
        if mask is None:
            mask = jnp.ones(P, jnp.float32)
        return cls(k=k, p_body=jnp.asarray(p_body),
                   q_world=jnp.asarray(q_world), weight=jnp.asarray(weight),
                   mask=jnp.asarray(mask))


@struct.dataclass
class LineFactors:
    """Point-to-line factors (P,): body point p under pose k should fall on
    the world line through (a, b) — the reference's RadarEdgeFactor
    (include/radarFactor.hpp:11-54), as a live solver citizen."""

    k: jnp.ndarray        # (P,) int32 keyframe index
    p_body: jnp.ndarray   # (P,3)
    line_a: jnp.ndarray   # (P,3)
    line_b: jnp.ndarray   # (P,3)
    weight: jnp.ndarray   # (P,)
    mask: jnp.ndarray     # (P,)

    @classmethod
    def build(cls, k, p_body, line_a, line_b, weight=None, mask=None):
        k = jnp.asarray(k, jnp.int32)
        P = k.shape[0]
        if weight is None:
            weight = jnp.ones(P, jnp.float32)
        if mask is None:
            mask = jnp.ones(P, jnp.float32)
        return cls(k=k, p_body=jnp.asarray(p_body),
                   line_a=jnp.asarray(line_a), line_b=jnp.asarray(line_b),
                   weight=jnp.asarray(weight), mask=jnp.asarray(mask))


@struct.dataclass
class PlaneFactors:
    """Point-to-plane factors with precomputed unit normal + offset — the
    reference's LidarPlaneNormFactor (include/radarFactor.hpp:105-137):
    residual n . (T p) + d."""

    k: jnp.ndarray        # (P,) int32 keyframe index
    p_body: jnp.ndarray   # (P,3)
    normal: jnp.ndarray   # (P,3) unit plane normal (world)
    offset: jnp.ndarray   # (P,) negative_OA_dot_norm
    weight: jnp.ndarray   # (P,)
    mask: jnp.ndarray     # (P,)

    @classmethod
    def build(cls, k, p_body, normal, offset, weight=None, mask=None):
        k = jnp.asarray(k, jnp.int32)
        P = k.shape[0]
        if weight is None:
            weight = jnp.ones(P, jnp.float32)
        if mask is None:
            mask = jnp.ones(P, jnp.float32)
        return cls(k=k, p_body=jnp.asarray(p_body),
                   normal=jnp.asarray(normal),
                   offset=jnp.asarray(offset),
                   weight=jnp.asarray(weight), mask=jnp.asarray(mask))


@struct.dataclass
class Plane3Factors:
    """Point-to-plane factors through three world points — the reference's
    LidarPlaneFactor (include/radarFactor.hpp:56-103): signed distance of
    T p to the plane spanned by (j, l, m)."""

    k: jnp.ndarray        # (P,) int32 keyframe index
    p_body: jnp.ndarray   # (P,3)
    plane_j: jnp.ndarray  # (P,3)
    plane_l: jnp.ndarray  # (P,3)
    plane_m: jnp.ndarray  # (P,3)
    weight: jnp.ndarray   # (P,)
    mask: jnp.ndarray     # (P,)

    @classmethod
    def build(cls, k, p_body, plane_j, plane_l, plane_m,
              weight=None, mask=None):
        k = jnp.asarray(k, jnp.int32)
        P = k.shape[0]
        if weight is None:
            weight = jnp.ones(P, jnp.float32)
        if mask is None:
            mask = jnp.ones(P, jnp.float32)
        return cls(k=k, p_body=jnp.asarray(p_body),
                   plane_j=jnp.asarray(plane_j),
                   plane_l=jnp.asarray(plane_l),
                   plane_m=jnp.asarray(plane_m),
                   weight=jnp.asarray(weight), mask=jnp.asarray(mask))


@struct.dataclass
class PoseGraph:
    poses: jnp.ndarray               # (K,4,4)
    rel: Optional[RelPoseFactors] = None
    points: Optional[PointFactors] = None
    lines: Optional[LineFactors] = None
    planes: Optional[PlaneFactors] = None
    planes3: Optional[Plane3Factors] = None


def _huber_weight(r2: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weight for the Huber loss on residual norm sqrt(r2)."""
    r = jnp.sqrt(jnp.maximum(r2, 1e-20))
    return jnp.where(r <= delta, 1.0, delta / r)


def _single_pose_blocks(poses, res_fn, k, payload, weight, mask, huber_delta):
    """Shared GN linearization for factors binding ONE pose each.

    res_fn(T, *payload_row) -> (D,) residual. Returns per-factor
    (Hkk (P,6,6), gk (P,6), cost ()) at xi = 0 around poses[k], with
    Huber-IRLS weighting — the autodiff mirror of one Ceres
    AutoDiffCostFunction class per factor type (include/radarFactor.hpp),
    vmapped over all factors of that type at once."""
    Tk = poses[k]

    def f(xi, Tk, *pl):
        return res_fn(Tk @ se3_exp(xi), *pl)

    zeros = jnp.zeros((k.shape[0], 6), dtype=poses.dtype)
    r0 = jax.vmap(f)(zeros, Tk, *payload)                 # (P,D)
    J = jax.vmap(jax.jacfwd(f, argnums=0))(zeros, Tk, *payload)  # (P,D,6)
    r2 = jnp.sum(r0 * r0, axis=-1)
    w = weight * mask * _huber_weight(r2, huber_delta)    # (P,)
    cost = jnp.sum(w * r2)
    JW = J * w[:, None, None]
    Hkk = jnp.einsum("pri,prj->pij", JW, J)
    gk = jnp.einsum("pri,pr->pi", JW, r0)
    return Hkk, gk, cost


def _rel_linearize(poses, rel: RelPoseFactors, huber_delta: float):
    """GN linearization of between-factors at xi = 0: returns
    (r0 (F,6), Ji (F,6,6), Jj (F,6,6), w (F,), cost ()) with Huber-IRLS
    weights folded into w. Shared by the dense and block-sparse assemblies."""
    Ti = poses[rel.i]
    Tj = poses[rel.j]

    def res_fn(xi_i, xi_j, Ti, Tj, Tm):
        return relative_pose_residual(Ti @ se3_exp(xi_i), Tj @ se3_exp(xi_j), Tm)

    zeros = jnp.zeros((rel.i.shape[0], 6), dtype=poses.dtype)
    r0 = jax.vmap(res_fn)(zeros, zeros, Ti, Tj, rel.T_meas)       # (F,6)
    Ji = jax.vmap(jax.jacfwd(res_fn, argnums=0))(zeros, zeros, Ti, Tj, rel.T_meas)
    Jj = jax.vmap(jax.jacfwd(res_fn, argnums=1))(zeros, zeros, Ti, Tj, rel.T_meas)
    r2 = jnp.sum(r0 * r0, axis=-1)
    w = rel.weight * rel.mask * _huber_weight(r2, huber_delta)    # (F,)
    cost = jnp.sum(w * r2)
    return r0, Ji, Jj, w, cost


def _iter_single_pose_factors(graph: PoseGraph):
    """Yield (k, res_fn, payload) for every populated single-pose factor
    container — the one place that knows each type's residual signature."""
    if graph.points is not None:
        pf = graph.points
        yield pf, point_to_point_residual, (pf.p_body, pf.q_world)
    if graph.lines is not None:
        lf = graph.lines
        yield lf, point_to_line_residual, (lf.p_body, lf.line_a, lf.line_b)
    if graph.planes is not None:
        nf = graph.planes
        yield nf, point_to_plane_norm_residual, (nf.p_body, nf.normal,
                                                 nf.offset)
    if graph.planes3 is not None:
        p3 = graph.planes3
        yield p3, point_to_plane_residual, (p3.p_body, p3.plane_j,
                                            p3.plane_l, p3.plane_m)


def pose_graph_normal_equations(
    graph: PoseGraph,
    cfg: PoseGraphConfig = PoseGraphConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Assemble (H (6K,6K), g (6K,), cost ()) at the current linearization.

    GN normal equations for r(xi) ~ r0 + J xi: H = J^T W J, g = J^T W r0;
    the solver applies xi = -H^-1 g.
    """
    K = graph.poses.shape[0]
    H = jnp.zeros((6 * K, 6 * K), dtype=graph.poses.dtype)
    g = jnp.zeros((6 * K,), dtype=graph.poses.dtype)
    cost = jnp.zeros((), dtype=graph.poses.dtype)

    if graph.rel is not None:
        rel = graph.rel
        r0, Ji, Jj, w, c = _rel_linearize(graph.poses, rel, cfg.huber_delta)
        cost += c

        JiW = Ji * w[:, None, None]
        JjW = Jj * w[:, None, None]
        Hii = jnp.einsum("fri,frj->fij", JiW, Ji)
        Hij = jnp.einsum("fri,frj->fij", JiW, Jj)
        Hjj = jnp.einsum("fri,frj->fij", JjW, Jj)
        gi = jnp.einsum("fri,fr->fi", JiW, r0)
        gj = jnp.einsum("fri,fr->fi", JjW, r0)

        Hb = H.reshape(K, 6, K, 6)
        Hb = Hb.at[rel.i, :, rel.i, :].add(Hii)
        Hb = Hb.at[rel.i, :, rel.j, :].add(Hij)
        Hb = Hb.at[rel.j, :, rel.i, :].add(jnp.swapaxes(Hij, -1, -2))
        Hb = Hb.at[rel.j, :, rel.j, :].add(Hjj)
        H = Hb.reshape(6 * K, 6 * K)
        gb = g.reshape(K, 6)
        gb = gb.at[rel.i].add(gi)
        gb = gb.at[rel.j].add(gj)
        g = gb.reshape(-1)

    for fac, res_fn, payload in _iter_single_pose_factors(graph):
        Hkk, gk, c = _single_pose_blocks(
            graph.poses, res_fn, fac.k, payload, fac.weight, fac.mask,
            cfg.huber_delta)
        cost += c
        Hb = H.reshape(K, 6, K, 6)
        Hb = Hb.at[fac.k, :, fac.k, :].add(Hkk)
        H = Hb.reshape(6 * K, 6 * K)
        g = g.reshape(K, 6).at[fac.k].add(gk).reshape(-1)

    return H, g, cost


def solve_pose_graph_step(
    graph: PoseGraph,
    H: jnp.ndarray,
    g: jnp.ndarray,
    cfg: PoseGraphConfig = PoseGraphConfig(),
    gauge_weight: float = 1e6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve the damped system with pose-0 gauge prior; return (new_poses,
    |dx|). Split from assembly so the distributed path can psum (H, g)."""
    K = graph.poses.shape[0]
    diag = jnp.arange(6 * K)
    H = H.at[diag, diag].add(cfg.damping)
    H = H.at[diag[:6], diag[:6]].add(gauge_weight)   # pin pose 0
    L = jnp.linalg.cholesky(H)
    y = jax.scipy.linalg.solve_triangular(L, (-g)[:, None], lower=True)
    xi = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)[:, 0]
    xi = xi.reshape(K, 6)
    new_poses = jax.vmap(lambda x, T: T @ se3_exp(x))(xi, graph.poses)
    return new_poses, jnp.sum(jnp.abs(xi))


def optimize_pose_graph(
    graph: PoseGraph,
    cfg: PoseGraphConfig = PoseGraphConfig(),
) -> Tuple[PoseGraph, jnp.ndarray]:
    """Run GN to convergence (fixed cap + epsilon). Returns (graph, cost).

    Dispatches through an lru-cached jit keyed by cfg: an eager call cost
    ~25 s trace + ~10 s op-by-op run for a 48-keyframe all-factor-types
    graph on CPU (and a ~25 ms tunnel dispatch PER OP on TPU); compiled it
    is one dispatch, and repeat calls at the same shapes are pure run."""
    return _jitted_optimize_pose_graph(cfg)(graph)


@functools.lru_cache(maxsize=16)
def _jitted_optimize_pose_graph(cfg: PoseGraphConfig):
    return jax.jit(lambda g: _optimize_pose_graph_impl(g, cfg))


def _optimize_pose_graph_impl(
    graph: PoseGraph,
    cfg: PoseGraphConfig,
) -> Tuple[PoseGraph, jnp.ndarray]:

    def cond(state):
        _, it, delta = state
        return (it < cfg.max_iterations) & (delta > cfg.convergence_eps)

    def body(state):
        poses, it, _ = state
        gr = graph.replace(poses=poses)
        H, g, _ = pose_graph_normal_equations(gr, cfg)
        new_poses, delta = solve_pose_graph_step(gr, H, g, cfg)
        return (new_poses, it + 1, delta)

    init = (graph.poses, jnp.int32(0), jnp.asarray(jnp.inf, graph.poses.dtype))
    poses, _, _ = jax.lax.while_loop(cond, body, init)
    out = graph.replace(poses=poses)
    _, _, cost = pose_graph_normal_equations(out, cfg)
    return out, cost
