"""Point-to-point ICP on the fused moments kernel.

Behavioral spec: PCL `pcl::IterativeClosestPoint` as used by the reference
(src/iterative_closest_point.cpp:508-521) — default 10 iterations, no
correspondence gating, best-fit rigid update each iteration, fitness = mean
squared correspondence distance (`getFitnessScore`, :516, :520).

Each iteration is ONE Pallas pass (ops/icp_fused.py): pose transform + NN
correspondence + weighted moment accumulation, with the rigid update
recovered from 17 scalars via Horn's quaternion method — no kd-tree, no
gathers, no SVD (SURVEY.md §7 step 3; docs/PERFORMANCE.md). The loop is a
lax.while_loop with a transform-epsilon early exit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from icp4dradar_tpu.config import IcpConfig
from icp4dradar_tpu.geom import se3_identity, se3_log
from icp4dradar_tpu.ops.icp_fused import (
    icp_iteration_moments,
    icp_iteration_moments_xla,
    moments_to_transform,
)


@struct.dataclass
class IcpResult:
    transform: jnp.ndarray        # (4,4) T: src -> tgt
    converged: jnp.ndarray        # () bool (transform-epsilon reached)
    fitness: jnp.ndarray          # () mean squared distance, ungated (PCL)
    gated_fitness: jnp.ndarray    # () mean squared distance within the gate
    inlier_fraction: jnp.ndarray  # () gated correspondences / valid points
    iterations: jnp.ndarray       # () int32


def icp_point_to_point(
    src_xyz: jnp.ndarray,
    tgt_xyz: jnp.ndarray,
    src_mask: Optional[jnp.ndarray] = None,
    tgt_mask: Optional[jnp.ndarray] = None,
    init_transform: Optional[jnp.ndarray] = None,
    cfg: IcpConfig = IcpConfig(),
) -> IcpResult:
    """Align src onto tgt. Masked, fixed-shape, jit/vmap-safe."""
    if src_mask is None:
        src_mask = jnp.ones(src_xyz.shape[0], dtype=src_xyz.dtype)
    if tgt_mask is None:
        tgt_mask = jnp.ones(tgt_xyz.shape[0], dtype=tgt_xyz.dtype)
    T0 = se3_identity(src_xyz.dtype) if init_transform is None else init_transform

    # One fused kernel per iteration: transform + NN + weighted moments
    # (ops/icp_fused.py); only 4x4 math runs outside.
    if jax.default_backend() == "tpu":
        moments_fn = lambda T, gate: icp_iteration_moments(
            T, src_xyz, src_mask, tgt_xyz, tgt_mask,
            max_correspondence_dist=gate,
        )
    else:
        moments_fn = lambda T, gate: icp_iteration_moments_xla(
            T, src_xyz, src_mask, tgt_xyz, tgt_mask,
            max_correspondence_dist=gate,
        )

    def cond(state):
        T, it, delta = state
        return (it < cfg.max_iterations) & (delta > cfg.transformation_epsilon)

    def body(state):
        T, it, _ = state
        moments = moments_fn(T, cfg.max_correspondence_dist)
        dT, _ = moments_to_transform(moments, src_xyz.dtype)
        T_new = dT @ T
        delta = jnp.sum(jnp.abs(se3_log(dT)))
        return (T_new, it + 1, delta)

    # delta starts above epsilon so the loop runs at least once
    init = (T0, jnp.int32(0), jnp.asarray(jnp.inf, src_xyz.dtype))
    T, iters, delta = jax.lax.while_loop(cond, body, init)

    # ONE post-convergence pass yields both fitness flavors: the kernel
    # emits gated moments plus ungated [swd2, sw] sums.
    # - fitness: PCL getFitnessScore (mean squared NN distance of valid src
    #   points under the final transform, no max_range gate)
    # - gated_fitness/inlier_fraction: overlap-aware acceptance for
    #   loop-closure validation — with partial FoV overlap the ungated mean
    #   is dominated by unmatched regions even when the overlap is tight.
    gm = moments_fn(T, cfg.max_correspondence_dist)
    fitness = gm[17] / jnp.maximum(gm[18], 1e-9)
    _, gated_fitness = moments_to_transform(gm, src_xyz.dtype)
    inlier_fraction = gm[0] / jnp.maximum(jnp.sum(src_mask), 1.0)
    converged = delta <= jnp.maximum(cfg.transformation_epsilon, 1e-12)
    # PCL reports converged=true when it ran to completion; mirror by also
    # accepting the iteration cap.
    converged = converged | (iters >= cfg.max_iterations)
    return IcpResult(transform=T, converged=converged, fitness=fitness,
                     gated_fitness=gated_fitness,
                     inlier_fraction=inlier_fraction, iterations=iters)
