"""Batched pose-graph residual functions.

Each mirrors one of the reference's dormant Ceres autodiff functors
(include/radarFactor.hpp) as a pure function of an SE(3) pose — Jacobians
come from jax.jacfwd exactly as Ceres would autodiff them, but batched over
thousands of factors with vmap instead of one CostFunction object each:

- point_to_line_residual      <- RadarEdgeFactor       (:11-54,  dim 3)
- point_to_plane_residual     <- LidarPlaneFactor      (:56-103, dim 1)
- point_to_plane_norm_residual<- LidarPlaneNormFactor  (:105-137, dim 1)
- point_to_point_residual     <- LidarDistanceFactor   (:140-171, dim 3)
- relative_pose_residual      — SE(3) between-factor (no reference
  counterpart; the back-end needs it for odometry chains / loop closures)

Pose convention: T = (4,4) maps body -> world. The `s` motion-interpolation
slerp of the first two reference factors (:27-29) is supported via the
`interp` argument.
"""

from __future__ import annotations

import jax.numpy as jnp

from icp4dradar_tpu.geom.se3 import se3_apply, se3_inverse, se3_log
from icp4dradar_tpu.geom.so3 import matrix_to_quat, quat_identity, quat_slerp, quat_to_matrix


def _interp_pose(T: jnp.ndarray, s) -> jnp.ndarray:
    """Slerp-interpolated fraction `s` of transform T (ref :26-29: slerp of
    the quaternion, linear scaling of the translation)."""
    q = matrix_to_quat(T[:3, :3])
    q_s = quat_slerp(quat_identity(T.dtype), q, s)
    R_s = quat_to_matrix(q_s)
    out = jnp.eye(4, dtype=T.dtype)
    out = out.at[:3, :3].set(R_s)
    return out.at[:3, 3].set(s * T[:3, 3])


def point_to_line_residual(
    T: jnp.ndarray,
    curr_point: jnp.ndarray,
    line_a: jnp.ndarray,
    line_b: jnp.ndarray,
    interp: float | jnp.ndarray = 1.0,
) -> jnp.ndarray:
    """(3,) point-to-line: |(lp-a) x (lp-b)| / |a-b| per component
    (RadarEdgeFactor::operator(), :34-39)."""
    lp = se3_apply(_interp_pose(T, interp), curr_point)
    nu = jnp.cross(lp - line_a, lp - line_b)
    de = jnp.linalg.norm(line_a - line_b)
    return nu / jnp.maximum(de, 1e-9)


def point_to_plane_residual(
    T: jnp.ndarray,
    curr_point: jnp.ndarray,
    plane_j: jnp.ndarray,
    plane_l: jnp.ndarray,
    plane_m: jnp.ndarray,
    interp: float | jnp.ndarray = 1.0,
) -> jnp.ndarray:
    """(1,) signed distance to the plane through j,l,m
    (LidarPlaneFactor::operator(), :63-87)."""
    n = jnp.cross(plane_j - plane_l, plane_j - plane_m)
    n = n / jnp.maximum(jnp.linalg.norm(n), 1e-9)
    lp = se3_apply(_interp_pose(T, interp), curr_point)
    return jnp.dot(lp - plane_j, n)[None]


def point_to_plane_norm_residual(
    T: jnp.ndarray,
    curr_point: jnp.ndarray,
    plane_unit_norm: jnp.ndarray,
    negative_oa_dot_norm: jnp.ndarray,
) -> jnp.ndarray:
    """(1,) n . (T p) + d (LidarPlaneNormFactor::operator(), :113-123)."""
    pw = se3_apply(T, curr_point)
    return (jnp.dot(plane_unit_norm, pw) + negative_oa_dot_norm)[None]


def point_to_point_residual(
    T: jnp.ndarray,
    curr_point: jnp.ndarray,
    closed_point: jnp.ndarray,
) -> jnp.ndarray:
    """(3,) T p - q (LidarDistanceFactor::operator(), :147-159)."""
    return se3_apply(T, curr_point) - closed_point


def relative_pose_residual(
    T_i: jnp.ndarray,
    T_j: jnp.ndarray,
    T_meas: jnp.ndarray,
) -> jnp.ndarray:
    """(6,) between-factor: log(T_meas^-1 (T_i^-1 T_j)).

    T_meas is the measured i->j transform (e.g. an ICP/GICP result)."""
    err = se3_inverse(T_meas) @ (se3_inverse(T_i) @ T_j)
    return se3_log(err)
