"""SE(3) rigid transforms as (...,4,4) homogeneous matrices + exp/log maps.

Covers the reference's pose bookkeeping: right-composition scan-to-scan
accumulation `currOdom = currOdom * T_icp` (src/iterative_closest_point.cpp:552),
left-composition scan-to-map `currOdom = T_gicp * currOdom`
(src/radar_odometry.cpp:412), point association into map/submap frames
(src/iterative_closest_point.cpp:44-62), and the twist parameterization used
by the Gauss-Newton solvers (graph/, registration/).
"""

from __future__ import annotations

import jax.numpy as jnp

from icp4dradar_tpu.geom.so3 import so3_exp, so3_hat, so3_log


def se3_identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.eye(4, dtype=dtype)


def se3_from_rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3),(...,3) -> (...,4,4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def se3_rotation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, :3]


def se3_translation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, 3]


def se3_compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return a @ b


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = se3_rotation(T)
    t = se3_translation(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return se3_from_rt(Rt, -(Rt @ t[..., None])[..., 0])


def se3_apply(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (...,4,4) to points (...,N,3) or (...,3)."""
    R = se3_rotation(T)
    t = se3_translation(T)
    if pts.ndim >= 2 and pts.shape[-2] != 3:
        return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]
    return (R @ pts[..., None])[..., 0] + t


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Twist (...,6) [v, w] -> (...,4,4). v = translational, w = rotational."""
    v = xi[..., :3]
    w = xi[..., 3:]
    # guarded norm: finite JVP at xi=0 (see so3_exp)
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    small = theta2 < 1e-8
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    R = so3_exp(w)
    K = so3_hat(w)
    # Left Jacobian V = I + (1-cos)/t^2 K + (t - sin t)/t^3 K^2
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / jnp.where(small, 1.0, theta2 * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    V = eye + b[..., None] * K + c[..., None] * (K @ K)
    t = (V @ v[..., None])[..., 0]
    return se3_from_rt(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """(...,4,4) -> twist (...,6) [v, w]."""
    R = se3_rotation(T)
    t = se3_translation(T)
    w = so3_log(R)
    # guarded norm: finite JVP at the identity (see so3_exp)
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    # Wide Taylor window: for theta < 1e-2 the closed form catastrophically
    # cancels in f32 (1 - (t/2)cot(t/2) ~ t^2/12 underflows), while the
    # Taylor error at 1e-2 is ~1e-13.
    small = theta2 < 1e-4
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    K = so3_hat(w)
    # V^{-1} = I - K/2 + cot_term * K^2,
    # cot_term = (1 - (t/2) cot(t/2)) / t^2  ->  1/12 + t^2/720 near 0.
    half = 0.5 * theta
    cot_half = jnp.cos(half) / jnp.where(small, 1.0, jnp.sin(half))
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * cot_half) / jnp.where(small, 1.0, theta2),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
    Vinv = eye - 0.5 * K + cot_term[..., None] * (K @ K)
    v = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([v, w], axis=-1)
