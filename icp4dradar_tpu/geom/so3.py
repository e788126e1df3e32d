"""SO(3): quaternions, rotation matrices, exp/log maps.

Quaternions use xyzw layout, matching the reference's Eigen/Ceres parameter
blocks `para_q[4] = {0,0,0,1}` (src/radar_odometry.cpp:80, Ceres factors
include/radarFactor.hpp:26 build Quaternion{q[3], q[0], q[1], q[2]}).

All functions are shape-polymorphic over leading batch dimensions and safe
under jit/vmap/grad (no data-dependent control flow; Taylor fallbacks near
singular angles use jnp.where with both-branch-safe operands).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def quat_identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, xyzw layout."""
    ax, ay, az, aw = jnp.moveaxis(a, -1, 0)
    bx, by, bz, bw = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (...,3) by quaternions q (...,4)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(...,4) xyzw -> (...,3,3)."""
    q = quat_normalize(q)
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3) -> (...,4) xyzw. Branch-free Shepperd-style selection."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate solutions, one per dominant component.
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    qw = jnp.sqrt(jnp.maximum(qw, _EPS)) * 0.5
    w_, x_, y_, z_ = jnp.moveaxis(qw, -1, 0)
    cand = jnp.stack(
        [
            # dominant w
            jnp.stack([(m21 - m12) / (4 * w_), (m02 - m20) / (4 * w_),
                       (m10 - m01) / (4 * w_), w_], axis=-1),
            # dominant x
            jnp.stack([x_, (m01 + m10) / (4 * x_), (m02 + m20) / (4 * x_),
                       (m21 - m12) / (4 * x_)], axis=-1),
            # dominant y
            jnp.stack([(m01 + m10) / (4 * y_), y_, (m12 + m21) / (4 * y_),
                       (m02 - m20) / (4 * y_)], axis=-1),
            # dominant z
            jnp.stack([(m02 + m20) / (4 * z_), (m12 + m21) / (4 * z_), z_,
                       (m10 - m01) / (4 * z_)], axis=-1),
        ],
        axis=-2,
    )  # (...,4,4) candidates x xyzw
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :]
    return quat_normalize(q)


def quat_slerp(a: jnp.ndarray, b: jnp.ndarray, s) -> jnp.ndarray:
    """Spherical interpolation a->b at fraction s (matches Eigen slerp used by
    the motion-interpolated factors, include/radarFactor.hpp:28)."""
    dot = jnp.sum(a * b, axis=-1, keepdims=True)
    b = jnp.where(dot < 0, -b, b)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(jnp.clip(dot, 0.0, 1.0 - _EPS))
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-5
    w_a = jnp.where(small, 1.0 - s, jnp.sin((1.0 - s) * theta) / jnp.where(small, 1.0, sin_theta))
    w_b = jnp.where(small, s, jnp.sin(s * theta) / jnp.where(small, 1.0, sin_theta))
    return quat_normalize(w_a * a + w_b * b)


def so3_hat(w: jnp.ndarray) -> jnp.ndarray:
    """(...,3) -> (...,3,3) skew-symmetric."""
    wx, wy, wz = jnp.moveaxis(w, -1, 0)
    zero = jnp.zeros_like(wx)
    m = jnp.stack([zero, -wz, wy, wz, zero, -wx, -wy, wx, zero], axis=-1)
    return m.reshape(w.shape[:-1] + (3, 3))


def so3_vee(m: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (...,3) axis-angle -> (...,3,3).

    Differentiable at w=0: the Taylor branch is a polynomial in theta^2
    (no sqrt), and the sqrt in the generic branch is guarded so jacfwd/jvp
    at exactly zero stays finite (norm() alone has an infinite JVP at 0 —
    that NaN would otherwise poison the pose-graph autodiff Jacobians).
    """
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    small = theta2 < 1e-8
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    K = so3_hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None] * K + b[..., None] * (K @ K)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3) -> (...,3) axis-angle on the principal branch |w| <= pi.

    theta comes from atan2(|skew|/2, (tr-1)/2) so the angle and the axis
    magnitude are self-consistent (arccos alone is ill-conditioned near pi in
    f32). Near pi the axis is recovered from the diagonal of R with signs
    resolved off the dominant component; at exactly pi the sign of w is an
    inherent convention (w and -w are the same rotation).
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    skew = jnp.stack(
        [R[..., 2, 1] - R[..., 1, 2], R[..., 0, 2] - R[..., 2, 0],
         R[..., 1, 0] - R[..., 0, 1]],
        axis=-1,
    )  # = 2 sin(theta) * axis
    # guarded norm: finite JVP at the identity (see so3_exp)
    s2 = jnp.sum(skew * skew, axis=-1)
    tiny = s2 < 1e-16
    sin_theta = jnp.where(tiny, 0.0, 0.5 * jnp.sqrt(jnp.where(tiny, 1.0, s2)))
    theta = jnp.arctan2(sin_theta, cos_theta)

    small = sin_theta < 1e-6
    near_pi = cos_theta < -0.999
    # Generic: w = theta / (2 sin) * skew; Taylor theta/(2 sin) ~ 0.5 + t^2/12 near 0.
    scale = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        theta / jnp.where(small, 1.0, 2.0 * sin_theta),
    )
    w_generic = scale[..., None] * skew
    # Near pi: axis magnitude from diagonal, signs from the dominant axis.
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.maximum(
        (diag - cos_theta[..., None]) / (1.0 - cos_theta[..., None] + _EPS), 0.0
    )
    axis = jnp.sqrt(axis2)
    # off-diagonal sums: S_jk = R_jk + R_kj = 2 n_j n_k (1 - cos)
    sxy = R[..., 0, 1] + R[..., 1, 0]
    sxz = R[..., 0, 2] + R[..., 2, 0]
    syz = R[..., 1, 2] + R[..., 2, 1]
    dominant = jnp.argmax(axis2, axis=-1)
    ax, ay, az = jnp.moveaxis(axis, -1, 0)
    sx = jnp.where(dominant == 0, 1.0,
                   jnp.where(dominant == 1, jnp.sign(sxy + _EPS), jnp.sign(sxz + _EPS)))
    sy = jnp.where(dominant == 1, 1.0,
                   jnp.where(dominant == 0, jnp.sign(sxy + _EPS), jnp.sign(syz + _EPS)))
    sz = jnp.where(dominant == 2, 1.0,
                   jnp.where(dominant == 0, jnp.sign(sxz + _EPS), jnp.sign(syz + _EPS)))
    axis_signed = jnp.stack([ax * sx, ay * sy, az * sz], axis=-1)
    # align overall sign with the (possibly tiny) skew part when available
    flip = jnp.sum(axis_signed * skew, axis=-1, keepdims=True) < 0.0
    axis_signed = jnp.where(flip, -axis_signed, axis_signed)
    w_pi = theta[..., None] * axis_signed
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def so3_project(R: jnp.ndarray, iters: int = 2) -> jnp.ndarray:
    """Project a near-rotation matrix onto SO(3) (Newton polar iteration
    R <- R (3I - R^T R)/2, batched). Needed wherever an extracted rotation is
    re-multiplied into a pose chain frame after frame: f32 matmul drift makes
    ||R^T R - I|| grow, and matrix POWERS of a slightly scaled matrix explode
    exponentially (measured: constant-velocity rotation priors blew a
    trajectory to NaN within 10 frames without this)."""
    eye = jnp.eye(3, dtype=R.dtype)
    for _ in range(iters):
        R = R @ (1.5 * eye - 0.5 * (jnp.swapaxes(R, -1, -2) @ R))
    return R


def matrix_to_rpy(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> (roll, pitch, yaw) in DEGREES, matching the
    reference's `R2rpy` (src/radar_odometry.cpp:120-135) which feeds the
    sector-search heading."""
    n = R[..., :, 0]
    o = R[..., :, 1]
    a = R[..., :, 2]
    y = jnp.arctan2(n[..., 1], n[..., 0])
    p = jnp.arctan2(-n[..., 2], n[..., 0] * jnp.cos(y) + n[..., 1] * jnp.sin(y))
    r = jnp.arctan2(
        a[..., 0] * jnp.sin(y) - a[..., 1] * jnp.cos(y),
        -o[..., 0] * jnp.sin(y) + o[..., 1] * jnp.cos(y),
    )
    return jnp.stack([r, p, y], axis=-1) / jnp.pi * 180.0
