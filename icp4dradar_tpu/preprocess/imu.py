"""IMU rotation prior — the explicit extension point the reference stubs out.

The reference queues IMU messages and discards them unprocessed
(src/radar_odometry.cpp:359-362, SURVEY.md §2 "IMU plumbing (stub)"). Here
gyro samples between consecutive scan timestamps integrate into an SO(3)
delta that seeds registration (`prior_deltas` on run_scan_to_map /
init_transform on gicp_align), tightening convergence under fast rotation.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from icp4dradar_tpu.io.rosbag import ImuSample


def integrate_gyro(
    samples: Sequence[ImuSample],
    t0: float,
    t1: float,
) -> np.ndarray:
    """Integrate body angular velocity over [t0, t1] -> (3,3) delta rotation.

    Midpoint rule over the sample intervals clipped to the window; returns
    identity when no samples fall inside.
    """
    import jax.numpy as jnp

    from icp4dradar_tpu.geom.so3 import so3_exp

    inside = [s for s in samples if t0 <= s.stamp <= t1]
    if not inside:
        return np.eye(3, dtype=np.float32)
    R = np.eye(3, dtype=np.float32)
    times = [t0] + [s.stamp for s in inside] + [t1]
    for i, s in enumerate(inside):
        dt = 0.5 * (times[i + 2] - times[i])  # midpoint weighting
        dR = np.asarray(so3_exp(jnp.asarray(s.angular_velocity * dt,
                                            dtype=jnp.float32)))
        R = R @ dR
    return R


def imu_prior_deltas(
    frames,  # Sequence[BagFrame]
) -> np.ndarray:
    """(F, 4, 4) per-frame prior delta poses from each frame's IMU batch
    (rotation-only; translation is left to the Doppler prior)."""
    F = len(frames)
    out = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    for k in range(1, F):
        t0 = frames[k - 1].stamp
        t1 = frames[k].stamp
        out[k, :3, :3] = integrate_gyro(frames[k].imu, t0, t1)
    return out
