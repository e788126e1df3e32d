"""Scan preprocessing: Doppler outlier rejection + ego-velocity estimation
(reference L1 layer — SURVEY.md §1)."""

from icp4dradar_tpu.preprocess.doppler import (  # noqa: F401
    SineFit,
    fit_sine_ransac,
    sine_residuals,
    static_dynamic_split,
    lsq_ego_velocity,
    preprocess_scan,
)
from icp4dradar_tpu.preprocess.reve import (  # noqa: F401
    EgoVelocityEstimate,
    estimate_ego_velocity,
)
from icp4dradar_tpu.preprocess.imu import (  # noqa: F401
    integrate_gyro,
    imu_prior_deltas,
)
