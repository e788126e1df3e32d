"""Core geometry: SO(3)/SE(3), Kabsch/weighted-SVD alignment, batched solves.

Replaces the reference's Eigen usage (pose accumulation
src/iterative_closest_point.cpp:541-557, LSQ solve :412-429) and the residual
math of include/radarFactor.hpp:11-171 — pure jax.numpy, fully
unit-testable on CPU, batched/vmappable throughout.
"""

from icp4dradar_tpu.geom.so3 import (  # noqa: F401
    quat_identity,
    quat_multiply,
    quat_conjugate,
    quat_normalize,
    quat_rotate,
    quat_to_matrix,
    matrix_to_quat,
    quat_slerp,
    so3_exp,
    so3_log,
    so3_hat,
    so3_vee,
    matrix_to_rpy,
)
from icp4dradar_tpu.geom.se3 import (  # noqa: F401
    se3_identity,
    se3_from_rt,
    se3_rotation,
    se3_translation,
    se3_compose,
    se3_inverse,
    se3_apply,
    se3_exp,
    se3_log,
)
from icp4dradar_tpu.geom.kabsch import kabsch_umeyama, masked_lstsq  # noqa: F401
from icp4dradar_tpu.geom.linalg import (  # noqa: F401
    solve_psd,
    batched_solve_psd,
    condition_number,
)
