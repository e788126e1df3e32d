"""Registration: point-to-point ICP and GICP-style distribution-to-
distribution Gauss-Newton (reference L3 layer — SURVEY.md §1)."""

from icp4dradar_tpu.registration.icp import IcpResult, icp_point_to_point  # noqa: F401
from icp4dradar_tpu.registration.gicp import (  # noqa: F401
    GicpResult,
    gicp_align,
    point_covariances,
)
from icp4dradar_tpu.registration.vgicp import (  # noqa: F401
    vgicp_align,
    vgicp_align_block,
)
