"""End-to-end odometry pipelines (reference L4 layer — SURVEY.md §1):

- ``scan_to_scan``: consecutive-scan ICP odometry, the `icp4radar` node
  rebuilt (src/iterative_closest_point.cpp:263-721)
- ``scan_to_map``: REVE-filtered scan-to-submap GICP odometry against the
  voxel-hash map, the `radar_odometry` node rebuilt
  (src/radar_odometry.cpp:311-434)
- ``submap``: keyframe-local submap assembly (src/iterative_closest_point.cpp:577-633)
"""

from icp4dradar_tpu.models.scan_to_scan import (  # noqa: F401
    ScanToScanState,
    ScanToScanOutput,
    scan_to_scan_init,
    scan_to_scan_step,
    run_scan_to_scan,
    run_scan_to_scan_replay,
)
from icp4dradar_tpu.models.scan_to_map import (  # noqa: F401
    ScanToMapState,
    ScanToMapOutput,
    scan_to_map_init,
    scan_to_map_step,
    run_scan_to_map,
    run_scan_to_map_batch,
    run_scan_to_map_blocked,
)
from icp4dradar_tpu.models.submap import SubmapAccumulator  # noqa: F401
from icp4dradar_tpu.models.local_map import local_map_refinement, build_windows  # noqa: F401
from icp4dradar_tpu.models.streaming import OdometrySession  # noqa: F401
from icp4dradar_tpu.models.pose_graph_odometry import (  # noqa: F401
    PoseGraphOdometryResult,
    run_pose_graph_odometry,
)
