"""TPU compute kernels: tiled nearest-neighbor correspondence (Pallas) and
batched kNN — replaces PCL's kd-tree correspondence search inside
`icp.align` (src/iterative_closest_point.cpp:514) and FastGICP's kNN
covariance stage (src/radar_odometry.cpp:399-405)."""

from icp4dradar_tpu.ops.knn import (  # noqa: F401
    nearest_neighbor,
    nearest_neighbor_pallas,
    nearest_neighbor_xla,
    nearest_neighbor_with_coords,
    nearest_neighbor_coords_pallas,
    knn,
)
from icp4dradar_tpu.ops.compaction import mask_compact  # noqa: F401
