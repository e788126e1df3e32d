"""icp4dradar_tpu — TPU-native 4D-radar odometry and mapping engine.

A brand-new JAX/XLA/Pallas implementation with the capabilities of the C++/ROS
reference `ICP-4DRadar` (see SURVEY.md): multi-vendor radar scan ingestion,
Doppler RANSAC ego-motion outlier rejection, least-squares ego-velocity
estimation, scan-to-scan ICP and scan-to-map GICP registration against a
TPU-resident voxel-hash map, and a batched SE(3) Gauss-Newton pose-graph
back-end — sharded over `jax.sharding.Mesh` for multi-chip scaling.

Subpackages
-----------
- ``geom``          SO(3)/SE(3) math, Kabsch/weighted-SVD, batched solves
- ``io``            .bin frame IO, multi-vendor format adapters, datasets
- ``preprocess``    Doppler sine-RANSAC, static/dynamic split, ego-velocity
- ``ops``           Pallas TPU kernels (tiled NN/kNN correspondence)
- ``mapping``       voxel-hash incremental map (replaces ikd-Tree)
- ``registration``  point-to-point ICP, GICP-style point-to-plane GN
- ``models``        end-to-end odometry pipelines (scan-to-scan, scan-to-map)
- ``graph``         pose-graph factors + batched Gauss-Newton back-end
- ``parallel``      device mesh, sharded/distributed solvers
- ``utils``         metrics (ATE/RPE), trajectory IO, config, logging
- ``native``        C++ host-side runtime (frame loader/prefetcher)
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry pipelines are precision-critical: TPU's default matmul precision
# truncates f32 operands to bf16 on the MXU, which at radar ranges (~80 m)
# injects meter-scale errors into NN distance cross-terms and compounds
# through per-frame pose composition (measured: ATE 0.3 m -> 30 m over 256
# frames). Force full-f32 matmuls framework-wide; the hot kernels are
# bandwidth-bound at radar scales, so the MXU multi-pass cost is minor.
_jax.config.update("jax_default_matmul_precision", "highest")

from icp4dradar_tpu.config import PipelineConfig  # noqa: F401
