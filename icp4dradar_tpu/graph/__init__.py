"""Pose-graph back-end (reference L5 layer): the Ceres factors the reference
declares but never solves (include/radarFactor.hpp:11-171, no ceres::Problem
exists — SURVEY.md §2) — activated here as batched residuals with autodiff
Jacobians and a batched SE(3) Gauss-Newton solver (SURVEY.md §7 step 6)."""

from icp4dradar_tpu.graph.factors import (  # noqa: F401
    point_to_line_residual,
    point_to_plane_residual,
    point_to_plane_norm_residual,
    point_to_point_residual,
    relative_pose_residual,
)
from icp4dradar_tpu.graph.gauss_newton import (  # noqa: F401
    PoseGraph,
    RelPoseFactors,
    PointFactors,
    LineFactors,
    PlaneFactors,
    Plane3Factors,
    optimize_pose_graph,
    pose_graph_normal_equations,
    solve_pose_graph_step,
)
from icp4dradar_tpu.graph.block_solver import (  # noqa: F401
    BlockNormalEq,
    block_normal_equations,
    block_tridiag_cholesky,
    block_tridiag_solve,
    optimize_pose_graph_block,
    optimize_pose_graph_block_split,
    split_chain_loops,
)
