"""Utilities: metrics (ATE/RPE), trajectory file IO, JSONL logging, timers,
checkpointing (reference L7 layer + SURVEY.md §5 auxiliary subsystems)."""

from icp4dradar_tpu.utils.metrics import ate_rmse, rpe, align_umeyama  # noqa: F401
from icp4dradar_tpu.utils.trajectory import (  # noqa: F401
    write_velocity_txt,
    write_rt_txt,
    write_result_csv,
    read_result_csv,
    write_tum,
)
from icp4dradar_tpu.utils.logging import MetricsLogger  # noqa: F401
from icp4dradar_tpu.utils.profiling import StageTimer, profile_trace  # noqa: F401
from icp4dradar_tpu.utils.checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
from icp4dradar_tpu.utils.viz import write_ply, export_map_ply, write_html_viewer, voxel_downsample  # noqa: F401
from icp4dradar_tpu.utils.debug import checked, assert_finite_tree, validate_scan  # noqa: F401
