"""Multi-chip scaling over `jax.sharding.Mesh` (SURVEY.md §2 parallelism
call-out: the reference is single-process C++ — this layer is pure new
capability): data-parallel scan batches, factor-sharded distributed
Gauss-Newton with psum collectives, spatially-sharded map queries."""

from icp4dradar_tpu.parallel.mesh import make_mesh, device_count  # noqa: F401
from icp4dradar_tpu.parallel.distributed_gn import (  # noqa: F401
    distributed_block_normal_equations,
    distributed_normal_equations,
    distributed_optimize_pose_graph,
    distributed_optimize_pose_graph_block,
    pad_factors_for_mesh,
)
from icp4dradar_tpu.parallel.batch import (  # noqa: F401
    shard_scan_batch,
    batched_preprocess,
    batched_icp_pairs,
    sharded_scan_to_map_batch,
)
from icp4dradar_tpu.parallel.sharded_map import (  # noqa: F401
    sharded_map_create,
    sharded_map_insert,
    sharded_map_rehash,
    sharded_sector_search_with_stats,
)
from icp4dradar_tpu.parallel.ring_vgicp import (  # noqa: F401
    ring_vgicp_align,
    ring_vgicp_normal_equations,
)
from icp4dradar_tpu.parallel.distributed_pipeline import (  # noqa: F401
    load_distributed_state,
    run_scan_to_map_distributed,
    save_distributed_state,
)
from icp4dradar_tpu.parallel.multihost import (  # noqa: F401
    assemble_global_scans,
    global_mesh,
    maybe_initialize_distributed,
    process_frame_slice,
    run_scan_to_map_multihost,
)
