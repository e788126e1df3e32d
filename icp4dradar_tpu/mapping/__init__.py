"""TPU-resident incremental map store (reference L2 layer — replaces the
pthread ikd-Tree, third_party/ikd-Tree/ikd_Tree.{h,cpp}, SURVEY.md §7 step 4)."""

from icp4dradar_tpu.mapping.voxel_hash import (  # noqa: F401
    VoxelHashMap,
    voxel_map_create,
    voxel_map_insert,
    voxel_map_delete_box,
    voxel_map_forget_far,
    voxel_map_maybe_rehash,
    voxel_map_rehash,
    voxel_map_delete_box_acquire,
    voxel_map_delete_points,
    voxel_map_add_box,
    voxel_map_box_search,
    voxel_map_radius_search,
    voxel_map_sector_search,
    voxel_map_stencil_neighbors,
    voxel_map_knn,
    voxel_map_knn_exact,
)
