from ray_tracing_octrees_tpu.core.grid import (
    VoxelGrid,
    generate_test_volume,
    make_sphere_grid,
    recenter_filled_voxels,
    filled_world_bounds,
)
from ray_tracing_octrees_tpu.core.cache import (
    save_voxel_grid,
    load_voxel_grid,
    load_voxel_grid_partial,
)
from ray_tracing_octrees_tpu.core.octree import (
    OccupancyPyramid,
    LinearOctree,
    build_pyramid,
    build_linear_octree,
)

__all__ = [
    "VoxelGrid",
    "generate_test_volume",
    "make_sphere_grid",
    "recenter_filled_voxels",
    "filled_world_bounds",
    "save_voxel_grid",
    "load_voxel_grid",
    "load_voxel_grid_partial",
    "OccupancyPyramid",
    "LinearOctree",
    "build_pyramid",
    "build_linear_octree",
]
