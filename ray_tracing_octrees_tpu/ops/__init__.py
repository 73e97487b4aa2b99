from ray_tracing_octrees_tpu.ops.mc_tables import (
    EDGE_TABLE,
    TRI_TABLE,
    TRI_COUNTS,
    EDGE_CORNERS,
)
from ray_tracing_octrees_tpu.ops.marching_cubes import (
    marching_cubes_grid,
    marching_cubes_volume,
    count_mc_triangles,
)

__all__ = [
    "EDGE_TABLE",
    "TRI_TABLE",
    "TRI_COUNTS",
    "EDGE_CORNERS",
    "marching_cubes_grid",
    "marching_cubes_volume",
    "count_mc_triangles",
]
