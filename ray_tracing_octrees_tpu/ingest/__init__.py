from ray_tracing_octrees_tpu.ingest.csv_loader import (
    load_csv_vertices,
    load_csv_faces,
    assemble_triangles,
)
from ray_tracing_octrees_tpu.ingest.voxelize import (
    voxelize_triangles,
    voxelize_triangles_dense,
    load_csv_into_voxel_grid,
    point_in_triangle,
)

__all__ = [
    "load_csv_vertices",
    "load_csv_faces",
    "assemble_triangles",
    "voxelize_triangles",
    "voxelize_triangles_dense",
    "load_csv_into_voxel_grid",
    "point_in_triangle",
]
