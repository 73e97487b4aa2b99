from ray_tracing_octrees_tpu.parallel.mesh import make_mesh, ray_sharding
from ray_tracing_octrees_tpu.parallel.sharding import (
    trace_sharded,
    render_image_sharded,
    marching_cubes_halo,
)
from ray_tracing_octrees_tpu.parallel.pipeline import (
    render_fast_frames_pipelined,
)
from ray_tracing_octrees_tpu.parallel.distributed import (
    initialize_distributed,
    local_slice,
)

__all__ = [
    "make_mesh",
    "ray_sharding",
    "trace_sharded",
    "render_image_sharded",
    "marching_cubes_halo",
    "render_fast_frames_pipelined",
    "initialize_distributed",
    "local_slice",
]
