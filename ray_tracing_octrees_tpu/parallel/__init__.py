from ray_tracing_octrees_tpu.parallel.mesh import make_mesh, ray_sharding
from ray_tracing_octrees_tpu.parallel.sharding import (
    trace_sharded,
    render_image_sharded,
)

__all__ = [
    "make_mesh",
    "ray_sharding",
    "trace_sharded",
    "render_image_sharded",
]
