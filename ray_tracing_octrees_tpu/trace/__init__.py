from ray_tracing_octrees_tpu.trace.octree_trace import (
    trace_octree,
    cull_pyramid,
    compact_visible_nodes,
)

__all__ = ["trace_octree", "cull_pyramid", "compact_visible_nodes"]
