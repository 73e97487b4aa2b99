from ray_tracing_octrees_tpu.trace.octree_trace import (
    trace_octree,
    cull_pyramid,
    compact_visible_nodes,
)
from ray_tracing_octrees_tpu.trace.lbvh import build_lbvh, trace_lbvh
from ray_tracing_octrees_tpu.trace.slab_sweep import (
    sweep_first_hit,
    shadow_volume,
    render_fast_frame,
)
from ray_tracing_octrees_tpu.trace.raymarch import raymarch_volume, VolumeTextures
from ray_tracing_octrees_tpu.trace.mesh_grid import (
    MCMeshScene,
    prepare_mc_scene,
    trace_mc_mesh_texels,
    render_mc_mesh_frame,
)

__all__ = [
    "trace_octree",
    "cull_pyramid",
    "compact_visible_nodes",
    "build_lbvh",
    "trace_lbvh",
    "sweep_first_hit",
    "shadow_volume",
    "render_fast_frame",
    "raymarch_volume",
    "VolumeTextures",
    "MCMeshScene",
    "prepare_mc_scene",
    "trace_mc_mesh_texels",
    "render_mc_mesh_frame",
]
