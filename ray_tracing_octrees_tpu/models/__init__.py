"""The five render pipelines ("modes", main.cpp:495-501), each a thin model
class over jitted ops: MarchingCubes, Blocks, AdaptiveDualContouring,
OctreeRayTrace ("BVHRayTrace"), VolumeRaycast."""

from ray_tracing_octrees_tpu.models.extraction import (
    MarchingCubesRenderer,
    VoxelBlockRenderer,
)
from ray_tracing_octrees_tpu.models.octree_raytracer import OctreeRayTracer
from ray_tracing_octrees_tpu.models.volume_raycaster import VolumeRaycastRenderer

__all__ = [
    "MarchingCubesRenderer",
    "VoxelBlockRenderer",
    "OctreeRayTracer",
    "VolumeRaycastRenderer",
]
