"""ray_tracing_octrees_tpu — a TPU-native voxel rendering framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
C++/OpenGL viewer ``abodthedude25/Ray_Tracing_Octrees``:

* binary voxel volumes (analytic multi-shell sphere, CSV building-footprint
  voxelization, binary scene caches),
* a Morton-linear octree over the grid (replacing the pointer octree of
  ``OctreeVoxel.cpp``),
* five render pipelines — Marching Cubes, Voxel Blocks, Adaptive Dual
  Contouring, octree ray tracing, and volume raymarching with advanced
  shading — all as jittable array programs,
* frustum culling, interactive carving (radiation splatting), wireframe
  debug geometry, disk caching, and profiling.

Everything on the compute path is ``jax.jit``-compatible, shardable over a
``jax.sharding.Mesh``, with Pallas TPU kernels for the hot ray loops.
"""

from ray_tracing_octrees_tpu.config import EngineConfig
from ray_tracing_octrees_tpu.core.grid import VoxelGrid

__version__ = "0.1.0"

__all__ = ["EngineConfig", "VoxelGrid", "__version__"]
