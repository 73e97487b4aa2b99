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

# The persistent XLA compile cache (load-bearing on this remote-compile
# runtime) is enabled by entry points via
# utils.compile_cache.enable_compile_cache() — gated on the RESOLVED
# backend, never at import time (a TPU-less host silently resolves to the
# CPU backend, where a shared cache risks AOT feature-mismatch SIGILLs).
from ray_tracing_octrees_tpu.config import EngineConfig
from ray_tracing_octrees_tpu.core.grid import VoxelGrid

__version__ = "0.1.0"

__all__ = ["EngineConfig", "VoxelGrid", "__version__"]
