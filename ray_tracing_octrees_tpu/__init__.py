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

import os as _os

import jax as _jax

# Persistent XLA compilation cache. On tunneled/remote-compile TPU
# runtimes every compile is a multi-second RPC, and a fresh process pays
# it for every program (measured: the 1080p frame alone costs ~190 s of
# compiles cold, ~0 s cached). Opt out with RTO_TPU_NO_COMPILE_CACHE=1 or
# point JAX_COMPILATION_CACHE_DIR elsewhere.
if not _os.environ.get("RTO_TPU_NO_COMPILE_CACHE") \
        and _os.environ.get("JAX_PLATFORMS", "").lower() != "cpu":
    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "rto_tpu_xla"),
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # 0: the XLA-reported compile time excludes the remote-compile RPC
        # overhead that actually dominates here, so cache everything
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

from ray_tracing_octrees_tpu.config import EngineConfig
from ray_tracing_octrees_tpu.core.grid import VoxelGrid

__version__ = "0.1.0"

__all__ = ["EngineConfig", "VoxelGrid", "__version__"]
