"""Headline benchmark: ray-trace throughput on the Calgary scene at 1080p.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "Mrays/s", "vs_baseline": N}

Primary + shadow rays against the baked Calgary city scene
(sceneCache.bin, 425x243x29 @ voxelSize 10), the BASELINE.json north-star
configuration (>= 500 Mrays/s/chip). The measured pipeline is the MXU
slab-sweep tracer (perspective shear-warp factorization) shaded with the
per-frame directional shadow volume; the exact gather-based octree tracer
(reference semantics) is reported alongside as `exact_tracer_mrays`.

Thin wrapper: the implementation lives in ray_tracing_octrees_tpu.bench
(also runnable as ``python -m ray_tracing_octrees_tpu.bench --scene ...``).
"""

from ray_tracing_octrees_tpu.bench import main

if __name__ == "__main__":
    main([])
