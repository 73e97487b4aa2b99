"""Chip timing of the fast-exact frame on Calgary at 1080p.

Usage: python tools/time_fast_exact.py [WxH] [iters]
Perturbs the pose per iteration (tunnel elides identical dispatches);
reports 3 independent windows.
"""
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(repo, "xla_cache"))

import numpy as np
import jax
import jax.numpy as jnp

from ray_tracing_octrees_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

from ray_tracing_octrees_tpu.core.cache import load_voxel_grid
from ray_tracing_octrees_tpu.core.grid import (
    building_center, recenter_filled_voxels)
from ray_tracing_octrees_tpu.render.camera import Camera
from ray_tracing_octrees_tpu.trace.fast_exact import render_fast_exact_frame
from ray_tracing_octrees_tpu.trace.slab_sweep import shadow_volume

res = sys.argv[1] if len(sys.argv) > 1 else "1920x1080"
W, H = (int(x) for x in res.split("x"))
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
ASPECT = W / H

t0 = time.time()
grid = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
vol = (jnp.asarray(grid.occ) > 0).astype(jnp.float32)
extent = float(np.max(np.asarray(grid.world_max) - np.asarray(grid.world_min)))
tgt = np.asarray(building_center(grid))
cam = Camera(theta=0.9, phi=0.8, radius=0.75 * extent)
cam.set_target(tgt)
to_light = (0.5, 0.9, 0.4)
light_dir = tuple(-c for c in to_light)
shadow = jax.block_until_ready(shadow_volume(vol, to_light))
print(f"+{time.time()-t0:.1f}s scene ready", flush=True)


def frame():
    return render_fast_exact_frame(
        vol, shadow, grid.origin, grid.voxel_size, cam.get_pos(),
        cam.get_view(), 45.0, ASPECT, W, H, light_dir=light_dir)

t1 = time.time()
img = frame()
assert img is not None, "bench pose must be in envelope"
jax.block_until_ready(img)
print(f"+{time.time()-t0:.1f}s compiled ({time.time()-t1:.1f}s)", flush=True)

for w in range(3):
    t2 = time.perf_counter()
    for _ in range(iters):
        cam.phi += 1e-4
        img = frame()
    jax.block_until_ready(img)
    ms = (time.perf_counter() - t2) / iters * 1e3
    print(f"window {w}: {ms:.2f} ms/frame = "
          f"{W * H * 2 / ms / 1e3:.1f} Mrays/s (primary+shadow)", flush=True)

hit_frac = float(np.asarray(jax.jit(
    lambda im: (im[..., :3].max(axis=-1) > 0).mean(dtype=jnp.float32))(img)))
print(f"hit_fraction {hit_frac:.4f}")
