"""Chip timing of the legacy fast frame (Calgary 1080p)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), "xla_cache"))
import numpy as np, jax, jax.numpy as jnp
from ray_tracing_octrees_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
from ray_tracing_octrees_tpu.core.cache import load_voxel_grid
from ray_tracing_octrees_tpu.core.grid import building_center, recenter_filled_voxels
from ray_tracing_octrees_tpu.render.camera import Camera
from ray_tracing_octrees_tpu.trace.slab_sweep import render_fast_frame, shadow_volume

W, H = (int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1920x1080").split("x"))
grid = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
vol = (jnp.asarray(grid.occ) > 0).astype(jnp.float32)
extent = float(np.max(np.asarray(grid.world_max) - np.asarray(grid.world_min)))
cam = Camera(theta=0.9, phi=0.8, radius=0.75 * extent)
cam.set_target(np.asarray(building_center(grid)))
to_light = (0.5, 0.9, 0.4)
shadow = jax.block_until_ready(shadow_volume(vol, to_light))
light_dir = tuple(-c for c in to_light)

def frame():
    return render_fast_frame(vol, shadow, grid.origin, grid.voxel_size,
                             cam.get_pos(), cam.get_view(), 45.0, W / H,
                             W, H, light_dir=light_dir)
img = frame(); jax.block_until_ready(img)
for w in range(3):
    t0 = time.perf_counter()
    for _ in range(20):
        cam.phi += 1e-4
        img = frame()
    jax.block_until_ready(img)
    ms = (time.perf_counter() - t0) / 20 * 1e3
    print(f"window {w}: {ms:.2f} ms = {W*H*2/ms/1e3:.1f} Mrays/s", flush=True)
