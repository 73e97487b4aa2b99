"""Bisect the r3->r4 mesh-tracer pixel hit-fraction drift (0.2350->0.2331).

Runs the CURRENT tracer at tol_texels in {512, 0} and compares pixel hit
sets: if tol=0 restores the r3-class fraction and the tol=512 delta lives
entirely in pixels of unresolved texels, the drift is attributed to the
tolerance tail's composition (schedule-dependent WHICH texels remain),
not to a correctness change.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), "xla_cache"))
import numpy as np
import jax
import jax.numpy as jnp
from ray_tracing_octrees_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
from ray_tracing_octrees_tpu.core.cache import load_voxel_grid
from ray_tracing_octrees_tpu.core.grid import recenter_filled_voxels, building_center
from ray_tracing_octrees_tpu.render.camera import Camera
from ray_tracing_octrees_tpu.trace.mesh_grid import (
    prepare_mc_scene, render_mc_mesh_frame)

g = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
to_light = (0.5, 0.9, 0.4)
scene = prepare_mc_scene(g.occ, g.origin, g.voxel_size, to_light=to_light)
extent = float(np.max(np.asarray(g.world_max) - np.asarray(g.world_min)))
W, H = 1920, 1088
center = np.asarray(building_center(g))
cam = Camera(theta=0.9, phi=0.8, radius=0.75 * extent)
cam.set_target(center)

res = {}
for tol, mr in ((512, 8), (0, 64)):
    out = render_mc_mesh_frame(
        scene, cam.get_pos(), cam.get_view(), 45.0, W / H, W, H,
        light_dir=tuple(-c for c in to_light),
        inter_h=1024, inter_w=1024, max_rounds=mr, tol_texels=tol,
        with_stats=True)
    img, stats = out
    jax.block_until_ready(img)
    hm = np.asarray(jax.jit(lambda im: im[..., :3].max(-1) > 0)(img))
    res[tol] = hm
    print(f"tol={tol}: pixel hit frac {hm.mean():.6f}  stats "
          f"{{k: int(v) if hasattr(v,'item') else v for k,v in stats.items()}}"
          if False else
          f"tol={tol}: pixel hit frac {hm.mean():.6f} unresolved "
          f"{int(stats.get('unresolved', -1))} rounds "
          f"{int(stats.get('rounds', -1))}", flush=True)

d = res[512] != res[0]
print(f"pixels differing tol512 vs tol0: {d.sum()} "
      f"({d.mean()*100:.4f}%)  (tol0-only hits {int((res[0] & ~res[512]).sum())}, "
      f"tol512-only {int((res[512] & ~res[0]).sum())})")
