"""Does sweep_exact itself hold exact parity on Calgary at 240x136?"""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from ray_tracing_octrees_tpu.core.cache import load_voxel_grid
from ray_tracing_octrees_tpu.core.grid import (
    building_center, recenter_filled_voxels)
from ray_tracing_octrees_tpu.core.octree import build_leaf_volume, build_pyramid
from ray_tracing_octrees_tpu.render.camera import Camera, generate_rays
from ray_tracing_octrees_tpu.trace.octree_trace import trace_octree
from ray_tracing_octrees_tpu.trace.sweep_exact import trace_pixels_sweep_exact

PW, PH = 240, 136
ASPECT = 1920 / 1080
grid = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
vol = (jnp.asarray(grid.occ) > 0).astype(jnp.float32)
pyr = build_pyramid(grid.occ)
lv = build_leaf_volume(pyr)
extent = float(np.max(np.asarray(grid.world_max) - np.asarray(grid.world_min)))
tgt = np.asarray(building_center(grid))
vs = float(np.asarray(grid.voxel_size))

for th, ph, rf, lb in [(0.9, 0.8, 0.75, "bench"), (2.2, 0.5, 0.9, "far-orbit")]:
    cam = Camera(theta=th, phi=ph, radius=rf * extent)
    cam.set_target(tgt)
    res = trace_pixels_sweep_exact(vol, lv, grid.origin, grid.voxel_size,
                                   cam.get_pos(), cam.get_view(), PW, PH,
                                   45.0, ASPECT)
    assert res is not None
    o, d = generate_rays(PW, PH, jnp.asarray(cam.get_pos(), jnp.float32),
                         jnp.asarray(cam.get_view(), jnp.float32), 45.0,
                         ASPECT)
    ref = trace_octree(pyr, o, d, grid.origin, grid.voxel_size)
    h1 = np.asarray(res["hit"])
    h2 = np.asarray(ref["hit"])
    both = h1 & h2
    dt_ = (np.asarray(res["t"]) - np.asarray(ref["t"]))[both] / vs
    print(f"{lb}: mism {(h1 != h2).sum()} (sweep-only {(h1 & ~h2).sum()} "
          f"exact-only {(~h1 & h2).sum()}) RMS {np.sqrt(np.mean(dt_**2)):.6f} "
          f"max {np.abs(dt_).max():.6f} overflow {int(res['overflow'])} "
          f"unresolved {int(res['unresolved'])}")
