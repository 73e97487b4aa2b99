"""Calgary parity of the fast-exact frame vs trace_octree (CPU or TPU).

Usage: [JAX_PLATFORMS=cpu] python tools/exp_fast_exact_parity.py [WxH]
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ray_tracing_octrees_tpu.core.cache import load_voxel_grid
from ray_tracing_octrees_tpu.core.grid import (
    building_center, recenter_filled_voxels)
from ray_tracing_octrees_tpu.core.octree import build_pyramid
from ray_tracing_octrees_tpu.render.camera import Camera, generate_rays
from ray_tracing_octrees_tpu.trace.octree_trace import trace_octree
from ray_tracing_octrees_tpu.trace.fast_exact import fast_exact_first_hit

res = sys.argv[1] if len(sys.argv) > 1 else "240x136"
PW, PH = (int(x) for x in res.split("x"))
ASPECT = 1920 / 1080

grid = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
vol = (jnp.asarray(grid.occ) > 0).astype(jnp.float32)
pyr = build_pyramid(grid.occ)
extent = float(np.max(np.asarray(grid.world_max) - np.asarray(grid.world_min)))
tgt = np.asarray(building_center(grid))
vs = float(np.asarray(grid.voxel_size))

POSES = [(0.9, 0.8, 0.75, "bench"), (1.4, 0.8, 0.75, "high-theta"),
         (0.9, 1.4, 0.75, "top-down"), (0.9, 0.8, 1.6, "zoom-out"),
         (2.2, 0.5, 0.9, "far-orbit"), (0.3, 0.8, 0.75, "low-theta"),
         (0.9, 0.2, 0.75, "graze-phi"), (0.9, 0.8, 0.35, "zoom-in")]

for th, ph, rf, lb in POSES:
    cam = Camera(theta=th, phi=ph, radius=rf * extent)
    cam.set_target(tgt)
    out = fast_exact_first_hit(vol, grid.origin, grid.voxel_size,
                               cam.get_pos(), cam.get_view(), 45.0,
                               ASPECT, PW, PH)
    if out is None:
        print(f"{lb:10s}: outside envelope (exact-tracer fallback)")
        continue
    hit, t, _, _ = out
    o, d = generate_rays(PW, PH, jnp.asarray(cam.get_pos(), jnp.float32),
                         jnp.asarray(cam.get_view(), jnp.float32), 45.0,
                         ASPECT)
    ref = trace_octree(pyr, o, d, grid.origin, grid.voxel_size)
    h1 = np.asarray(hit)
    h2 = np.asarray(ref["hit"])
    both = h1 & h2
    dt_ = (np.asarray(t) - np.asarray(ref["t"]))[both] / vs
    print(f"{lb:10s}: mismatch {(h1 != h2).mean()*100:.4f}% "
          f"(sweep-only {(h1 & ~h2).sum()} exact-only {(~h1 & h2).sum()}) "
          f"RMS {np.sqrt(np.mean(dt_**2)):.5f} vox  max {np.abs(dt_).max():.5f}")
