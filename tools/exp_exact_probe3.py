"""Seeded/shadow step statistics + retuned-ladder timing (round 3).

Usage: python tools/exp_exact_probe3.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ray_tracing_octrees_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from ray_tracing_octrees_tpu.core.cache import load_voxel_grid
from ray_tracing_octrees_tpu.core.grid import building_center, recenter_filled_voxels
from ray_tracing_octrees_tpu.core.octree import build_leaf_volume, build_pyramid
from ray_tracing_octrees_tpu.render.camera import Camera, generate_rays
from ray_tracing_octrees_tpu.trace.octree_trace import trace_octree_fast
from ray_tracing_octrees_tpu.trace.slab_sweep import dilate_occupancy, sweep_seed

W, H = 960, 540
N = W * H
ASPECT = W / H

g = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
pyr = build_pyramid(g.occ)
lv = jax.block_until_ready(build_leaf_volume(pyr))
vol = (jnp.asarray(g.occ) > 0).astype(jnp.float32)
dil = jax.block_until_ready(dilate_occupancy(vol))

extent = float(np.max(np.asarray(g.world_max) - np.asarray(g.world_min)))
center = np.asarray(building_center(g))


def pose(i):
    cam = Camera(theta=0.9 + 1e-4 * i, phi=0.8, radius=0.75 * extent)
    cam.set_target(center)
    return cam


def pv(i):
    cam = pose(i)
    return (jnp.asarray(cam.get_pos(), jnp.float32),
            jnp.asarray(cam.get_view(), jnp.float32))


def bench(label, fn, iters=6):
    out = fn(0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(1 + i) for i in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:44s} {dt*1e3:9.3f} ms", flush=True)
    return dt


# --- seeded + shadow step statistics (one run each) -------------------------
cam = pose(0)
o, d = generate_rays(W, H, *pv(0), 45.0, ASPECT)
live, ts_, ext = sweep_seed(dil, g.origin, g.voxel_size, cam.get_pos(),
                            cam.get_view(), 45.0, ASPECT, W, H)
out = trace_octree_fast(lv, o, d, g.origin, g.voxel_size, ball_skip=True,
                        t_start=ts_, live_mask=live)
steps = np.asarray(out["steps"])
hit = np.asarray(out["hit"])
print(f"seeded: live0 {float(np.asarray(live).mean()):.4f} hit {hit.mean():.4f}",
      flush=True)
print("primary alive count after k steps:",
      {k: int((steps > k).sum()) for k in (0, 1, 2, 4, 6, 8, 12, 16, 24, 32)},
      f"max={steps.max()}  (N={N}, N/8={N//8}, N/16={N//16}, N/32={N//32})",
      flush=True)

l = jnp.asarray([-0.5, -0.9, -0.4], jnp.float32)
l = l / jnp.linalg.norm(l)
so = out["point"] + out["normal"] * (g.voxel_size * 2.0)
sd = jnp.broadcast_to(-l[None, :], so.shape)
so = jnp.where(out["hit"][:, None], so, sd * jnp.float32(3e7))
sout = trace_octree_fast(lv, so, sd, g.origin, g.voxel_size, ball_skip=True)
ssteps = np.asarray(sout["steps"])
print("shadow alive count after k steps:",
      {k: int((ssteps > k).sum()) for k in (0, 1, 2, 4, 6, 8, 12, 16, 24, 32)},
      f"max={ssteps.max()} occl={float(np.asarray(sout['hit'])[hit].mean()):.3f}",
      flush=True)

# --- retuned ladders ---------------------------------------------------------
LADDERS = {
    "old (0,N/2)(4,N/8)(8,N/32)": ((0, N // 2), (4, N // 8), (8, N // 32)),
    "tuned (0,N/2)(3,N/4)(8,N/16)": ((0, N // 2), (3, N // 4), (8, N // 16)),
    "tuned2 (0,N/2)(4,N/4)(12,N/16)": ((0, N // 2), (4, N // 4), (12, N // 16)),
}


def make_traced(lad):
    @jax.jit
    def traced(pos, view, live, ts2):
        o, d = generate_rays(W, H, pos, view, 45.0, ASPECT)
        return trace_octree_fast(lv, o, d, g.origin, g.voxel_size,
                                 ball_skip=True, ladder=lad,
                                 t_start=ts2, live_mask=live)["t"]
    return traced


for name, lad in LADDERS.items():
    traced = make_traced(lad)

    def full(i):
        cam = pose(i)
        live, ts2, _ = sweep_seed(dil, g.origin, g.voxel_size, cam.get_pos(),
                                  cam.get_view(), 45.0, ASPECT, W, H)
        return traced(*pv(i), live, ts2)

    dt = bench(f"seed+trace {name}", full)
    print(f"  => {N/dt/1e6:.2f} Mrays/s primary-only", flush=True)
