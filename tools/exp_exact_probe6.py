"""Ablation: marginal cost of each ladder stage + fixed-cost accounting.

Times sweep_seed alone, then the seeded PRIMARY trace with ladder prefixes
of increasing depth, then the shadow trace likewise. All on the bench pose.

Usage: python tools/exp_exact_probe6.py
"""

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


def bench(label, fn, iters=8):
    out = fn(0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(1 + i) for i in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:58s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def seed_of(i):
    cam = pose(i)
    return sweep_seed(dil, g.origin, g.voxel_size, cam.get_pos(),
                      cam.get_view(), 45.0, ASPECT, W, H)


bench("sweep_seed alone", lambda i: seed_of(i)[1])

PRIM = ((0, 259200), (3, 155520), (6, 64800), (10, 16200), (16, 4050))
for depth in range(len(PRIM) + 1):
    lad = PRIM[:depth]

    @jax.jit
    def traced(pos, view, live, ts, _lad=lad):
        o, d = generate_rays(W, H, pos, view, 45.0, ASPECT)
        return trace_octree_fast(lv, o, d, g.origin, g.voxel_size,
                                 ball_skip=True, ladder=_lad,
                                 t_start=ts, live_mask=live,
                                 const_origin=True,
                                 safety_cap=32400 if _lad else 0)["t"]

    def full(i, _t=traced):
        live, ts2, _ = seed_of(i)
        return _t(*pv(i), live, ts2)

    bench(f"primary seeded ladder depth {depth}: {lad}", full)

# shadow side: fixed primary result, shadow trace alone
cam = pose(0)
o, d = generate_rays(W, H, *pv(0), 45.0, ASPECT)
live, ts_, _ = seed_of(0)
out = trace_octree_fast(lv, o, d, g.origin, g.voxel_size, ball_skip=True,
                        t_start=ts_, live_mask=live, const_origin=True)
l = jnp.asarray([-0.5, -0.9, -0.4], jnp.float32)
l = l / jnp.linalg.norm(l)
so = jax.block_until_ready(
    jnp.where(out["hit"][:, None],
              out["point"] + out["normal"] * (g.voxel_size * 2.0),
              (-l)[None, :] * jnp.float32(3e7)))
hitm = jax.block_until_ready(out["hit"])
sd0 = -l

SHAD = ((0, 145800), (6, 116640), (12, 58320), (16, 25920), (20, 6480))
for depth in range(len(SHAD) + 1):
    lad = SHAD[:depth]

    @jax.jit
    def straced(so_, hitm_, jitter, _lad=lad):
        sd = jnp.broadcast_to(sd0[None, :], so_.shape)
        return trace_octree_fast(lv, so_ + jitter, sd, g.origin,
                                 g.voxel_size, ball_skip=True, ladder=_lad,
                                 live_mask=hitm_, const_dir=True,
                                 safety_cap=32400 if _lad else 0)["t"]

    bench(f"shadow ladder depth {depth}: {lad}",
          lambda i, _t=straced: _t(so, hitm, jnp.float32(1e-4 * i)))
