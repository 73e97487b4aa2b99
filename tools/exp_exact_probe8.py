"""Fixed-cost attribution for the seeded exact frame at 960x540.

Times, separately and pipelined over distinct poses:
  1. sweep_seed alone (the per-frame conservative seed sweep),
  2. the seeded PRIMARY-only jitted frame (shadows=False),
  3. the full primary+shadow jitted frame,
  4. the raw seeded primary TRACE (no image epilogue) via trace_octree_fast.

Usage: python tools/exp_exact_probe8.py [WxH]
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
from ray_tracing_octrees_tpu.models.octree_raytracer import render_octree_image
from ray_tracing_octrees_tpu.render.camera import Camera, generate_rays
from ray_tracing_octrees_tpu.trace.octree_trace import trace_octree_fast
from ray_tracing_octrees_tpu.trace.slab_sweep import dilate_occupancy, sweep_seed

res = sys.argv[1] if len(sys.argv) > 1 else "960x540"
W, H = (int(x) for x in res.split("x"))
N = W * H
ASPECT = W / H
TO_LIGHT = (0.5, 0.9, 0.4)
LIGHT_DIR = tuple(-c for c in TO_LIGHT)

g = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
pyr = build_pyramid(g.occ)
lv = jax.block_until_ready(build_leaf_volume(pyr))
vol = (jnp.asarray(g.occ) > 0).astype(jnp.float32)
dil = jax.block_until_ready(dilate_occupancy(vol))

extent = float(np.max(np.asarray(g.world_max) - np.asarray(g.world_min)))
center = np.asarray(building_center(g))

PRIM = ((0, N // 2), (3, int(N * 0.3)), (6, N // 8), (10, N // 32),
        (16, N // 128))
SHAD = ((0, int(N * 0.28)), (6, int(N * 0.225)), (12, N // 8),
        (16, N // 16), (20, N // 64))


def pose(i):
    cam = Camera(theta=0.9 + 1e-4 * i, phi=0.8, radius=0.75 * extent)
    cam.set_target(center)
    return cam


def bench(label, fn, iters=8):
    out = fn(0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(1 + i) for i in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:46s} {dt*1e3:9.2f} ms", flush=True)
    return dt


# 1. seed sweep alone
def f_seed(i):
    cam = pose(i)
    live, ts, ext = sweep_seed(dil, g.origin, g.voxel_size, cam.get_pos(),
                               cam.get_view(), 45.0, ASPECT, W, H)
    return live, ts

bench("sweep_seed alone", f_seed)


# 2-3. jitted frames
def make_frame(shadows):
    @jax.jit
    def _frame(pos, view, live, ts):
        return render_octree_image(
            pyr, g.origin, g.voxel_size, pos, view, W, H,
            jnp.float32(45.0), jnp.float32(ASPECT), shadows=shadows,
            leaf_vol=lv, ball_skip=True, ladder=PRIM,
            shadow_ladder=SHAD, safety_cap=N // 16,
            light_dir=LIGHT_DIR, seed_live=live, seed_t=ts)
    return _frame

for shadows, label in ((False, "frame primary only (seeded)"),
                       (True, "frame primary+shadow (seeded)")):
    fr = make_frame(shadows)

    def f(i, _fr=fr):
        cam = pose(i)
        live, ts, ext = sweep_seed(dil, g.origin, g.voxel_size,
                                   cam.get_pos(), cam.get_view(), 45.0,
                                   ASPECT, W, H)
        return _fr(jnp.asarray(cam.get_pos(), jnp.float32),
                   jnp.asarray(cam.get_view(), jnp.float32), live, ts)

    bench(label, f)

# 3b. frames with PRECOMPUTED seeds (isolates the trace+shade cost)
seeds = {}
for i in range(10):
    cam = pose(i)
    live, ts, ext = sweep_seed(dil, g.origin, g.voxel_size, cam.get_pos(),
                               cam.get_view(), 45.0, ASPECT, W, H)
    assert ext
    seeds[i] = (jax.block_until_ready(live), jax.block_until_ready(ts),
                jnp.asarray(cam.get_pos(), jnp.float32),
                jnp.asarray(cam.get_view(), jnp.float32))

for shadows, label in ((False, "frame primary only (pre-seeded)"),
                       (True, "frame primary+shadow (pre-seeded)")):
    fr = make_frame(shadows)

    def f(i, _fr=fr):
        live, ts, p, v = seeds[(1 + i) % 10]
        return _fr(p, v, live, ts)

    bench(label, f)


# 4. raw seeded primary trace, no epilogue
@jax.jit
def _trace(pos, view, live, ts):
    o, d = generate_rays(W, H, pos, view, jnp.float32(45.0),
                         jnp.float32(ASPECT))
    out = trace_octree_fast(lv, o, d, g.origin, g.voxel_size,
                            ball_skip=True, ladder=PRIM, t_start=ts,
                            live_mask=live, const_origin=True,
                            safety_cap=N // 16)
    return out["hit"], out["t"]


def f_tr(i):
    live, ts, p, v = seeds[(1 + i) % 10]
    return _trace(p, v, live, ts)

bench("raw primary trace (pre-seeded)", f_tr)
