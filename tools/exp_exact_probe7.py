"""Full exact-frame tuning: deep ladders + shadow seed, on the bench pose.

Times render_octree_image (primary+shadow, one jitted program) across
ladder schedules and shadow-seed on/off, 960x540.

Usage: python tools/exp_exact_probe7.py [WxH]
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
from ray_tracing_octrees_tpu.render.camera import Camera
from ray_tracing_octrees_tpu.trace.slab_sweep import (
    build_shadow_seed,
    dilate_occupancy,
    sweep_seed,
)

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
t0 = time.perf_counter()
sseed = build_shadow_seed(dil, TO_LIGHT)
print(f"shadow seed built {time.perf_counter()-t0:.2f}s "
      f"bits2d {sseed.bits2d.shape}", flush=True)

extent = float(np.max(np.asarray(g.world_max) - np.asarray(g.world_min)))
center = np.asarray(building_center(g))


def pose(i):
    cam = Camera(theta=0.9 + 1e-4 * i, phi=0.8, radius=0.75 * extent)
    cam.set_target(center)
    return cam


def bench(label, fn, iters=6):
    out = fn(0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(1 + i) for i in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:44s} {dt*1e3:9.2f} ms  {2*N/dt/1e6:7.2f} Mrays/s (x2)",
          flush=True)
    return dt


PRIM = ((0, N // 2), (3, int(N * 0.3)), (6, N // 8), (10, N // 32),
        (16, N // 128))
SHAD = ((0, int(N * 0.28)), (6, int(N * 0.225)), (12, N // 8),
        (16, N // 16), (20, N // 64))
OLD = ((0, N // 2), (4, N // 8), (8, N // 32))

CONFIGS = [
    ("old lad, no sseed", OLD, None, None),
    ("deep prim+shad lad, no sseed", PRIM, SHAD, None),
    ("deep lads + shadow seed", PRIM, SHAD, sseed),
    ("deep prim, shad seed+short lad", PRIM,
     ((0, int(N * 0.28)), (4, N // 16), (8, N // 64)), sseed),
]

for label, plad, slad, ss in CONFIGS:
    @jax.jit
    def _frame(pos, view, live, ts, _p=plad, _s=slad, _ss=ss):
        return render_octree_image(
            pyr, g.origin, g.voxel_size, pos, view, W, H,
            jnp.float32(45.0), jnp.float32(ASPECT), shadows=True,
            leaf_vol=lv, ball_skip=True, ladder=_p, shadow_ladder=_s,
            light_dir=LIGHT_DIR, seed_live=live, seed_t=ts,
            shadow_seed=_ss, safety_cap=N // 16)

    def f(i, _fr=_frame):
        cam = pose(i)
        live, ts, ext = sweep_seed(
            dil, g.origin, g.voxel_size, cam.get_pos(), cam.get_view(),
            45.0, ASPECT, W, H)
        assert ext
        return _fr(jnp.asarray(cam.get_pos(), jnp.float32),
                   jnp.asarray(cam.get_view(), jnp.float32), live, ts)

    bench(label, f)
