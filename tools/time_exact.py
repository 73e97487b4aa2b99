"""Measure the exact-tracer ladder on the real chip (VERDICT r2 task 4).

Times the leaf-volume tracer variants on Calgary at the bench pose:
plain / +ball / +ladder / +seed, then the full render_octree_image frame
(primary+shadow) at the bench exact resolution. Honest timing: distinct
pose per iteration, pipelined enqueues, final forced readback.

Usage: python tools/time_exact.py [WxH] [iters]
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
from ray_tracing_octrees_tpu.core.grid import (
    building_center,
    recenter_filled_voxels,
)
from ray_tracing_octrees_tpu.core.octree import build_leaf_volume, build_pyramid
from ray_tracing_octrees_tpu.models.octree_raytracer import render_octree_image
from ray_tracing_octrees_tpu.render.camera import Camera, generate_rays
from ray_tracing_octrees_tpu.trace.octree_trace import trace_octree_fast
from ray_tracing_octrees_tpu.trace.slab_sweep import (
    dilate_occupancy,
    light_blocked_volume,
    sweep_seed,
)

TO_LIGHT = (0.5, 0.9, 0.4)
LIGHT_DIR = tuple(-c for c in TO_LIGHT)


def main():
    res = sys.argv[1] if len(sys.argv) > 1 else "960x540"
    W, H = (int(x) for x in res.split("x"))
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    aspect = W / H

    g = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
    pyr = build_pyramid(g.occ)
    t0 = time.perf_counter()
    lv = jax.block_until_ready(build_leaf_volume(pyr))
    print(f"leaf_vol {lv.shape} {time.perf_counter()-t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    vol = (jnp.asarray(g.occ) > 0).astype(jnp.float32)
    dil = jax.block_until_ready(dilate_occupancy(vol))
    print(f"dilated {dil.shape} {time.perf_counter()-t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    blk = jax.block_until_ready(light_blocked_volume(dil, TO_LIGHT))
    print(f"light_blocked {time.perf_counter()-t0:.2f}s "
          f"(maybe-occluded {float(jnp.mean(blk)):.3f})", flush=True)

    extent = float(np.max(np.asarray(g.world_max) - np.asarray(g.world_min)))
    center = np.asarray(building_center(g))
    n = W * H
    lad = ((0, n // 2), (3, int(n * 0.3)), (6, n // 8), (10, n // 32),
           (16, n // 128))
    shadow_lad = ((0, int(n * 0.28)), (6, int(n * 0.225)), (12, n // 8),
                  (16, n // 16), (20, n // 64))

    def pose(i):
        cam = Camera(theta=0.9 + 1e-4 * i, phi=0.8, radius=0.75 * extent)
        cam.set_target(center)
        return cam

    def rays(cam):
        return generate_rays(
            W, H, jnp.asarray(cam.get_pos(), jnp.float32),
            jnp.asarray(cam.get_view(), jnp.float32), 45.0, aspect)

    def bench(label, fn):
        out = fn(0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [fn(1 + i) for i in range(iters)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:28s} {dt*1e3:8.2f} ms  "
              f"{n/dt/1e6:8.2f} Mrays/s (primary-only)", flush=True)
        return dt

    def var(i, **kw):
        o, d = rays(pose(i))
        return trace_octree_fast(lv, o, d, g.origin, g.voxel_size, **kw)["t"]

    bench("leaf_vol plain", lambda i: var(i))
    bench("+ball", lambda i: var(i, ball_skip=True))
    bench("+ball+ladder", lambda i: var(i, ball_skip=True, ladder=lad))

    def seeded(i):
        cam = pose(i)
        o, d = rays(cam)
        live, ts, ext = sweep_seed(
            dil, g.origin, g.voxel_size, cam.get_pos(), cam.get_view(),
            45.0, aspect, W, H)
        assert ext
        return trace_octree_fast(
            lv, o, d, g.origin, g.voxel_size, ball_skip=True, ladder=lad,
            t_start=ts, live_mask=live)["t"]

    bench("+ball+ladder+seed", seeded)

    @jax.jit
    def _frame(pos, view, live, ts):
        return render_octree_image(
            pyr, g.origin, g.voxel_size, pos, view,
            W, H, jnp.float32(45.0), jnp.float32(aspect), shadows=True,
            leaf_vol=lv, ball_skip=True, ladder=lad, light_dir=LIGHT_DIR,
            seed_live=live, seed_t=ts,
            shadow_live_vol=None)  # prune off: zero rays pruned on Calgary

    def full_frame(i):
        cam = pose(i)
        live, ts, ext = sweep_seed(
            dil, g.origin, g.voxel_size, cam.get_pos(), cam.get_view(),
            45.0, aspect, W, H)
        return _frame(
            jnp.asarray(cam.get_pos(), jnp.float32),
            jnp.asarray(cam.get_view(), jnp.float32),
            live if ext else None, ts if ext else None)

    dt = bench("frame primary+shadow", full_frame)
    print(f"exact_tracer_mrays (x2 rays): {2*n/dt/1e6:.2f}", flush=True)


if __name__ == "__main__":
    main()
