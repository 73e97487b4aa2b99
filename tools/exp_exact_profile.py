"""Decompose the exact tracer's frame cost on the real chip.

Measures, independently and jitted end-to-end:
  1. ray-gen alone
  2. the seed sweep (sweep_seed) alone
  3. K lockstep DDA steps at several widths (K = 1,2,4,8,16) -> per-iter
     slope + fixed intercept per dispatch width
  4. the full seeded ladder trace
  5. step-count statistics at the bench pose (p50/p90/max, live fraction
     after 2/4/8 steps) to size the ladder correctly

Usage: python tools/exp_exact_profile.py [WxH] [iters]
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
from ray_tracing_octrees_tpu.render.camera import Camera, generate_rays
from ray_tracing_octrees_tpu.trace.octree_trace import trace_octree_fast
from ray_tracing_octrees_tpu.trace.slab_sweep import (
    dilate_occupancy,
    sweep_seed,
)


def main():
    res = sys.argv[1] if len(sys.argv) > 1 else "960x540"
    W, H = (int(x) for x in res.split("x"))
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    aspect = W / H

    g = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
    pyr = build_pyramid(g.occ)
    lv = jax.block_until_ready(build_leaf_volume(pyr))
    vol = (jnp.asarray(g.occ) > 0).astype(jnp.float32)
    dil = jax.block_until_ready(dilate_occupancy(vol))

    extent = float(np.max(np.asarray(g.world_max) - np.asarray(g.world_min)))
    center = np.asarray(building_center(g))
    n = W * H

    def pose(i):
        cam = Camera(theta=0.9 + 1e-4 * i, phi=0.8, radius=0.75 * extent)
        cam.set_target(center)
        return cam

    def bench(label, fn, scale=1):
        out = fn(0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [fn(1 + i) for i in range(iters)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:36s} {dt*1e3:9.3f} ms", flush=True)
        return dt

    @jax.jit
    def raygen(pos, view):
        return generate_rays(W, H, pos, view, 45.0, aspect)

    def pv(i):
        cam = pose(i)
        return (jnp.asarray(cam.get_pos(), jnp.float32),
                jnp.asarray(cam.get_view(), jnp.float32))

    bench("raygen", lambda i: raygen(*pv(i)))

    # sweep_seed decides the sweep axis host-side (returns a Python bool),
    # so it is timed eagerly — exactly how the frame calls it.
    def seed_eager(i):
        cam = pose(i)
        live, ts2, _ = sweep_seed(dil, g.origin, g.voxel_size, cam.get_pos(),
                                  cam.get_view(), 45.0, aspect, W, H)
        return live, ts2

    bench("sweep_seed (eager)", seed_eager)

    # --- K lockstep steps at several widths -------------------------------------
    import functools

    @functools.partial(jax.jit, static_argnames=("k", "width"))
    def ksteps(pos, view, k, width):
        o, d = raygen(pos, view)
        o = o[:width]
        d = d[:width]
        return trace_octree_fast(lv, o, d, g.origin, g.voxel_size,
                                 ball_skip=True, max_steps=k)["t"]

    for width in (n, n // 8, n // 32):
        ts = {}
        for k in (1, 2, 4, 8, 16):
            ts[k] = bench(f"  {k:2d} steps @ width {width}",
                          lambda i, k=k: ksteps(*pv(i), k=k, width=width))
        slope = (ts[16] - ts[4]) / 12
        print(f"  width {width}: per-iter {slope*1e3:.3f} ms, "
              f"intercept {(ts[1]-slope)*1e3:.3f} ms", flush=True)

    # --- step statistics at the bench pose (seeded) ------------------------------
    cam = pose(0)
    pos, view = pv(0)
    o, d = raygen(pos, view)
    live, ts_, ext = sweep_seed(dil, g.origin, g.voxel_size, cam.get_pos(),
                                cam.get_view(), 45.0, aspect, W, H)
    out = trace_octree_fast(lv, o, d, g.origin, g.voxel_size, ball_skip=True,
                            t_start=ts_, live_mask=live)
    steps = np.asarray(out["steps"]) if "steps" in out else None
    if steps is not None:
        alive_frac = [(steps > k).mean() for k in (0, 2, 4, 8, 16, 32)]
        print(f"steps p50={np.percentile(steps,50):.0f} "
              f"p90={np.percentile(steps,90):.0f} "
              f"p99={np.percentile(steps,99):.0f} max={steps.max()}",
              flush=True)
        print("live frac after 0/2/4/8/16/32 steps:",
              [round(float(a), 4) for a in alive_frac], flush=True)

    # --- full seeded ladder trace, jitted once ------------------------------------
    lad = ((0, n // 2), (4, n // 8), (8, n // 32))

    @functools.partial(jax.jit, static_argnames=("use_ladder",))
    def traced(pos, view, live, ts2, use_ladder):
        o, d = raygen(pos, view)
        return trace_octree_fast(lv, o, d, g.origin, g.voxel_size,
                                 ball_skip=True,
                                 ladder=lad if use_ladder else (),
                                 t_start=ts2, live_mask=live)["t"]

    def full(i, use_ladder):
        cam = pose(i)
        live, ts2, _ = sweep_seed(dil, g.origin, g.voxel_size, cam.get_pos(),
                                  cam.get_view(), 45.0, aspect, W, H)
        return traced(*pv(i), live, ts2, use_ladder)

    dt = bench("seed + jitted ladder trace", lambda i: full(i, True))
    print(f"=> {n/dt/1e6:.2f} Mrays/s primary-only", flush=True)
    dt = bench("seed + jitted trace (no ladder)", lambda i: full(i, False))
    print(f"=> {n/dt/1e6:.2f} Mrays/s primary-only", flush=True)


if __name__ == "__main__":
    main()
