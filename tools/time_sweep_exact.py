"""Time the SWEEP-EXACT tracer on Calgary at the bench pose (real TPU).

Measures the full exact frame (primary + per-pixel exact shadow rays,
reference semantics per tests/test_sweep_exact.py) with pipelined
enqueues over distinct poses, plus a primary-only variant.

Usage: python tools/time_sweep_exact.py [WxH] [iters]
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
from ray_tracing_octrees_tpu.render.camera import Camera
from ray_tracing_octrees_tpu.trace.sweep_exact import (
    build_shadow_field,
    render_exact_frame,
    trace_pixels_sweep_exact,
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
    vol = (jnp.asarray(g.occ) > 0).astype(jnp.float32)
    org = np.asarray(g.origin)
    vs = float(np.asarray(g.voxel_size))
    t0 = time.perf_counter()
    sfld = build_shadow_field(vol, LIGHT_DIR, vs)
    print(f"shadow_field {None if sfld is None else (sfld.inter_h, sfld.inter_w)} "
          f"{time.perf_counter()-t0:.2f}s", flush=True)

    extent = float(np.max(np.asarray(g.world_max) - np.asarray(g.world_min)))
    center = np.asarray(building_center(g))

    def pose(i):
        cam = Camera(theta=0.9 + 1e-4 * i, phi=0.8, radius=0.75 * extent)
        cam.set_target(center)
        return cam

    def bench(label, fn, rays):
        out = fn(0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [fn(1 + i) for i in range(iters)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:28s} {dt*1e3:9.2f} ms  {rays/dt/1e6:8.2f} Mrays/s",
              flush=True)
        return dt

    def primary(i):
        cam = pose(i)
        r = trace_pixels_sweep_exact(vol, lv, org, vs, cam.get_pos(),
                                     cam.get_view(), W, H, 45.0, aspect)
        assert r is not None
        return r["t"]

    def frame(i):
        cam = pose(i)
        out = render_exact_frame(vol, lv, org, vs, cam.get_pos(),
                                 cam.get_view(), W, H, 45.0, aspect,
                                 light_dir=LIGHT_DIR, shadows=True,
                                 shadow_field=sfld)
        assert out is not None
        return out[0]

    bench("primary only", primary, W * H)
    bench("frame primary+shadow", frame, W * H * 2)
    cam = pose(0)
    out = render_exact_frame(vol, lv, org, vs, cam.get_pos(),
                             cam.get_view(), W, H, 45.0, aspect,
                             light_dir=LIGHT_DIR, shadows=True,
                             shadow_field=sfld)
    img, stats = out
    print("stats:", {k: int(v) for k, v in stats.items()}, flush=True)
    from ray_tracing_octrees_tpu.render.image import write_png
    write_png("/tmp/sweep_exact_calgary.png", np.asarray(img))
    print("saved /tmp/sweep_exact_calgary.png", flush=True)


if __name__ == "__main__":
    main()
