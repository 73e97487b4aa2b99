"""Time the sweep-space volume raymarcher on the real chip.

Honest timing per docs/ROADMAP.md: force a real readback first, then a
pipelined loop with per-iteration varying camera so no result is cached.

Usage: python tools/time_raymarch_sweep.py [WxH ...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ray_tracing_octrees_tpu.config import DEFAULT_CONFIG
from ray_tracing_octrees_tpu.core.cache import load_voxel_grid
from ray_tracing_octrees_tpu.core.grid import (
    building_center, make_sphere_grid, recenter_filled_voxels)
from ray_tracing_octrees_tpu.core.octree import build_pyramid
from ray_tracing_octrees_tpu.models.volume_raycaster import VolumeRaycastRenderer
from ray_tracing_octrees_tpu.render.camera import Camera
from ray_tracing_octrees_tpu.trace.raymarch_sweep import (
    prepare_volume_scene, render_volume_frame)


def main():
    sizes = [tuple(map(int, a.split("x"))) for a in sys.argv[1:]] or [
        (256, 256), (512, 512), (1920, 1080)]
    path = "/root/reference/sceneCache.bin"
    if os.path.exists(path):
        g = recenter_filled_voxels(load_voxel_grid(path))
        name = "calgary"
    else:
        g = make_sphere_grid(128)
        name = "sphere128"
    print(f"scene {name} dims {g.occ.shape} voxel {float(g.voxel_size):.5f}")
    t0 = time.perf_counter()
    rc = VolumeRaycastRenderer(DEFAULT_CONFIG).init(g, build_pyramid(g.occ))
    if rc.precompute_needed:
        rc.run_precompute()
    print(f"precompute {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    scene = prepare_volume_scene(rc.textures, float(g.voxel_size))
    print(f"prepare_volume_scene {time.perf_counter()-t0:.1f}s")
    extent = float(np.max(np.asarray(g.world_max) - np.asarray(g.world_min)))
    center = np.asarray(building_center(g))

    for W, H in sizes:
        def frame(i):
            cam = Camera(theta=0.9 + 0.01 * i, phi=0.8 - 0.005 * i,
                         radius=0.75 * extent)
            cam.set_target(center)
            return render_volume_frame(
                scene, g.origin, cam.get_pos(), cam.get_view(),
                45.0, W / H, W, H, time_value=0.1 * i)

        t0 = time.perf_counter()
        out = frame(0)
        np.asarray(out["color"])  # forced real readback
        print(f"{W}x{H}: first frame (compile) {time.perf_counter()-t0:.1f}s "
              f"hit_frac {float((np.asarray(out['alpha'])>=0.1).mean()):.3f}")
        n = 20
        t0 = time.perf_counter()
        outs = [frame(1 + i) for i in range(n)]
        jax.block_until_ready([o["color"] for o in outs])
        dt = (time.perf_counter() - t0) / n
        print(f"{W}x{H}: {dt*1e3:.2f} ms/frame  {W*H/dt/1e6:.1f} Mrays/s")


if __name__ == "__main__":
    main()
