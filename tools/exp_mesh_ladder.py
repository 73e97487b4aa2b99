"""Ablate compaction-ladder schedules for the mesh tracer (config 4).

Times the FULL fused frame (rounds + shade + warp) at the Calgary bench
pose for several stage-width schedules, and reports rounds/unresolved/
overflow per schedule (exactness bookkeeping: overflow rows shade as
miss, so a schedule is only admissible when overflow == 0 at the pose).

Usage: python tools/exp_mesh_ladder.py [iters]
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
from ray_tracing_octrees_tpu.render.camera import Camera
from ray_tracing_octrees_tpu.trace import mesh_grid as mg

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
W, H = 1920, 1088
TO_LIGHT = (0.5, 0.9, 0.4)
LIGHT = tuple(-c for c in TO_LIGHT)

ALL_LADDERS = {
    "current(N/2..N/64)": None,
    "decay1.5x(.40/.20/.10/.048/.024/.012/.006)":
        (0.40, 0.20, 0.10, 0.048, 0.024, 0.012, 0.006),
    "decay1.2x(.36/.18/.088/.042/.020/.010/.005)":
        (0.36, 0.18, 0.088, 0.042, 0.020, 0.010, 0.005),
    "few(.40/.10/.024/.006)": (0.40, 0.10, 0.024, 0.006),
    "few(.36/.088/.020/.005)": (0.36, 0.088, 0.020, 0.005),
}
_sel = [x for x in sys.argv[2:]]
LADDERS = {k: v for i, (k, v) in enumerate(ALL_LADDERS.items())
           if not _sel or str(i) in _sel}


def main():
    g = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
    scene = mg.prepare_mc_scene(g.occ, g.origin, g.voxel_size,
                                to_light=TO_LIGHT)
    extent = float(np.max(np.asarray(g.world_max) - np.asarray(g.world_min)))
    center = np.asarray(building_center(g))

    def pose(i):
        cam = Camera(theta=0.9 + 1e-4 * i, phi=0.8, radius=0.75 * extent)
        cam.set_target(center)
        return cam

    aspect = W / H
    for name, lad in LADDERS.items():
        cam = pose(0)
        # stats once (includes overflow)
        res = mg.trace_mc_mesh_texels(
            scene, cam.get_pos(), cam.get_view(), 45.0, aspect,
            max_rounds=12, tol_texels=512, ladder=lad)
        jax.block_until_ready(res["hist"])
        stats = dict(rounds=int(res["rounds"]),
                     unresolved=int(res["unresolved"]),
                     overflow=int(res["overflow"]),
                     hits=int(np.asarray(res["hit"]).sum()))

        def frame(i):
            c = pose(i)
            return mg.render_mc_mesh_frame(
                scene, c.get_pos(), c.get_view(), 45.0, aspect, W, H,
                light_dir=LIGHT, max_rounds=12, tol_texels=512,
                ladder=lad)

        img = frame(0)
        jax.block_until_ready(img)
        t0 = time.perf_counter()
        outs = [frame(1 + i) for i in range(ITERS)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:46s} {dt*1e3:8.2f} ms  "
              f"{W*H*2/dt/1e6:7.2f} Mrays/s  {stats}", flush=True)


if __name__ == "__main__":
    main()
