"""Measure the marginal cost of slot passes in the mesh tracer's rounds.

Times _trace_texels at the Calgary bench pose with kcells forced to 4
(2x2 footprint-corner slots) vs the setup-chosen 9 (full 3x3), plus the
hit-count delta between them (the 4-slot form drops mid-cells for
slope>1 rows — this quantifies both the speed and the accuracy cost).

Usage: python tools/exp_mesh_kcells.py [iters]
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

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
W, H = 1920, 1088
TO_LIGHT = (0.5, 0.9, 0.4)


def main():
    g = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
    scene = mg.prepare_mc_scene(g.occ, g.origin, g.voxel_size,
                                to_light=TO_LIGHT)
    extent = float(np.max(np.asarray(g.world_max) - np.asarray(g.world_min)))
    center = np.asarray(building_center(g))
    cam = Camera(theta=0.9, phi=0.8, radius=0.75 * extent)
    cam.set_target(center)
    aspect = W / H

    (axis_world, flip, (S, A, B), case_sw, shadow_sw, scal_np,
     kc_auto) = mg._scene_sweep_setup(scene, cam.get_pos(), cam.get_view(),
                                      45.0, aspect, 1024, 1024)
    print(f"setup: axis={axis_world} S,A,B={S},{A},{B} kcells_auto={kc_auto}",
          flush=True)

    ref_hits = None
    for kc in (9, 4):
        def run(eps):
            sc = jnp.asarray(scal_np).at[15].add(eps)
            return mg._trace_texels(
                case_sw, shadow_sw, sc,
                case_sw.shape[0] // 32, S, A, B, 1024, 1024, bool(flip),
                axis_world, 12, 512, shadow_sw is not None, kcells=kc)

        res = run(0.0)
        jax.block_until_ready(res["hit"])
        hits = int(np.asarray(res["hit"]).sum())
        stats = dict(rounds=int(res["rounds"]),
                     unresolved=int(res["unresolved"]),
                     overflow=int(res["overflow"]), hits=hits)
        if ref_hits is None:
            ref_hits = np.asarray(res["hit"])
            t_ref = np.asarray(res["t"])
            mism = 0
            drms = 0.0
        else:
            h = np.asarray(res["hit"])
            mism = int((h != ref_hits).sum())
            both = h & ref_hits
            drms = float(np.sqrt(np.mean(
                (np.asarray(res["t"])[both] - t_ref[both]) ** 2))) if both.any() else 0.0
        t0 = time.perf_counter()
        outs = [run(1e-6 * (i + 1))["hit"] for i in range(ITERS)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / ITERS
        print(f"kcells={kc}: {dt*1e3:8.2f} ms  {stats} "
              f"hit_mismatch={mism} t_rms_on_both={drms:.4f}", flush=True)


if __name__ == "__main__":
    main()
