"""Candidate-texel statistics for the mesh tracer at the bench poses.

Reports, per pose: smax (the kcells=4 eligibility slope), the number of
texels with ANY candidate slab (the natural width of the first consume
round), and the popcount distribution — to size a compact-at-start
ladder rung (round 1 currently runs at the full 1024^2 width).

Usage: python tools/exp_cand_stats.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ray_tracing_octrees_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from ray_tracing_octrees_tpu.core.cache import load_voxel_grid
from ray_tracing_octrees_tpu.core.grid import (
    building_center, host_fetch, recenter_filled_voxels,
)
from ray_tracing_octrees_tpu.render.camera import Camera
from ray_tracing_octrees_tpu.trace import mesh_grid as mgrid

TO_LIGHT = (0.5, 0.9, 0.4)


def main():
    g = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
    scene = mgrid.prepare_mc_scene(g.occ, g.origin, g.voxel_size,
                                   to_light=TO_LIGHT)
    extent = float(np.max(np.asarray(g.world_max) - np.asarray(g.world_min)))
    center = np.asarray(building_center(g))
    IH = IW = 1024
    N = IH * IW

    for i in range(4):
        cam = Camera(theta=0.9 + 0.2 * i, phi=0.8 - 0.15 * i,
                     radius=0.75 * extent)
        cam.set_target(center)
        (axis_world, flip, (S, A, B), case_sw, shadow_sw, scal_np, kcells) \
            = mgrid._scene_sweep_setup(scene, cam.get_pos(), cam.get_view(),
                                       45.0, 1920 / 1088, IH, IW)
        scal = jnp.asarray(scal_np)
        hats = mgrid._build_detect_hats(scal, case_sw.shape[0], S, A, B,
                                        IH, IW, bool(flip))
        detect_sw = mgrid._detect_volume(case_sw)
        bits = mgrid._sweep_candidates(detect_sw, hats, case_sw.shape[0] // 32,
                                       S, A, B, IH, IW, bool(flip))
        pc = jax.lax.population_count(
            jax.lax.bitcast_convert_type(bits, jnp.uint32)
        ).sum(axis=1)
        pc = host_fetch(pc.astype(jnp.int32))
        n_any = int((pc > 0).sum())
        # recompute smax exactly as _scene_sweep_setup's kcells gate does
        eye_s, eye_a, eye_b, z0 = scal_np[0], scal_np[1], scal_np[2], scal_np[3]
        a_min, a_max, b_min, b_max = scal_np[4:8]
        smax = max(abs(a_min - eye_a), abs(a_max - eye_a),
                   abs(b_min - eye_b), abs(b_max - eye_b)) \
            / max(abs(z0 - eye_s), 1e-12)
        head = (f"pose {i}: axis={axis_world} kcells={kcells} smax={smax:.2f} "
                f"sp={case_sw.shape[0]} cands={n_any} ({n_any / N:.3f} N)")
        if n_any == 0:
            print(head + "  (no candidate texels)", flush=True)
        else:
            print(head + f"  popcount mean={pc[pc > 0].mean():.2f} "
                  f"p99={np.percentile(pc[pc > 0], 99):.0f}", flush=True)


if __name__ == "__main__":
    main()
