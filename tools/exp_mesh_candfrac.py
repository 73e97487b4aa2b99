"""Candidate-texel fraction for the mesh tracer at fly-through poses.

Measures, per pose: the fraction of texels with >= 1 candidate slab
(the width a start-compacted ladder stage 0 must fit), plus the per-axis
max slopes (footprint shape selector) — sizes the kcells={4,6,9} gate
and the start-compaction ladder widths.

Usage: python tools/exp_mesh_candfrac.py [inter]
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
from ray_tracing_octrees_tpu.core.grid import building_center, recenter_filled_voxels
from ray_tracing_octrees_tpu.render.camera import Camera
from ray_tracing_octrees_tpu.trace import mesh_grid as mgrid

IH = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
W, H = 1920, 1088
TO_LIGHT = (0.5, 0.9, 0.4)


def main():
    g = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
    scene = mgrid.prepare_mc_scene(g.occ, g.origin, g.voxel_size,
                                   to_light=TO_LIGHT)
    extent = float(np.max(np.asarray(g.world_max) - np.asarray(g.world_min)))
    center = np.asarray(building_center(g))

    poses = [("bench", 0.9, 0.8, 0.75),
             ("fly1", 1.6, 0.4, 0.75),
             ("fly2", 2.4, 1.1, 0.75),
             ("close", 0.9, 0.8, 0.45)]
    for name, th, ph, rf in poses:
        cam = Camera(theta=th, phi=ph, radius=rf * extent)
        cam.set_target(center)
        (axis_world, flip, (S, A, B), case_sw, shadow_sw, scal_np,
         kcells) = mgrid._scene_sweep_setup(scene, cam.get_pos(),
                                            cam.get_view(), 45.0, W / H,
                                            IH, IH)
        eye_s, eye_a, eye_b, z0 = scal_np[0], scal_np[1], scal_np[2], scal_np[3]
        a_min, a_max, b_min, b_max = scal_np[4:8]
        denom = abs(float(z0 - eye_s))
        sa = max(abs(float(a_min - eye_a)), abs(float(a_max - eye_a))) / denom
        sb = max(abs(float(b_min - eye_b)), abs(float(b_max - eye_b))) / denom

        hats = mgrid._build_detect_hats(scal_np if hasattr(scal_np, "shape")
                                        else jnp.asarray(scal_np),
                                        case_sw.shape[0], S, A, B, IH, IH,
                                        bool(flip))
        det = mgrid._detect_volume(case_sw)
        bits = mgrid._sweep_candidates(det, hats, case_sw.shape[0] // 32,
                                       S, A, B, IH, IH, bool(flip))
        has = (bits != 0).any(axis=1)
        frac = float(jnp.mean(has.astype(jnp.float32)))
        nslabs = float(jnp.mean(
            jnp.sum(jax.lax.population_count(bits), axis=1)
            .astype(jnp.float32)))
        print(f"{name:6s} axis={axis_world} flip={flip} kcells={kcells} "
              f"slope_a={sa:.2f} slope_b={sb:.2f} "
              f"cand_frac={frac:.4f} mean_slabs={nslabs:.2f}", flush=True)


if __name__ == "__main__":
    main()
