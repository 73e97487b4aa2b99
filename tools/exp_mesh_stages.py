"""Stage-split timing for the grid-wavefront mesh tracer (config 4).

Times, on the real chip at the Calgary bench pose:
  - the candidate bit-field sweep alone
  - _trace_texels at max_rounds = 1, 2, 4, 8 (round-decay curve)
  - the fused full frame
Prints hist/unresolved so round counts can be read against the decay.

Usage: python tools/exp_mesh_stages.py [inter] [iters]
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
from ray_tracing_octrees_tpu.trace import mesh_grid as mgrid

IH = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
W, H = 1920, 1088
TO_LIGHT = (0.5, 0.9, 0.4)


def main():
    g = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
    scene = mgrid.prepare_mc_scene(g.occ, g.origin, g.voxel_size,
                                   to_light=TO_LIGHT)
    extent = float(np.max(np.asarray(g.world_max) - np.asarray(g.world_min)))
    center = np.asarray(building_center(g))

    def pose(i):
        cam = Camera(theta=0.9 + 1e-4 * i, phi=0.8, radius=0.75 * extent)
        cam.set_target(center)
        return cam

    def bench(label, fn):
        out = fn(0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [fn(1 + i) for i in range(ITERS)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{label:34s} {dt*1e3:9.2f} ms", flush=True)
        return dt

    import functools

    @functools.partial(jax.jit, static_argnames=(
        "n_chunks", "s_valid", "a_size", "b_size", "flip"))
    def sweep_only(case_sw, scal, n_chunks, s_valid, a_size, b_size, flip):
        hats = mgrid._build_detect_hats(scal, case_sw.shape[0], s_valid,
                                        a_size, b_size, IH, IH, flip)
        det = mgrid._detect_volume(case_sw)
        return mgrid._sweep_candidates(det, hats, n_chunks, s_valid,
                                       a_size, b_size, IH, IH, flip)

    def setup(i):
        cam = pose(i)
        return (cam, *mgrid._scene_sweep_setup(
            scene, cam.get_pos(), cam.get_view(), 45.0, W / H, IH, IH))

    def sweep_fn(i):
        (cam, axis_world, flip, (S, A, B), case_sw, shadow_sw, scal_np,
         kcells) = setup(i)
        return sweep_only(case_sw, jnp.asarray(scal_np),
                          case_sw.shape[0] // 32, S, A, B, bool(flip))

    bench("candidate sweep alone", sweep_fn)

    def trace_fn(i, mr):
        (cam, axis_world, flip, (S, A, B), case_sw, shadow_sw, scal_np,
         kcells) = setup(i)
        return mgrid._trace_texels(
            case_sw, shadow_sw, jnp.asarray(scal_np),
            case_sw.shape[0] // 32, S, A, B, IH, IH, bool(flip),
            axis_world, mr, 512, shadow_sw is not None, kcells=kcells,
        )["t"]

    for mr in (1, 2, 4, 8):
        bench(f"_trace_texels max_rounds={mr}", lambda i, mr=mr: trace_fn(i, mr))

    # round decay at the bench pose
    (cam, axis_world, flip, (S, A, B), case_sw, shadow_sw, scal_np,
     kcells) = setup(0)
    out = mgrid._trace_texels(
        case_sw, shadow_sw, jnp.asarray(scal_np), case_sw.shape[0] // 32,
        S, A, B, IH, IH, bool(flip), axis_world, 8, 512,
        shadow_sw is not None, kcells=kcells)
    print("kcells:", kcells, "rounds:", int(out["rounds"]),
          "unresolved:", int(out["unresolved"]),
          "overflow:", int(out["overflow"]), flush=True)
    print("hist:", np.asarray(out["hist"]).tolist(), flush=True)

    def frame_fn(i):
        cam = pose(i)
        return mgrid.render_mc_mesh_frame(
            scene, cam.get_pos(), cam.get_view(), 45.0, W / H, W, H,
            light_dir=tuple(-c for c in TO_LIGHT),
            inter_h=IH, inter_w=IH, max_rounds=8, tol_texels=512,
        )

    dt = bench("full fused frame", frame_fn)
    print(f"=> {2*W*H/dt/1e6:.1f} Mrays/s (primary+shadow accounting)",
          flush=True)


if __name__ == "__main__":
    main()
