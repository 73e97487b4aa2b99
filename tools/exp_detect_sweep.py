"""Measure the detection-only candidate sweep for the mesh tracer (round-3).

The round-2 mesh tracer's candidate sweep carries 3 packed case channels
+ shadow (~203 ms/frame of its 538 ms). The round-3 plan (ROADMAP) splits
DETECTION from FETCH: a 1-channel bf16 sweep over the laterally
3x3-dilated binarized case volume detects crossing slabs (the center
nearest-cell hat of the dilated volume == the 3x3 footprint-box test),
storing only the osh field; cases are fetched later per consumed
candidate. This experiment measures the detection sweep alone to validate
the ~5-10x sweep saving before the rewrite.

Usage: python tools/exp_detect_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ray_tracing_octrees_tpu.core.cache import load_voxel_grid
from ray_tracing_octrees_tpu.core.grid import (
    building_center,
    recenter_filled_voxels,
)
from ray_tracing_octrees_tpu.render.camera import Camera
from ray_tracing_octrees_tpu.trace import mesh_grid as mg
from ray_tracing_octrees_tpu.trace import slab_sweep as ss


def main():
    g = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
    scene = mg.prepare_mc_scene(g.occ, g.origin, g.voxel_size,
                                to_light=(0.5, 0.9, 0.4))
    extent = float(np.max(np.asarray(g.world_max) - np.asarray(g.world_min)))
    cam = Camera(theta=0.9, phi=0.8, radius=0.75 * extent)
    cam.set_target(np.asarray(building_center(g)))

    # laterally dilated binary surface volume (host, once per scene/axis)
    case_np = np.asarray(jax.device_get(scene.case_vol)) > 0
    surf = case_np.astype(np.float32)
    # dilate over the two lateral axes of every sweep axis is axis-
    # dependent; for the experiment dilate 3x3x1 in (y, x) (axis-z sweep
    # layout uses (a, b) = (x, y)); a full impl dilates per chosen axis.
    d = surf.copy()
    for ax in (1, 2):
        d = np.maximum(d, np.roll(d, 1, ax))
        d = np.maximum(d, np.roll(d, -1, ax))

    (axis_world, flip, (S, A, B), eyes, window, crop) = ss._sweep_geometry(
        jnp.asarray(d), np.asarray(g.origin), float(g.voxel_size),
        cam.get_pos(), cam.get_view())
    vol_bf = ss._layout_volume(jnp.asarray(d), axis_world, flip, S, A, B,
                               crop)
    scal = jnp.asarray(ss._frame_scalars_np(
        *eyes[:3], eyes[3], *window, 45.0, 1920 / 1088,
        float(g.voxel_size), S, np.asarray(g.origin, np.float32),
        np.asarray(cam.get_pos(), np.float32), cam.get_view()))

    sp = vol_bf.shape[0]

    def run(s):
        return ss._sweep_all(vol_bf, scal + s * 0, sp // 32, S, A, B,
                             1024, 1024, bool(flip))

    out = jax.block_until_ready(run(jnp.zeros(ss._SCAL_N)))
    zero = jnp.zeros(ss._SCAL_N)
    t0 = time.perf_counter()
    outs = [run(zero + i * 1e-9) for i in range(20)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 20
    print(f"detection sweep (1ch first-hit, axis={axis_world} sp={sp} "
          f"A={A} B={B}): {dt*1e3:.2f} ms "
          f"(vs ~203 ms for the 4-channel candidate sweep)")


if __name__ == "__main__":
    main()
