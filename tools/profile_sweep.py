"""Per-stage timing of the fast-frame pipeline on the live backend.

Usage: python tools/profile_sweep.py
Prints ms per stage (median of N) so optimization effort goes where the
time is. Mirrors bench.py's configuration exactly.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ray_tracing_octrees_tpu.core.cache import load_voxel_grid
from ray_tracing_octrees_tpu.core.grid import (
    make_sphere_grid, recenter_filled_voxels, building_center,
)
from ray_tracing_octrees_tpu.trace import slab_sweep as ss
from ray_tracing_octrees_tpu.render.camera import Camera


def timeit(name, fn, n=5):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{name:24s} {np.median(ts):8.2f} ms   (min {min(ts):.2f})", flush=True)
    return out


def main():
    p = "/root/reference/sceneCache.bin"
    grid = recenter_filled_voxels(load_voxel_grid(p)) if os.path.exists(p) else None
    if grid is None:
        grid = make_sphere_grid(256)
    vol = (jnp.asarray(grid.occ) > 0).astype(jnp.float32)
    pad = jnp.pad(vol, 1)
    g = jnp.stack([
        pad[1:-1, 1:-1, :-2] - pad[1:-1, 1:-1, 2:],
        pad[1:-1, :-2, 1:-1] - pad[1:-1, 2:, 1:-1],
        pad[:-2, 1:-1, 1:-1] - pad[2:, 1:-1, 1:-1],
    ], -1)
    gm = jnp.linalg.norm(g, axis=-1, keepdims=True)
    normals = jax.block_until_ready(jnp.where(gm > 1e-3, g / jnp.maximum(gm, 1e-30), 0.0))

    width, height = 1920, 1080
    aspect = width / height
    extent = float(np.max(np.asarray(grid.world_max) - np.asarray(grid.world_min)))
    cam = Camera(theta=0.9, phi=0.8, radius=0.75 * extent)
    cam.set_target(np.asarray(building_center(grid)))
    to_light = (0.5, 0.9, 0.4)
    light_dir = tuple(-c for c in to_light)

    axis_world, flip, (S, A, B), eyes, window = ss._sweep_geometry(
        vol, grid.origin, grid.voxel_size, cam.get_pos(), cam.get_view())
    print(f"sweep axis={axis_world} flip={flip} S={S} A={A} B={B}", flush=True)
    vol_bf = ss._layout_volume(vol, axis_world, flip, S, A, B)
    sp = vol_bf.shape[0]
    scal = ss._frame_scalars(
        *eyes[:3], eyes[3], *window, 45.0, aspect, float(grid.voxel_size), S,
        np.asarray(grid.origin, np.float32), np.asarray(cam.get_pos(), np.float32),
        cam.get_view(), light_dir, (1.0, 0.8, 0.6), (0.1, 0.1, 0.1))
    ih = iw = 1024

    timeit("upload scal", lambda: jnp.asarray(np.asarray(scal)))
    packed = timeit("sweep_all", lambda: ss._sweep_all(
        vol_bf, scal, sp // 32, S, A, B, ih, iw, bool(flip)))
    w = timeit("warp_setup", lambda: ss._warp_setup(
        scal, axis_world, ih, iw, width, height))
    lin, behind, dirs, d_s_n = w
    w_val = timeit("take(warp gather)", lambda: ss._take(packed, lin))
    fin = timeit("finish_sweep", lambda: ss._finish_sweep(w_val, behind, dirs, d_s_n, scal))
    hit, t, point, dirs2 = fin

    sv = timeit("shadow_volume", lambda: ss.shadow_volume(vol, to_light))
    attr = jnp.concatenate([normals, jnp.asarray(sv)[..., None]], -1)
    attr = jax.block_until_ready(attr)
    lin4 = timeit("attr_indices", lambda: ss._attr_indices(point, dirs2, scal, attr.shape[:3]))
    att = timeit("take_rows(attr)", lambda: ss._take_rows(attr.reshape(-1, 4), lin4))
    timeit("shade", lambda: ss._shade_from_attrs(hit, att, scal, width, height, True))

    def frame():
        sv = ss.shadow_volume(vol, to_light)
        return ss.render_fast_frame(
            vol, normals, sv, grid.origin, grid.voxel_size,
            cam.get_pos(), cam.get_view(), 45.0, aspect, width, height,
            light_dir=light_dir)
    timeit("FULL frame", frame)
    print("backend:", jax.default_backend(), flush=True)


if __name__ == "__main__":
    main()
