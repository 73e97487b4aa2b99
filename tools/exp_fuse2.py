"""Which per-frame step serializes the pipeline: upload, shadow, or compute?"""

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


def pipelined(name, fn, n=20):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:40s} {dt:8.2f} ms/frame", flush=True)
    return dt


def main():
    p = "/root/reference/sceneCache.bin"
    grid = recenter_filled_voxels(load_voxel_grid(p)) if os.path.exists(p) else make_sphere_grid(256)
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

    # precompute everything once
    axis_world, flip, (S, A, B), eyes, window = ss._sweep_geometry(
        vol, grid.origin, grid.voxel_size, cam.get_pos(), cam.get_view())
    vol_bf = ss._layout_volume(vol, axis_world, flip, S, A, B)
    sp = vol_bf.shape[0]
    scal_np = np.asarray(ss._frame_scalars(
        *eyes[:3], eyes[3], *window, 45.0, aspect, float(grid.voxel_size), S,
        np.asarray(grid.origin, np.float32), np.asarray(cam.get_pos(), np.float32),
        cam.get_view(), light_dir, (1.0, 0.8, 0.6), (0.1, 0.1, 0.1)))
    scal_dev = jax.block_until_ready(jnp.asarray(scal_np))
    sv = jax.block_until_ready(ss.shadow_volume(vol, to_light))
    sh_flat = jax.block_until_ready(jnp.reshape(sv, (-1,)))
    nrm_flat = jax.block_until_ready(jnp.asarray(normals).reshape(-1, 3))
    dims = tuple(int(d) for d in vol.shape)
    ih = iw = 1024

    fus = lambda sc, shf: ss._frame_fused(
        vol_bf, nrm_flat, shf, sc, sp // 32, S, A, B, ih, iw, bool(flip),
        axis_world, width, height, dims, True)

    pipelined("A: fused only (all device-resident)", lambda: fus(scal_dev, sh_flat))
    pipelined("B: upload scal + fused", lambda: fus(jnp.asarray(scal_np), sh_flat))

    def c():
        svv = ss.shadow_volume(vol, to_light)
        return fus(scal_dev, jnp.reshape(svv, (-1,)))
    pipelined("C: shadow + fused (device scal)", c)

    def d():
        svv = ss.shadow_volume(vol, to_light)
        return fus(jnp.asarray(scal_np), jnp.reshape(svv, (-1,)))
    pipelined("D: upload + shadow + fused (full)", d)

    # E: does a tiny dispatch cost a fixed slice of pipeline time?
    tiny = jax.jit(lambda x: x + 1.0)
    pipelined("E: tiny jit only", lambda: tiny(scal_dev))

    def f():
        return fus(tiny(scal_dev), sh_flat)
    pipelined("F: tiny + fused", f)
    print("backend:", jax.default_backend(), flush=True)


if __name__ == "__main__":
    main()
