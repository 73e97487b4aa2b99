"""True device-time per stage: pipelined per-stage loops (RTT amortized)."""

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
    print(f"{name:36s} {dt:8.2f} ms", flush=True)
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

    axis_world, flip, (S, A, B), eyes, window = ss._sweep_geometry(
        vol, grid.origin, grid.voxel_size, cam.get_pos(), cam.get_view())
    vol_bf = ss._layout_volume(vol, axis_world, flip, S, A, B)
    sp = vol_bf.shape[0]
    scal = jax.block_until_ready(jnp.asarray(np.asarray(ss._frame_scalars(
        *eyes[:3], eyes[3], *window, 45.0, aspect, float(grid.voxel_size), S,
        np.asarray(grid.origin, np.float32), np.asarray(cam.get_pos(), np.float32),
        cam.get_view(), light_dir, (1.0, 0.8, 0.6), (0.1, 0.1, 0.1)))))
    sv = jax.block_until_ready(ss.shadow_volume(vol, to_light))
    sh_flat = jax.block_until_ready(jnp.reshape(sv, (-1,)))
    nrm_flat = jax.block_until_ready(jnp.asarray(normals).reshape(-1, 3))
    dims = tuple(int(d) for d in vol.shape)
    ih = iw = 1024

    packed = jax.block_until_ready(ss._sweep_all(
        vol_bf, scal, sp // 32, S, A, B, ih, iw, bool(flip)))
    w = ss._warp_setup(scal, axis_world, ih, iw, width, height)
    lin, behind, dirs, d_s_n = [jax.block_until_ready(x) for x in w]
    w_val = jax.block_until_ready(ss._take(packed, lin))
    hit, lin4 = [jax.block_until_ready(x) for x in
                 ss._finish_attr(w_val, behind, dirs, d_s_n, scal, dims)]
    nrm, sh = [jax.block_until_ready(x) for x in
               ss._gather_attrs(nrm_flat, sh_flat, lin4, True)]

    pipelined("sweep_all", lambda: ss._sweep_all(
        vol_bf, scal, sp // 32, S, A, B, ih, iw, bool(flip)))
    pipelined("warp_setup", lambda: ss._warp_setup(scal, axis_world, ih, iw, width, height))
    pipelined("take 2M<-1M", lambda: ss._take(packed, lin))
    pipelined("finish_attr", lambda: ss._finish_attr(w_val, behind, dirs, d_s_n, scal, dims))
    pipelined("gather_attrs 2Mx(3+1)", lambda: ss._gather_attrs(nrm_flat, sh_flat, lin4, True))
    pipelined("shade_core", lambda: ss._shade_core(hit, nrm, sh, scal, width, height, True))
    pipelined("shadow_volume(batched)", lambda: ss.shadow_volume(vol, to_light))

    # gather microbenches: how does take scale?
    idx1m = jax.block_until_ready(lin4[:1024 * 1024])
    pipelined("take 1M rows x3", lambda: ss._take_rows(nrm_flat, idx1m))
    pipelined("take 1M flat", lambda: ss._take(sh_flat, idx1m))
    srt = jax.block_until_ready(jnp.sort(lin))
    pipelined("take 2M sorted idx", lambda: ss._take(packed, srt))
    print("backend:", jax.default_backend(), flush=True)


if __name__ == "__main__":
    main()
