"""Per-stage timing of the fast-frame pipeline on the live backend.

Usage: python tools/profile_sweep.py
Reports pipelined ms/stage (20 back-to-back enqueues, one block — on
tunneled devices a blocking call pays ~25ms round-trip latency, so
pipelined loops are the only honest device-time measurement) plus the
fused-vs-split full frame. Mirrors bench.py's configuration.
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


def pipelined(name, fn, n=20):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:36s} {dt:8.2f} ms", flush=True)
    return out


def main():
    p = "/root/reference/sceneCache.bin"
    grid = recenter_filled_voxels(load_voxel_grid(p)) if os.path.exists(p) \
        else make_sphere_grid(256)
    vol = (jnp.asarray(grid.occ) > 0).astype(jnp.float32)

    width, height = 1920, 1080
    aspect = width / height
    extent = float(np.max(np.asarray(grid.world_max) - np.asarray(grid.world_min)))
    cam = Camera(theta=0.9, phi=0.8, radius=0.75 * extent)
    cam.set_target(np.asarray(building_center(grid)))
    to_light = (0.5, 0.9, 0.4)
    light_dir = tuple(-c for c in to_light)

    axis_world, flip, (S, A, B), eyes, window, _crop = ss._sweep_geometry(
        vol, grid.origin, grid.voxel_size, cam.get_pos(), cam.get_view())
    print(f"sweep axis={axis_world} flip={flip} S={S} A={A} B={B}", flush=True)
    vol_bf = ss._layout_volume(vol, axis_world, flip, S, A, B)
    sp = vol_bf.shape[0]
    scal = jax.block_until_ready(jnp.asarray(np.asarray(ss._frame_scalars(
        *eyes[:3], eyes[3], *window, 45.0, aspect, float(grid.voxel_size), S,
        np.asarray(grid.origin, np.float32),
        np.asarray(cam.get_pos(), np.float32),
        cam.get_view(), light_dir, (1.0, 0.8, 0.6), (0.1, 0.1, 0.1)))))
    ih = iw = 1024

    sv = pipelined("shadow_volume", lambda: ss.shadow_volume(vol, to_light))
    sv = jax.block_until_ready(sv)
    shv = jax.block_until_ready(
        ss._shadow_relayout(sv, axis_world, bool(flip), sp, A, B))
    packed = pipelined("sweep_all (occ+shadow ch)", lambda: ss._sweep_all(
        vol_bf, scal, sp // 32, S, A, B, ih, iw, bool(flip), shadow_sw=shv))
    packed = jax.block_until_ready(packed)
    w = ss._warp_setup(scal, axis_world, ih, iw, width, height)
    lin, behind, dirs, d_s_n = [jax.block_until_ready(x) for x in w]
    pipelined("warp_setup", lambda: ss._warp_setup(
        scal, axis_world, ih, iw, width, height))
    w_val = pipelined("take (final warp, 2M<-1M)",
                      lambda: ss._take(packed, lin))
    w_val = jax.block_until_ready(w_val)
    pipelined("finish_shade", lambda: ss._finish_shade(
        w_val, behind, dirs, d_s_n, scal, width, height, True))

    for fused in (True, False):
        def frame():
            svv = ss.shadow_volume(vol, to_light)
            return ss.render_fast_frame(
                vol, svv, grid.origin, grid.voxel_size,
                cam.get_pos(), cam.get_view(), 45.0, aspect, width, height,
                light_dir=light_dir, fused=fused)
        img = pipelined(f"FULL frame (fused={fused})", frame)
    lit = float((np.asarray(img)[..., :3].max(-1) > 0).mean())
    print(f"lit={lit:.3f}  backend: {jax.default_backend()}", flush=True)


if __name__ == "__main__":
    main()
