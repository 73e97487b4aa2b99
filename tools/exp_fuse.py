"""Throughput experiment: fused single-program frame vs isolated-gather split.

Enqueues N frames back-to-back with one block at the end (pipelined, the
way bench.py measures) and also reports single-frame latency.
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

    def frame(fused):
        sv = ss.shadow_volume(vol, to_light)
        return ss.render_fast_frame(
            vol, normals, sv, grid.origin, grid.voxel_size,
            cam.get_pos(), cam.get_view(), 45.0, aspect, width, height,
            light_dir=light_dir, fused=fused)

    t0 = time.time()
    sv = jax.block_until_ready(ss.shadow_volume(vol, to_light))
    print(f"shadow compile+run {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(ss.shadow_volume(vol, to_light))
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"shadow_volume (batched) {np.median(ts):.2f} ms  (min {min(ts):.2f})", flush=True)

    for fused in (True, False):
        name = "fused" if fused else "split"
        t0 = time.time()
        img = jax.block_until_ready(frame(fused))
        print(f"{name}: compile {time.time()-t0:.1f}s", flush=True)
        # single-frame latency
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(frame(fused))
            ts.append((time.perf_counter() - t0) * 1e3)
        lat = np.median(ts)
        # pipelined throughput
        N = 20
        t0 = time.perf_counter()
        for _ in range(N):
            img = frame(fused)
        jax.block_until_ready(img)
        thr = (time.perf_counter() - t0) / N * 1e3
        mrays = width * height * 2 / (thr / 1e3) / 1e6
        lit = float((np.asarray(img)[..., :3].max(-1) > 0).mean())
        print(f"{name}: latency {lat:.1f} ms  pipelined {thr:.2f} ms/frame "
              f"= {mrays:.0f} Mrays/s  lit={lit:.3f}", flush=True)
    print("backend:", jax.default_backend(), flush=True)


if __name__ == "__main__":
    main()
