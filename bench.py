"""Headline benchmark: octree ray-trace throughput on the Calgary scene.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "Mrays/s", "vs_baseline": N}

Measures primary + shadow rays at 1080p against the baked Calgary city
scene (sceneCache.bin, 425x243x29 @ voxelSize 10), the BASELINE.json
north-star configuration (>= 500 Mrays/s/chip). Runs on whatever backend
JAX selects (the real TPU chip under the driver).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def find_scene() -> str:
    for p in (
        os.path.join(os.path.dirname(__file__), "sceneCache.bin"),
        "/root/reference/sceneCache.bin",
    ):
        if os.path.exists(p):
            return p
    return ""


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ray_tracing_octrees_tpu.core.cache import load_voxel_grid
    from ray_tracing_octrees_tpu.core.grid import (
        make_sphere_grid,
        recenter_filled_voxels,
        building_center,
    )
    from ray_tracing_octrees_tpu.core.octree import build_pyramid
    from ray_tracing_octrees_tpu.models.octree_raytracer import render_octree_image
    from ray_tracing_octrees_tpu.render.camera import Camera

    scene = find_scene()
    if scene:
        grid = recenter_filled_voxels(load_voxel_grid(scene))
    else:  # fallback: sphere scene
        grid = make_sphere_grid(256)

    pyramid = build_pyramid(grid.occ)

    width, height = 1920, 1080
    aspect = width / height

    # Orbit camera looking at the city center from a typical viewing pose.
    extent = float(np.max(np.asarray(grid.world_max) - np.asarray(grid.world_min)))
    cam = Camera(theta=0.55, phi=0.8, radius=0.9 * extent)
    cam.set_target(np.asarray(building_center(grid)))

    cam_pos = jnp.asarray(cam.get_pos(), jnp.float32)
    view = jnp.asarray(cam.get_view(), jnp.float32)

    def frame():
        return render_octree_image(
            pyramid,
            grid.origin,
            grid.voxel_size,
            cam_pos,
            view,
            width,
            height,
            jnp.float32(45.0),
            jnp.float32(aspect),
            shadows=True,
        )

    # warmup / compile
    img = frame()
    jax.block_until_ready(img)

    n_iters = 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        img = frame()
    jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / n_iters

    hit_frac = float(np.asarray(img[..., :3]).max(axis=-1).astype(bool).mean())
    rays = width * height * 2  # primary + shadow
    mrays = rays / dt / 1e6
    baseline = 500.0  # north-star Mrays/s/chip
    print(
        json.dumps(
            {
                "metric": "octree_raytrace_calgary_1080p_primary+shadow",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / baseline, 4),
                "frame_ms": round(dt * 1e3, 3),
                "hit_fraction": round(hit_frac, 4),
                "scene": os.path.basename(scene) if scene else "sphere256",
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
