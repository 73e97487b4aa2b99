"""Render one frame per pipeline to PNG — the headless demo.

Usage: python examples/render_demo.py [outdir]
Uses the Calgary scene when /root/reference/sceneCache.bin exists, else the
sphere. Extraction modes render filled Phong triangles (render/raster.py,
test.frag parity); ray modes render their native images.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(outdir: str = "examples/frames") -> None:
    os.makedirs(outdir, exist_ok=True)
    from ray_tracing_octrees_tpu.render.app import Application, RenderMode
    from ray_tracing_octrees_tpu.render.image import write_png
    from ray_tracing_octrees_tpu.config import EngineConfig

    app = Application(config=EngineConfig()).setup()
    app.camera.theta = 0.9
    app.camera.phi = 0.8
    app.camera.radius = 0.75 * app.camera.radius / 1.5  # 0.75x scene extent
    app.camera.set_target(app.building_center)

    W, H = 960, 540

    # fast slab-sweep ray trace
    img = app.raytracer.render(app.camera, W, H, W / H, fast=True, shadows=True)
    write_png(os.path.join(outdir, "raytrace_fast.png"), np.asarray(img))
    print("wrote raytrace_fast.png")

    # exact octree ray trace (reference semantics; routes to the
    # sweep-exact tracer for this exterior pose, DDA-ladder fallback)
    img = app.raytracer.render(app.camera, W, H, W / H, shadows=True)
    write_png(os.path.join(outdir, "raytrace_exact.png"), np.asarray(img))
    print("wrote raytrace_exact.png")

    # fast-exact cube tracer (round 5: exact hit/t at sweep rates —
    # 132.7 Mrays/s at 1080p on chip; trace/fast_exact.py)
    import dataclasses as _dc

    cfg_fe = _dc.replace(app.raytracer.config, raytrace=_dc.replace(
        app.raytracer.config.raytrace, use_fast_exact=True))
    rt_cfg = app.raytracer.config
    try:
        app.raytracer.config = cfg_fe
        img = app.raytracer.render(app.camera, W, H, W / H, shadows=True)
        write_png(os.path.join(outdir, "raytrace_fast_exact.png"),
                  np.asarray(img))
        print("wrote raytrace_fast_exact.png")
    finally:
        app.raytracer.config = rt_cfg

    # marching cubes preview
    app.mode = RenderMode.MARCHING_CUBES
    out = app.frame(W, H)
    write_png(os.path.join(outdir, "marching_cubes.png"), out["color"])
    print(f"wrote marching_cubes.png ({out['mesh']['count']} tris)")

    # blocks preview
    app.mode = RenderMode.BLOCKS
    app._cached_mesh = None
    out = app.frame(W, H)
    write_png(os.path.join(outdir, "blocks.png"), out["color"])
    print(f"wrote blocks.png ({out['mesh']['count']} tris)")

    # volume raymarch via the sweep fast path at full demo resolution
    app.mode = RenderMode.VOLUME_RAYCAST
    out = app.frame(W, H)
    write_png(os.path.join(outdir, "volume_raycast.png"), out["color"])
    print("wrote volume_raycast.png")

    # close-up pose with the full shading stack engaged. NOTE the bright
    # wash is FAITHFUL: the per-ray oracle (raycastFS.glsl port) renders
    # the same poses at mean RGB ~0.78-0.83 (its gamma + tone map
    # saturate the lit city); the sweep matches the oracle, which is the
    # parity contract (tests/test_raymarch_sweep.py)
    app.camera.radius *= 0.35
    app.camera.theta = 0.45
    app._cached_frames.clear()
    out = app.frame(W, H)
    write_png(os.path.join(outdir, "volume_raycast_closeup.png"),
              out["color"])
    print("wrote volume_raycast_closeup.png")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "examples/frames")
