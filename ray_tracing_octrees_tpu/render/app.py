"""Offline application shell — the engine's orchestration layer.

Headless equivalent of the reference's ``main.cpp`` application (the GLFW
window, ``Assignment4`` callbacks, and the frame loop): the five-mode state
machine, input semantics, scene bootstrapping (cache -> CSV -> sphere),
per-mode frame scheduling with cached-frame reuse, camera-change detection,
the DC triangle disk cache keyed by camera pose, octree wireframe overlay,
carving, and FPS/throughput stats. Frames are RGBA arrays (PNG-writable) —
no GL; presentation is the caller's concern.
"""

from __future__ import annotations

import dataclasses
import enum
import os
import struct
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ray_tracing_octrees_tpu.config import EngineConfig, DEFAULT_CONFIG
from ray_tracing_octrees_tpu.core.grid import (
    VoxelGrid,
    make_sphere_grid,
    recenter_filled_voxels,
    building_center,
)
from ray_tracing_octrees_tpu.core.cache import load_voxel_grid, save_voxel_grid
from ray_tracing_octrees_tpu.core.octree import (
    build_pyramid,
    build_linear_octree,
)
from ray_tracing_octrees_tpu.models.extraction import (
    MarchingCubesRenderer,
    VoxelBlockRenderer,
)
from ray_tracing_octrees_tpu.models.octree_raytracer import OctreeRayTracer
from ray_tracing_octrees_tpu.models.volume_raycaster import VolumeRaycastRenderer
from ray_tracing_octrees_tpu.ops.dual_contouring import adaptive_dual_contouring
from ray_tracing_octrees_tpu.render.camera import Camera
from ray_tracing_octrees_tpu.render.wireframe import octree_wireframe
from ray_tracing_octrees_tpu.utils.logging import get_logger
from ray_tracing_octrees_tpu.utils.profiling import FrameProfiler, StageTimer

log = get_logger("app")


class RenderMode(enum.Enum):
    """The five pipelines, cycled by 'R' (main.cpp:495-501, 546-564)."""

    MARCHING_CUBES = 0
    BLOCKS = 1
    DUAL_CONTOURING = 2
    VOLUME_RAYCAST = 3
    OCTREE_RAYTRACE = 4

    def next(self) -> "RenderMode":
        return RenderMode((self.value + 1) % 5)


def load_scene(config: EngineConfig, search_dirs=(".", "/root/reference")):
    """Scene bootstrap (main.cpp:1022-1075): cache -> CSV -> sphere."""
    if config.use_buildings:
        for d in search_dirs:
            path = os.path.join(d, config.cache_filename)
            if os.path.exists(path):
                log.info("loading scene cache %s", path)
                return recenter_filled_voxels(load_voxel_grid(path))
        verts = faces = None
        for d in search_dirs:
            v = os.path.join(d, "DT", "DTVerts.csv")
            f = os.path.join(d, "DT", "DTFaces.csv")
            if os.path.exists(v) and os.path.exists(f):
                verts, faces = v, f
                break
        if verts:
            from ray_tracing_octrees_tpu.ingest.voxelize import load_csv_into_voxel_grid

            grid = load_csv_into_voxel_grid(verts, faces, config.voxel_size)
            if grid is not None:
                grid = recenter_filled_voxels(grid)
                save_voxel_grid(config.cache_filename, grid)
                return recenter_filled_voxels(grid)
        log.warning("no building data found; falling back to sphere scene")
    return recenter_filled_voxels(make_sphere_grid(config.sphere_dim))


@dataclasses.dataclass
class TriangleCache:
    """DC triangle disk cache keyed by camera pose (main.cpp:27-92).

    Files hold count + float32 triangle/normal dumps; the key hashes camera
    position, theta, phi and aspect to 4 decimals.
    """

    directory: str = "triangle_cache"

    def filename(self, camera: Camera, aspect: float) -> str:
        return os.path.join(
            self.directory, f"dc_triangles_{camera.pose_key(aspect):012x}.bin"
        )

    def save(self, camera: Camera, aspect: float, verts, normals, count: int):
        os.makedirs(self.directory, exist_ok=True)
        v = np.asarray(verts)[:count].astype(np.float32)
        n = np.asarray(normals)[:count].astype(np.float32)
        with open(self.filename(camera, aspect), "wb") as f:
            f.write(struct.pack("<Q", count))
            f.write(v.tobytes())
            f.write(n.tobytes())

    def load(self, camera: Camera, aspect: float):
        path = self.filename(camera, aspect)
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            (count,) = struct.unpack("<Q", f.read(8))
            v = np.frombuffer(f.read(count * 36), np.float32).reshape(count, 3, 3)
            n = np.frombuffer(f.read(count * 12), np.float32).reshape(count, 3)
        return v, n, count


@dataclasses.dataclass
class Application:
    """Headless engine driver mirroring Assignment4 + the main loop."""

    config: EngineConfig = DEFAULT_CONFIG
    grid: Optional[VoxelGrid] = None
    mode: RenderMode = RenderMode.MARCHING_CUBES

    # toggles (key bindings, main.cpp:525-709)
    wireframe_fill: bool = False          # W
    show_octree_wireframe: bool = False   # S
    update_frustum_requested: bool = True  # F
    peel_plane: float = 0.0               # Up/Down (state only in reference)
    render_mode_toggle: bool = False      # X (state only in reference)
    force_dc_regenerate: bool = False     # G

    def __post_init__(self):
        self.camera = Camera(theta=0.4, phi=0.8, radius=3.0, config=self.config.camera)
        self.profiler = FrameProfiler(log=log.info)
        self.timer = StageTimer()
        self.tri_cache = TriangleCache()
        self._frame_idx = 0
        self._raycast_counter = 0
        self._raytrace_counter = 0
        self._cached_frames: Dict[RenderMode, np.ndarray] = {}
        self._cached_mesh = None
        self._prev_view: Optional[np.ndarray] = None

    # -- scene -----------------------------------------------------------------
    def setup(self, grid: Optional[VoxelGrid] = None, search_dirs=(".", "/root/reference")):
        self.grid = grid if grid is not None else load_scene(self.config, search_dirs)
        self.pyramid = build_pyramid(self.grid.occ)
        self.tree = build_linear_octree(self.grid.occ)
        self._dc_accel = None  # lazy (node_id_vol, tree_meta) for adaptive DC
        self.mc = MarchingCubesRenderer(self.config)
        self.blocks = VoxelBlockRenderer(self.config)
        self.raytracer = OctreeRayTracer(self.config)
        self.raytracer.set_octree(self.grid, self.pyramid, tree=self.tree)
        self.raycaster = VolumeRaycastRenderer(self.config).init(self.grid, self.pyramid)
        center = np.asarray(building_center(self.grid))
        self.building_center = center
        radius = 1.5 * float(
            np.max(np.asarray(self.grid.world_max) - np.asarray(self.grid.world_min))
        )
        self.camera.radius = max(radius, self.config.camera.min_radius)
        log.info(
            "scene ready: dims=%s nodes=%d center=%s",
            self.grid.dims_xyz, self.tree.num_nodes, np.round(center, 2),
        )
        return self

    # -- input semantics ---------------------------------------------------------
    def handle_key(self, key: str):
        """Keyboard semantics (keyCallback, main.cpp:525-622)."""
        k = key.upper()
        if k == "R":
            self.mode = self.mode.next()
            self._cached_frames.clear()
            self._cached_mesh = None
            log.info("mode -> %s", self.mode.name)
        elif k == "W":
            self.wireframe_fill = not self.wireframe_fill
        elif k == "S":
            self.show_octree_wireframe = not self.show_octree_wireframe
        elif k == "F":
            self.update_frustum_requested = True
        elif k == "C":
            self.camera.set_target(self.building_center)
        elif k == "UP":
            self.peel_plane += 1.0
        elif k == "DOWN":
            self.peel_plane -= 1.0
        elif k == "X":
            self.render_mode_toggle = not self.render_mode_toggle
        elif k == "O":
            self.raycaster.enable_octree_skip = not self.raycaster.enable_octree_skip
        elif k == "M":
            self.raycaster.use_mip_skipping = not self.raycaster.use_mip_skipping
        elif k == "G":
            self.force_dc_regenerate = True
            self._cached_mesh = None

    def orbit(self, dx: float, dy: float):
        self.camera.increment_phi(dx)
        self.camera.increment_theta(dy)

    def pan(self, dx: float, dy: float):
        self.camera.pan(dx, dy)

    def zoom(self, dr: float):
        self.camera.increment_r(dr)

    def click(self, sx: float, sy: float, width: int, height: int) -> bool:
        """Left click: carve in VolumeRaycast mode (main.cpp:643-702)."""
        if self.mode is not RenderMode.VOLUME_RAYCAST:
            return False
        return self.raycaster.carve_at_screen(
            self.camera, sx, sy, width, height, width / height
        )

    # -- frame loop ---------------------------------------------------------------
    def camera_changed(self) -> bool:
        """View-matrix element delta > 1e-4 (hasCameraChanged, main.cpp:755-771)."""
        view = self.camera.get_view()
        changed = (
            self._prev_view is None
            or np.abs(view - self._prev_view).max() > 1e-4
        )
        self._prev_view = view
        return changed

    def _extract_mesh(self, aspect: float):
        vp = jnp.asarray(
            self.camera.get_proj(aspect) @ self.camera.get_view(), jnp.float32
        )
        if self.mode is RenderMode.MARCHING_CUBES:
            with self.timer.stage("extract/mc"):
                verts, normals, count = self.mc.render(self.grid, view_proj=vp)
                count = int(count)
        elif self.mode is RenderMode.BLOCKS:
            with self.timer.stage("extract/blocks"):
                verts, normals, count = self.blocks.render(self.grid, self.tree, view_proj=vp)
                count = int(count)
        else:  # DUAL_CONTOURING with pose-keyed disk cache (main.cpp:110-121)
            if not self.force_dc_regenerate:
                cached = self.tri_cache.load(self.camera, aspect)
                if cached is not None:
                    return cached
            with self.timer.stage("extract/dc"):
                from ray_tracing_octrees_tpu.render.frustum import visible_node_mask

                mask = visible_node_mask(
                    self.tree, self.grid.origin, self.grid.voxel_size, vp,
                    self.config.extraction_frustum_margin,
                )
                if self._dc_accel is None:
                    # per-scene acceleration (the g_octreeMap analog +
                    # host tree metadata), built on first DC extraction
                    from ray_tracing_octrees_tpu.core.octree import build_node_id_volume
                    from ray_tracing_octrees_tpu.ops.dual_contouring import tree_host_meta

                    self._dc_accel = (
                        build_node_id_volume(self.tree),
                        tree_host_meta(self.tree),
                    )
                verts, normals, count = adaptive_dual_contouring(
                    self.grid, self.tree, node_mask=mask,
                    node_id_vol=self._dc_accel[0],
                    tree_meta=self._dc_accel[1],
                )
            self.tri_cache.save(self.camera, aspect, verts, normals, int(count))
            self.force_dc_regenerate = False
        log.info("%s: %d triangles", self.mode.name, int(count))
        return np.asarray(verts), np.asarray(normals), int(count)

    def frame(self, width: int, height: int) -> dict:
        """One frame: returns dict with 'color' (f32[H,W,4]) plus per-mode
        extras ('mesh' for extraction modes, 'wireframe' when toggled).

        Scheduling matches the reference: VolumeRaycast renders every 7th
        frame, the octree ray trace every 6th or on camera change; other
        frames replay the cached image (main.cpp:1204, 1348, drawCachedFrame).
        """
        aspect = width / height
        changed = self.camera_changed()
        out: dict = {}
        mode = self.mode

        if mode in (RenderMode.MARCHING_CUBES, RenderMode.BLOCKS, RenderMode.DUAL_CONTOURING):
            if self._cached_mesh is None or (changed and self.update_frustum_requested):
                self._cached_mesh = self._extract_mesh(aspect)
            verts, normals, count = self._cached_mesh
            out["mesh"] = dict(verts=verts[:count], normals=normals[:count], count=count)
            out["color"] = self._rasterize_preview(verts, normals, count, width, height)
        elif mode is RenderMode.VOLUME_RAYCAST:
            self._raycast_counter += 1
            if (
                mode not in self._cached_frames
                or self._raycast_counter % self.config.raymarch.frame_interval == 0
            ):
                if self.update_frustum_requested and self.raycaster.use_frustum_culling:
                    self.raycaster.update_frustum_culling(self.camera, aspect)
                with self.timer.stage("raycast", items=width * height):
                    if self.config.raymarch.use_sweep:
                        res = self.raycaster.draw_fast(
                            self.camera, width, height, aspect)
                    else:
                        res = self.raycaster.draw(
                            self.camera, width, height, aspect)
                self._cached_frames[mode] = np.asarray(res["color"])
                out["depth"] = np.asarray(res["depth"])
            out["color"] = self._cached_frames[mode]
        else:  # OCTREE_RAYTRACE
            self._raytrace_counter += 1
            if (
                mode not in self._cached_frames
                or changed
                or self._raytrace_counter % self.config.raytrace.frame_interval == 0
            ):
                if self.update_frustum_requested:
                    vp = self.camera.get_proj(aspect) @ self.camera.get_view()
                    self.raytracer.update_frustum(jnp.asarray(vp, jnp.float32))
                with self.timer.stage("raytrace", items=width * height):
                    img = self.raytracer.render(
                        self.camera, width, height, aspect,
                        use_culling=self.update_frustum_requested,
                    )
                self._cached_frames[mode] = np.asarray(img)
            out["color"] = self._cached_frames[mode]

        if self.show_octree_wireframe:
            vp = jnp.asarray(
                self.camera.get_proj(aspect) @ self.camera.get_view(), jnp.float32
            )
            segs, n_lines = octree_wireframe(
                self.tree, self.grid.origin, self.grid.voxel_size, vp,
                self.config.extraction_frustum_margin,
            )
            out["wireframe"] = dict(segments=np.asarray(segs), count=int(n_lines) )
            # draw the overlay depth-tested over the frame, as the
            # reference's white overrideColor line pass does
            # (main.cpp:1381-1409)
            if "color" in out and int(n_lines) > 0:
                from ray_tracing_octrees_tpu.render.raster import (
                    rasterize_lines,
                )

                # Depth-test only against a z-buffer rasterized at THIS
                # pose; a buffer from a previous pose (or from a mode
                # that never rasterized) would occlude lines incorrectly.
                zb = getattr(self, "_last_zbuf", None)
                if getattr(self, "_last_zbuf_pose", None) != self._pose_token():
                    zb = None
                h, w = out["color"].shape[:2]
                if zb is None or zb.shape != (h, w):
                    zb = jnp.full((h, w), 2.0, jnp.float32)
                segs_j = jnp.asarray(segs)
                ok = jnp.arange(segs_j.shape[0]) < int(n_lines)
                img = rasterize_lines(
                    jnp.asarray(out["color"]), zb, segs_j, vp, w, h,
                    valid=ok,
                )
                out["color"] = np.asarray(img)

        self._frame_idx += 1
        self.raycaster.time_value = self._frame_idx / 60.0
        self.profiler.tick(mode.name)
        return out

    def _rasterize_preview(self, verts, normals, count, width, height) -> np.ndarray:
        """Filled-triangle Phong render of extracted meshes.

        The reference rasterizes via GL (test.vert/frag,
        main.cpp:1252-1259); headless, render/raster.py reproduces the
        MVP transform, z-buffered barycentric coverage, and the exact
        test.frag lighting terms. The depth buffer is kept for the
        wireframe overlay's depth test.
        """
        from ray_tracing_octrees_tpu.render.raster import rasterize_triangles

        if count == 0:
            img = np.zeros((height, width, 4), np.float32)
            img[..., 3] = 1.0
            self._last_zbuf = None
            self._last_zbuf_pose = None
            return img
        vp = jnp.asarray(
            self.camera.get_proj(width / height) @ self.camera.get_view(),
            jnp.float32,
        )
        tris = jnp.asarray(verts[:count])
        nrm = jnp.asarray(normals[:count])
        colors = jnp.broadcast_to(
            jnp.asarray(self.config.mesh_base_color, jnp.float32),
            (tris.shape[0], 3),
        )
        img, zbuf = rasterize_triangles(
            tris, nrm, colors, vp, width, height,
            cam_pos=jnp.asarray(self.camera.get_pos(), jnp.float32),
        )
        self._last_zbuf = zbuf
        self._last_zbuf_pose = self._pose_token()
        return np.asarray(img)

    def _pose_token(self):
        """Hashable camera-pose snapshot keying pose-dependent buffers."""
        return tuple(
            np.asarray(self.camera.get_view(), np.float64).ravel().tolist())


def main(argv=None) -> None:
    """Headless render CLI: ``rto-render --mode VOLUME_RAYCAST --frames 3``.

    The CLI face of the application shell (the reference's interactive
    window, minus GLFW): loads the scene (cache -> CSV -> sphere), renders
    N frames in the requested mode while orbiting, writes PNGs.
    """
    import argparse

    from ray_tracing_octrees_tpu.config import add_config_args, config_from_args
    from ray_tracing_octrees_tpu.render.image import write_png
    from ray_tracing_octrees_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    p = argparse.ArgumentParser(prog="rto-render", description=main.__doc__)
    p.add_argument("--mode", default="OCTREE_RAYTRACE",
                   choices=[m.name for m in RenderMode])
    p.add_argument("--frames", type=int, default=1)
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--height", type=int, default=540)
    p.add_argument("--orbit", type=float, default=0.05,
                   help="camera theta step per frame (radians)")
    p.add_argument("--out", default="frames", help="output directory")
    add_config_args(p)
    args = p.parse_args(argv)
    cfg = config_from_args(args)

    app = Application(config=cfg)
    app.setup()
    app.mode = RenderMode[args.mode]
    os.makedirs(args.out, exist_ok=True)
    for i in range(args.frames):
        out = app.frame(args.width, args.height)
        path = os.path.join(args.out, f"{args.mode.lower()}_{i:03d}.png")
        write_png(path, out["color"])
        log.info("wrote %s", path)
        app.orbit(args.orbit / cfg.camera.orbit_rate, 0.0)


if __name__ == "__main__":
    main()
