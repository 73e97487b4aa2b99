"""Octree ray-trace pipeline ("BVHRayTrace" mode).

Model equivalent of ``RayTracerBVH`` (RayTracerBVH.{h,cpp}): per-pixel
pinhole rays traced against the scene octree with Lambert shading, frustum
culling, and frame-interval scheduling handled by the app shell.

The GLSL kernel's outputs are reproduced (hit point, node-center normal,
``shade`` at RayTracerBVH.cpp:331-336: warm base color * N.L + ambient,
black background) but the traversal is the stackless hierarchical-DDA
wavefront of ``trace_octree`` rather than a per-thread stack.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_octrees_tpu.config import EngineConfig, DEFAULT_CONFIG
from ray_tracing_octrees_tpu.core.grid import VoxelGrid
from ray_tracing_octrees_tpu.core.octree import (
    LinearOctree,
    OccupancyPyramid,
    build_pyramid,
)
from ray_tracing_octrees_tpu.render.camera import Camera, generate_rays
from ray_tracing_octrees_tpu.trace.octree_trace import (
    trace_octree,
    cull_pyramid,
    compact_visible_nodes,
)


def lambert_shade(normal, hit, light_dir, base_color, ambient):
    """shade() (RayTracerBVH.cpp:331-336): base * max(0, N . -L) + ambient."""
    l = jnp.asarray(light_dir, jnp.float32)
    l = l / jnp.linalg.norm(l)
    ndotl = jnp.maximum(0.0, -(normal * l[None, :]).sum(-1))
    base = jnp.asarray(base_color, jnp.float32)
    amb = jnp.asarray(ambient, jnp.float32)
    color = base[None, :] * ndotl[:, None] + amb[None, :]
    return jnp.where(hit[:, None], color, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "max_steps", "shadows", "ball_skip",
                     "bands", "ladder", "shadow_ladder", "safety_cap"),
)
def render_octree_image(
    pyramid: OccupancyPyramid,
    grid_origin,
    voxel_size,
    cam_pos,
    view,
    width: int,
    height: int,
    fov_deg,
    aspect,
    light_dir=(-1.0, -1.0, -1.0),
    base_color=(1.0, 0.8, 0.6),
    ambient=(0.1, 0.1, 0.1),
    max_steps: int = 512,
    shadows: bool = False,
    leaf_vol=None,
    ball_skip: bool = False,
    bands: int = 1,
    ladder: tuple = (),
    seed_live=None,   # bool[H*W] from slab_sweep.sweep_seed (primary only)
    seed_t=None,      # f32[H*W]
    shadow_live_vol=None,  # bool[Z+2r,...] from slab_sweep.light_blocked_volume
    shadow_ladder: tuple = None,  # compaction schedule for the shadow trace
    safety_cap: int = 0,          # overflow stage width for both traces
    shadow_seed=None,  # slab_sweep.ShadowSeed: conservative per-ray prune
):
    """Full frame: ray gen -> stackless octree trace -> Lambert shade.

    Returns f32[height, width, 4] (row 0 = top, as generateRay's ny flip).
    With ``shadows=True`` a second (shadow) ray is traced from each hit
    toward the light — the "primary + shadow rays" configuration of the
    benchmark ladder (BASELINE.json configs[3]).

    ``leaf_vol`` (core/octree.py::build_leaf_volume): when given, traces
    via trace_octree_fast — ONE leaf-descriptor gather per DDA step instead
    of the per-level pyramid descent; bit-identical outputs (and, with
    ``ball_skip``, Chebyshev empty-ball skipping on top).
    """
    origins, dirs = generate_rays(width, height, cam_pos, view, fov_deg, aspect)

    def trace(o, d, live=None, ts=None, lad=None, const_origin=False,
              const_dir=False):
        if leaf_vol is not None:
            from ray_tracing_octrees_tpu.trace.octree_trace import (
                trace_octree_fast,
            )

            return trace_octree_fast(
                leaf_vol, o, d, jnp.asarray(grid_origin, jnp.float32),
                jnp.asarray(voxel_size, jnp.float32), max_steps=max_steps,
                ball_skip=ball_skip, ladder=ladder if lad is None else lad,
                t_start=ts, live_mask=live,
                const_origin=const_origin, const_dir=const_dir,
                safety_cap=safety_cap,
            )
        return trace_octree(
            pyramid, o, d, jnp.asarray(grid_origin, jnp.float32),
            jnp.asarray(voxel_size, jnp.float32), max_steps=max_steps,
        )

    def shade_rays(o_b, d_b, live_b=None, ts_b=None):
        # primary rays form a pinhole bundle: every origin is cam_pos
        res = trace(o_b, d_b, live_b, ts_b, const_origin=True)
        color = lambert_shade(
            res["normal"], res["hit"], light_dir, base_color, ambient)
        if shadows:
            l = jnp.asarray(light_dir, jnp.float32)
            l = l / jnp.linalg.norm(l)
            # offset along the normal to escape the surface cell
            shadow_o = res["point"] + res["normal"] * (voxel_size * 2.0)
            shadow_d = jnp.broadcast_to(-l[None, :], shadow_o.shape)
            # Miss pixels have point = normal = 0, so their shadow rays
            # would march real geometry from the world origin only to be
            # masked out below. Park them far PAST the volume along the
            # ray direction (volume behind => dead at step 0); the image
            # is unchanged (occluded is ANDed with the primary hit).
            shadow_o = jnp.where(
                res["hit"][:, None], shadow_o, shadow_d * jnp.float32(3e7))
            # Only primary-hit pixels carry a real shadow ray; passing the
            # hit mask as live_mask lets a ladder's (0, cap) stage compact
            # the ~(1 - hit_frac) dead rows away before any DDA step.
            s_live = res["hit"]
            if shadow_live_vol is not None:
                # conservative light-occludability prune: a False flag at
                # the shadow origin's voxel PROVES no solid toward the
                # light (slab_sweep.light_blocked_volume); out-of-bounds
                # origins stay live. Correctness unaffected — the flag
                # only kills provably-miss rays.
                from ray_tracing_octrees_tpu.trace.slab_sweep import (
                    SEED_DILATION,
                )

                vs = jnp.asarray(voxel_size, jnp.float32)
                origin_p = (jnp.asarray(grid_origin, jnp.float32)
                            - jnp.float32(SEED_DILATION) * vs)
                v = jnp.floor(
                    (shadow_o - origin_p[None, :]) / vs).astype(jnp.int32)
                dzv, dyv, dxv = shadow_live_vol.shape
                inb = (
                    (v[:, 0] >= 0) & (v[:, 1] >= 0) & (v[:, 2] >= 0)
                    & (v[:, 0] < dxv) & (v[:, 1] < dyv) & (v[:, 2] < dzv)
                )
                vc = jnp.clip(v, 0, jnp.asarray(
                    [dxv - 1, dyv - 1, dzv - 1], jnp.int32))
                flag = shadow_live_vol[vc[:, 2], vc[:, 1], vc[:, 0]]
                s_live = jnp.where(inb, flag, True) & res["hit"]
            s_ts = None
            if shadow_seed is not None:
                # Orthographic sheared bit-field along the light axis
                # (slab_sweep.build_shadow_seed): provably-unoccluded
                # shadow rays die at step 0, the rest jump conservatively
                # to their first candidate slab.
                from ray_tracing_octrees_tpu.trace.slab_sweep import (
                    query_shadow_seed,
                )

                ss_live, s_ts = query_shadow_seed(
                    shadow_seed, shadow_o, jnp.asarray(grid_origin,
                                                       jnp.float32),
                    jnp.asarray(voxel_size, jnp.float32))
                s_live = s_live & ss_live
            sres = trace(shadow_o, shadow_d, s_live, s_ts,
                         lad=shadow_ladder, const_dir=True)
            occluded = sres["hit"] & res["hit"]
            amb = jnp.asarray(ambient, jnp.float32)
            color = jnp.where(
                occluded[:, None], jnp.broadcast_to(amb, color.shape), color)
        return color

    if bands <= 1:
        color = shade_rays(origins, dirs, seed_live, seed_t)
    else:
        # Row-band tracing: each band's while_loop exits as soon as ITS
        # rays finish, so sky/near bands stop early instead of running in
        # lockstep to the worst ray of the whole frame. One XLA program
        # either way; outputs identical to bands=1 (bands are row slices
        # traced by the very same per-ray ops).
        rows = -(-height // bands)
        colors = []
        for b in range(bands):
            r0, r1 = b * rows, min((b + 1) * rows, height)
            if r0 >= r1:
                break
            sl = slice(r0 * width, r1 * width)
            colors.append(shade_rays(
                origins[sl], dirs[sl],
                None if seed_live is None else seed_live[sl],
                None if seed_t is None else seed_t[sl],
            ))
        color = jnp.concatenate(colors, axis=0)

    alpha = jnp.ones((color.shape[0], 1), jnp.float32)
    img = jnp.concatenate([color, alpha], axis=-1)
    return img.reshape(height, width, 4)


@dataclasses.dataclass
class OctreeRayTracer:
    """Stateful pipeline wrapper (mirrors RayTracerBVH's set/render API).

    Two execution paths: the exact wavefront traversal (reference
    semantics) and, via ``render(..., fast=True)``, the MXU slab-sweep
    tracer with the reference's voxel-center normals and a per-frame
    directional shadow volume (see trace/slab_sweep.py for documented
    divergences).
    """

    config: EngineConfig = DEFAULT_CONFIG
    pyramid: Optional[OccupancyPyramid] = None
    culled_pyramid: Optional[OccupancyPyramid] = None
    grid_origin: Optional[jax.Array] = None
    voxel_size: Optional[jax.Array] = None
    linear_tree: Optional[LinearOctree] = None
    visible_tree: Optional[LinearOctree] = None
    visible_count: Optional[int] = None
    _fast_vol: Optional[jax.Array] = None
    _fast_shadow: Optional[jax.Array] = None
    _leaf_vol: Optional[jax.Array] = None

    def set_octree(self, grid: VoxelGrid, pyramid: Optional[OccupancyPyramid] = None,
                   tree: Optional[LinearOctree] = None):
        """setOctree (RayTracerBVH.cpp:430-505): bind the scene.

        ``tree`` is the flat node buffer (the GPUNodes SSBO mirror); when
        provided, ``update_frustum`` maintains its frustum-compacted copy
        exactly like updateNodesWithFrustumCulling.
        """
        self.pyramid = pyramid if pyramid is not None else build_pyramid(grid.occ)
        self.culled_pyramid = None
        self.grid_origin = grid.origin
        self.voxel_size = grid.voxel_size
        self.linear_tree = tree
        self.visible_tree = None
        self.visible_count = None
        self._fast_vol = None
        self._fast_shadow = None
        self._leaf_vol = None
        self._seed_vol = None
        self._shadow_blk = None
        self._exact_sfld = None

    def _ensure_leaf_vol(self):
        """Packed per-voxel leaf descriptors for the one-gather exact
        tracer (S^3 bytes; built once per scene bind)."""
        if self._leaf_vol is None:
            from ray_tracing_octrees_tpu.core.octree import build_leaf_volume

            self._leaf_vol = build_leaf_volume(self.pyramid)
        return self._leaf_vol

    def _ensure_seed_vol(self):
        """Dilated occupancy for conservative exact-tracer seeds."""
        if getattr(self, "_seed_vol", None) is None:
            from ray_tracing_octrees_tpu.trace.slab_sweep import (
                dilate_occupancy,
            )

            self._seed_vol = dilate_occupancy(
                (self.pyramid.code_levels[0] > 0).astype(jnp.float32))
        return self._seed_vol

    def _ensure_shadow_blk(self):
        """Conservative light-occludability volume for shadow pruning."""
        if getattr(self, "_shadow_blk", None) is None:
            from ray_tracing_octrees_tpu.trace.slab_sweep import (
                light_blocked_volume,
            )

            to_light = tuple(-c for c in self.config.raytrace.light_dir)
            self._shadow_blk = light_blocked_volume(
                self._ensure_seed_vol(), to_light)
        return self._shadow_blk

    def _ensure_fast(self):
        if self._fast_vol is None:
            from ray_tracing_octrees_tpu.trace.slab_sweep import shadow_volume

            self._fast_vol = (self.pyramid.code_levels[0] > 0).astype(jnp.float32)
            # the reference Lambert light (-1,-1,-1) means the light sits at
            # +1,+1,+1; occlusion is swept toward it
            l = -jnp.asarray(self.config.raytrace.light_dir, jnp.float32)
            self._fast_shadow = shadow_volume(self._fast_vol, np.asarray(l))

    def _eye_inside(self, camera: Camera) -> bool:
        return _eye_inside_volume(
            self.grid_origin, self.voxel_size,
            self.pyramid.code_levels[0].shape, camera.get_pos(),
        )

    def _ensure_exact_shadow_field(self):
        """Camera-independent sweep-exact shadow field (per scene+light);
        None when the light is outside the field's slope envelope."""
        if getattr(self, "_exact_sfld", None) is None:
            from ray_tracing_octrees_tpu.trace.sweep_exact import (
                build_shadow_field,
            )

            from ray_tracing_octrees_tpu.core.grid import host_fetch

            self._ensure_fast()
            vs = float(np.asarray(host_fetch(self.voxel_size)))
            self._exact_sfld = (build_shadow_field(
                self._fast_vol, self.config.raytrace.light_dir, vs),)
        return self._exact_sfld[0]

    def _render_fast_exact(self, camera: Camera, width: int, height: int,
                           aspect: float, shadows: bool):
        """Fast-exact cube frame (trace/fast_exact.py), or None outside
        its envelope. Exact hit/t/shadow; voxel-granularity normals (see
        config.raytrace.use_fast_exact)."""
        from ray_tracing_octrees_tpu.core.grid import host_fetch
        from ray_tracing_octrees_tpu.trace.fast_exact import (
            render_fast_exact_frame,
        )

        rt = self.config.raytrace
        self._ensure_fast()
        return render_fast_exact_frame(
            self._fast_vol,
            self._fast_shadow if shadows else None,
            np.asarray(host_fetch(self.grid_origin)),
            float(np.asarray(host_fetch(self.voxel_size))),
            camera.get_pos(), camera.get_view(),
            self.config.camera.fov_deg, aspect, width, height,
            light_dir=rt.light_dir, base_color=rt.base_color,
            ambient=rt.ambient)

    def _render_sweep_exact(self, camera: Camera, width: int, height: int,
                            aspect: float, shadows: bool):
        """Sweep-exact frame, or None outside its envelope (caller falls
        back to the DDA ladder)."""
        from ray_tracing_octrees_tpu.core.grid import host_fetch
        from ray_tracing_octrees_tpu.trace.sweep_exact import (
            render_exact_frame,
        )

        rt = self.config.raytrace
        self._ensure_fast()
        sfld = self._ensure_exact_shadow_field() if shadows else None
        if shadows and sfld is None:
            return None
        out = render_exact_frame(
            self._fast_vol, self._ensure_leaf_vol(),
            np.asarray(host_fetch(self.grid_origin)),
            float(np.asarray(host_fetch(self.voxel_size))),
            camera.get_pos(), camera.get_view(), width, height,
            self.config.camera.fov_deg, aspect,
            light_dir=rt.light_dir, base_color=rt.base_color,
            ambient=rt.ambient, shadows=shadows, shadow_field=sfld)
        if out is None:
            return None
        return out[0]

    def update_frustum(self, view_proj):
        """Culling step of renderSceneComputeWithCulling
        (RayTracerBVH.cpp:743-812): blank occupancy outside the frustum
        (what the trace consumes) and, when the flat node buffer is bound,
        compact it with child remap exactly like the SSBO re-upload."""
        self.culled_pyramid = cull_pyramid(
            self.pyramid,
            self.grid_origin,
            self.voxel_size,
            view_proj,
            self.config.raytrace.frustum_margin,
        )
        if self.linear_tree is not None:
            from ray_tracing_octrees_tpu.render.frustum import visible_node_mask

            vis = visible_node_mask(
                self.linear_tree, jnp.asarray(self.grid_origin, jnp.float32),
                self.voxel_size, jnp.asarray(view_proj, jnp.float32),
                self.config.raytrace.frustum_margin,
            )
            self.visible_tree, count = compact_visible_nodes(self.linear_tree, vis)
            self.visible_count = int(count)

    def render(
        self,
        camera: Camera,
        width: int,
        height: int,
        aspect: float,
        use_culling: bool = False,
        shadows: bool = False,
        fast: bool = False,
    ):
        rt = self.config.raytrace
        if fast:
            from ray_tracing_octrees_tpu.trace.slab_sweep import render_fast_frame

            self._ensure_fast()
            # Interior cameras stay on the fast path: _sweep_geometry
            # sweeps the forward half-volume from the eye's slab
            # (fly-throughs previously fell back to the exact tracer at
            # ~0.2 Mrays/s). EXCEPT when the frustum cone contains rays
            # pointing backward along the sweep axis — those read miss from
            # the half-volume sweep (documented divergence), so such poses
            # route to the exact tracer, which the one-gather leaf volume
            # now makes affordable (ADVICE r2).
            if self._eye_inside(camera) and _frustum_crosses_sweep_plane(
                camera.get_view(), self.config.camera.fov_deg, aspect
            ):
                fast = False
        if fast:
            return render_fast_frame(
                self._fast_vol,
                self._fast_shadow if shadows else None,
                self.grid_origin,
                self.voxel_size,
                camera.get_pos(),
                camera.get_view(),
                self.config.camera.fov_deg,
                aspect,
                width,
                height,
                light_dir=rt.light_dir,
                base_color=rt.base_color,
                ambient=rt.ambient,
            )
        # Preferred exact path: the SWEEP-EXACT tracer (trace/sweep_exact.py,
        # reference semantics at MXU rates — 27+ Mrays/s vs the DDA ladder's
        # ~2.6 on Calgary). Frustum culling is skipped for it deliberately:
        # primary rays lie inside the frustum by construction and the
        # reference's node culling is a traversal optimization, not a
        # semantic change (RayTracerBVH.cpp:743-812 keeps every node the
        # rays can hit). Poses outside the exactness envelope (interior
        # eye, footprint beyond the tap window) fall through to the DDA
        # ladder below; so does a light outside the shadow field's slope
        # envelope when shadows are on.
        if rt.use_fast_exact:
            img = self._render_fast_exact(camera, width, height, aspect,
                                          shadows)
            if img is not None:
                return img
        if rt.use_sweep_exact:
            img = self._render_sweep_exact(camera, width, height, aspect,
                                           shadows)
            if img is not None:
                return img
        pyr = self.culled_pyramid if (use_culling and self.culled_pyramid) else self.pyramid
        # Leaf-volume one-gather traversal for the scene pyramid; the culled
        # pyramid differs per pose, so culling keeps the per-level descent.
        lv = self._ensure_leaf_vol() if pyr is self.pyramid else None
        seed_live = seed_t = None
        ladder = ()
        if lv is not None and rt.exact_seed:
            from ray_tracing_octrees_tpu.trace.slab_sweep import sweep_seed

            live, ts, ext = sweep_seed(
                self._ensure_seed_vol(), self.grid_origin, self.voxel_size,
                camera.get_pos(), camera.get_view(),
                self.config.camera.fov_deg, aspect, width, height,
            )
            if ext:
                seed_live, seed_t = live, ts
        if lv is not None and rt.exact_ladder:
            n_rays = width * height
            ladder = ((0, max(512, n_rays // 2)),
                      (4, max(256, n_rays // 8)),
                      (8, max(128, n_rays // 32)))
        return render_octree_image(
            pyr,
            self.grid_origin,
            self.voxel_size,
            jnp.asarray(camera.get_pos(), jnp.float32),
            jnp.asarray(camera.get_view(), jnp.float32),
            width,
            height,
            jnp.float32(self.config.camera.fov_deg),
            jnp.float32(aspect),
            light_dir=rt.light_dir,
            base_color=rt.base_color,
            ambient=rt.ambient,
            max_steps=rt.max_traversal_steps,
            shadows=shadows,
            leaf_vol=lv,
            ball_skip=bool(lv is not None and rt.exact_ball_skip),
            ladder=ladder,
            seed_live=seed_live,
            seed_t=seed_t,
            shadow_live_vol=(
                self._ensure_shadow_blk()
                if (lv is not None and shadows and rt.exact_shadow_prune)
                else None),
        )


def _frustum_crosses_sweep_plane(view, fov_deg: float, aspect: float) -> bool:
    """True when some frustum-corner ray points backward along the sweep
    axis the interior half-volume sweep would pick (the most view-aligned
    axis): |look_ax| <= tan(fov/2) * (aspect*|right_ax| + |up_ax|). An
    un-normalized pixel ray is nx*right + ny*up + look with |nx| <=
    aspect*tan_half, |ny| <= tan_half (generate_rays), so this bounds the
    minimum axis component over the cone.
    """
    import math

    v = np.asarray(view, np.float64)
    look = -v[2, :3]
    ax = int(np.argmax(np.abs(look)))
    t = math.tan(math.radians(float(fov_deg)) / 2.0)
    spread = t * (float(aspect) * abs(v[0, ax]) + abs(v[1, ax]))
    return abs(look[ax]) <= spread * (1.0 + 1e-6)


def _eye_inside_volume(grid_origin, voxel_size, dims_zyx, cam_pos) -> bool:
    cam_vox = (np.asarray(cam_pos, np.float64) - np.asarray(grid_origin, np.float64)) / float(voxel_size)
    dz, dy, dx = dims_zyx
    return bool(
        (0 <= cam_vox[0] <= dx) and (0 <= cam_vox[1] <= dy) and (0 <= cam_vox[2] <= dz)
    )
