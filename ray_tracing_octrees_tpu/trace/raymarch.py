"""Volume raymarching with advanced shading — the hot kernel of the
VolumeRaycast pipeline.

Array port of ``shaders/raycastFS.glsl`` (the 991-line fragment shader, the
reference's busiest kernel) vectorized over all pixels under one
``lax.while_loop``: per-ray front-to-back compositing with

  * adaptive step sizing (distance-, density-, edge- and angle-driven),
  * empty-space skipping via the volume mip pyramid and the precomputed
    skip-distance texture (getOptimizedSkipDistance, raycastFS.glsl:421-508),
  * frustum-culling visibility from the working volume (:644-706),
  * radiation-carve holes (:707-716),
  * TAA-style halton jitter when the camera moves (:533-546) and
    procedural blue-noise dithering (:404-414),
  * 6-iteration binary-search edge refinement (:835-861) exported as the
    depth/normal buffers,
  * the full shading stack (calculateShading, :274-351): procedural
    8-unit-block building colors and window patterns, an 8-step shadow ray,
    hemispherical sky/ground light, baked AO, indirect bounce light, rim
    light, and building-boundary edge darkening,
  * gamma, contrast, fog and dither post-processing (:965-986).

Divergent GLSL ``continue`` branches become masked state updates; every ray
advances each iteration through exactly one of the branch families, so the
loop semantics (step budgets, counters) match per ray.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_octrees_tpu.ops.sampling import (
    sample_trilinear,
    sample_lod,
)

# Lighting constants (raycastFS.glsl:28-37)
MAIN_LIGHT_DIR = np.array([0.5, 0.9, 0.4], np.float32)
MAIN_LIGHT_DIR = MAIN_LIGHT_DIR / np.linalg.norm(MAIN_LIGHT_DIR)
MAIN_LIGHT_COLOR = np.array([1.0, 0.98, 0.9], np.float32) * 4.0
SKY_LIGHT_COLOR = np.array([0.6, 0.7, 0.9], np.float32) * 0.4
GROUND_LIGHT_COLOR = np.array([0.3, 0.25, 0.2], np.float32) * 0.2
EDGE_THRESHOLD = 0.5
ALPHA_CUTOFF = 0.95
WINDOW_DENSITY = 0.4
WINDOW_WIDTH = 0.3
WINDOW_HEIGHT = 0.7

HALTON_JITTER = np.array(
    [
        [0.5000, 0.3333], [0.2500, 0.6667], [0.7500, 0.1111], [0.1250, 0.4444],
        [0.6250, 0.7778], [0.3750, 0.2222], [0.8750, 0.5556], [0.0625, 0.8889],
    ],
    np.float32,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VolumeTextures:
    """The renderer's eight 3D textures as arrays (VolumeRaycastRenderer.h:92-99)."""

    vol_mips: List[jax.Array]      # f32[Z,Y,X] mip chain (volume density 0/1)
    working: jax.Array             # f32[Z,Y,X] frustum-culled copy
    radiation: jax.Array           # f32[Z,Y,X]
    grad_mag: jax.Array            # f32[Z,Y,X]
    grad_dir: jax.Array            # f32[Z,Y,X,3]
    edge_factor: jax.Array         # f32[Z,Y,X]
    ao: jax.Array                  # f32[Z,Y,X]
    indirect: jax.Array            # f32[Z,Y,X,3]
    skip: jax.Array                # f32[sz,sy,sx] normalized skip distances
    box_min: jax.Array             # f32[3]
    box_max: jax.Array             # f32[3]


def _hash(p):
    """hash() (raycastFS.glsl:52-56)."""
    p = p - jnp.floor(p * jnp.array([0.1031, 0.1030, 0.0973], jnp.float32))\
        * jnp.reciprocal(jnp.array([0.1031, 0.1030, 0.0973], jnp.float32))
    # simpler: fract(p * k)
    p = p * jnp.array([0.1031, 0.1030, 0.0973], jnp.float32)
    p = p - jnp.floor(p)
    p = p + (p * p[..., [1, 0, 2]] + 33.33).sum(-1, keepdims=True)
    v = (p[..., 0] + p[..., 1]) * p[..., 2]
    return v - jnp.floor(v)


def _fract(x):
    return x - jnp.floor(x)


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _intersect_box(ro, rd, bmin, bmax):
    """intersectBox (raycastFS.glsl:66-88)."""
    eps = 1e-10
    safe = jnp.where(jnp.abs(rd) < eps, jnp.where(rd >= 0, 1e10, -1e10), 1.0 / rd)
    t1 = (bmin - ro) * safe
    t2 = (bmax - ro) * safe
    tmin = jnp.minimum(t1, t2).max(-1)
    tmax = jnp.maximum(t1, t2).min(-1)
    return tmin, tmax


def is_window_position(pos, normal):
    """isWindowPosition (raycastFS.glsl:123-158)."""
    rand_off = _hash(jnp.floor(pos / 5.0)) * 0.2
    wd, ww, wh = WINDOW_DENSITY, WINDOW_WIDTH, WINDOW_HEIGHT

    def band(g, width):
        return (g > (1.0 - width) * 0.5) & (g < (1.0 + width) * 0.5)

    gx_y = _fract(pos[..., 1] * wd + rand_off)
    gx_z = _fract(pos[..., 2] * (wd * 0.7))
    win_x = band(gx_y, ww) & band(gx_z, wh)

    gz_x = _fract(pos[..., 0] * wd + rand_off)
    gz_y = _fract(pos[..., 1] * (wd * 0.7))
    win_z = band(gz_x, ww) & band(gz_y, wh)

    ga = _fract(pos[..., 0] * wd + rand_off)
    gb = _fract(pos[..., 1] * (wd * 0.7))
    win_d = band(ga, ww) & band(gb, wh)

    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    out = jnp.where(
        jnp.abs(nx) > 0.7,
        win_x,
        jnp.where(
            jnp.abs(nz) > 0.7,
            win_z,
            jnp.where((ny > 0.7) | (ny < -0.7), False, win_d),
        ),
    )
    return out


def get_building_color(pos, box_min, box_max):
    """getBuildingColor (raycastFS.glsl:162-203)."""
    bpos = jnp.floor(pos / 8.0)
    bid = _hash(bpos)
    palette = jnp.array(
        [
            [0.90, 0.85, 0.75], [0.73, 0.68, 0.62], [0.86, 0.75, 0.65],
            [0.65, 0.62, 0.58], [0.81, 0.71, 0.65], [0.78, 0.82, 0.76],
        ],
        jnp.float32,
    )
    sel = jnp.where(
        bid < 0.17, 0,
        jnp.where(bid < 0.34, 1,
                  jnp.where(bid < 0.50, 2,
                            jnp.where(bid < 0.67, 3, jnp.where(bid < 0.84, 4, 5)))),
    )
    base = palette[sel]
    height = (pos[..., 1] - box_min[1]) / (box_max[1] - box_min[1])
    base = base * (1.0 + 0.15 * (height * 0.3))[..., None]

    mx = jnp.mod(pos[..., 0], 8.0)
    mz = jnp.mod(pos[..., 2], 8.0)
    dist_edge = jnp.minimum(
        jnp.minimum(jnp.abs(mx - 0.1), jnp.abs(mx - 7.9)),
        jnp.minimum(jnp.abs(mz - 0.1), jnp.abs(mz - 7.9)),
    )
    ef = _smoothstep(0.0, 0.2, dist_edge)
    base = jnp.where((dist_edge < 0.2)[..., None], base * (0.7 + 0.3 * ef)[..., None], base)
    base = base * (0.9 + 0.2 * _hash(bpos * 42.1))[..., None]
    return base


def detect_building_boundaries(pos):
    """detectBuildingBoundaries (raycastFS.glsl:207-220)."""
    cell = _fract(pos / 8.0)
    d = jnp.minimum(cell, 1.0 - cell)
    min_dist = jnp.minimum(jnp.minimum(d[..., 0], d[..., 2]), 0.5)
    return _smoothstep(0.0, 0.1, min_dist)


def calculate_shadow(tex: VolumeTextures, pos, light_dir):
    """calculateShadow (raycastFS.glsl:223-272): 8-step occlusion march."""
    ro = pos + light_dir * 0.05
    t_near, t_far_raw = _intersect_box(ro, light_dir, tex.box_min, tex.box_max)
    no_hit = t_near > t_far_raw
    t = jnp.maximum(t_near, 0.0)
    t_far = jnp.minimum(t_far_raw, 5.0)
    step = (t_far - t) / 10.0

    boundary = detect_building_boundaries(pos)
    shadow = jnp.where(boundary < 0.6, 0.8 + 0.2 * boundary, 1.0)

    box_ext = tex.box_max - tex.box_min
    for _ in range(8):
        p = ro + light_dir * t[..., None]
        uvw = (p - tex.box_min) / box_ext
        inside = ((uvw >= 0.0) & (uvw <= 1.0)).all(-1)
        den = sample_trilinear(tex.vol_mips[0], jnp.clip(uvw, 0.0, 1.0))
        rad = sample_trilinear(tex.radiation, jnp.clip(uvw, 0.0, 1.0))
        occludes = inside & (t <= t_far) & (den > EDGE_THRESHOLD) & (rad < 0.5)
        shadow = jnp.where(occludes, shadow - 0.2, shadow)
        t = t + step
    shadow = jnp.maximum(shadow, 0.2)
    return jnp.where(no_hit, 1.0, shadow)


def calculate_shading(tex: VolumeTextures, pos, normal, ray_dir, edge_factor):
    """calculateShading (raycastFS.glsl:274-351)."""
    base = get_building_color(pos, tex.box_min, tex.box_max)
    boundary = detect_building_boundaries(pos)
    edge_factor = jnp.where(
        boundary < 0.4, jnp.maximum(edge_factor, 1.0 - boundary * 2.0), edge_factor
    )
    window = is_window_position(pos, normal)

    uvw = jnp.clip((pos - tex.box_min) / (tex.box_max - tex.box_min), 0.0, 1.0)
    pre_ao = sample_trilinear(tex.ao, uvw)
    ao = 1.0 - pre_ao * 0.7
    ao = jnp.where(boundary < 0.5, ao * (0.7 + 0.3 * boundary), ao)

    l = jnp.asarray(MAIN_LIGHT_DIR)
    ndotl = jnp.maximum(0.0, (normal * l).sum(-1))
    shadow = calculate_shadow(tex, pos, jnp.broadcast_to(l, pos.shape))
    direct = jnp.asarray(MAIN_LIGHT_COLOR) * (ndotl * shadow)[..., None]

    sky = jnp.asarray(SKY_LIGHT_COLOR) * (0.5 + 0.5 * normal[..., 1])[..., None]
    ground = jnp.asarray(GROUND_LIGHT_COLOR) * (0.5 - 0.5 * normal[..., 1])[..., None]
    indirect = sample_trilinear(tex.indirect, uvw)

    rim_f = (1.0 - jnp.maximum(0.0, (normal * -ray_dir).sum(-1))) ** 3
    rim = jnp.ones(3, jnp.float32) * (rim_f * 0.3)[..., None]
    rim = jnp.where((boundary < 0.6)[..., None], rim * (2.0 * (1.0 - boundary))[..., None], rim)

    edge_dark = jnp.where(
        edge_factor > 0.7,
        0.7,
        jnp.where(
            edge_factor > 0.3,
            0.85 + 0.15 * ((0.7 - edge_factor) / 0.4),
            1.0,
        ),
    )
    edge_dark = jnp.where(boundary < 0.4, edge_dark * (0.6 + 0.4 * boundary), edge_dark)

    lit = base * (direct + sky + ground + indirect * 3.0) * (ao * edge_dark)[..., None] + rim
    return jnp.where(window[..., None], jnp.array([0.2, 0.25, 0.3], jnp.float32), lit)


def get_optimized_skip_distance(
    tex: VolumeTextures, cam_pos, ray_dir, pos,
    enable_octree_skip, use_mip_skip, max_mip_level: int,
):
    """getOptimizedSkipDistance (raycastFS.glsl:421-508)."""
    box_ext = tex.box_max - tex.box_min
    npos = (pos - tex.box_min) / box_ext
    inside = ((npos >= 0.0) & (npos <= 1.0)).all(-1)

    skip = jnp.zeros(pos.shape[:-1], jnp.float32)
    if use_mip_skip:
        found = jnp.zeros_like(inside)
        top = min(max_mip_level, 4, len(tex.vol_mips) - 1)
        for mip in range(top, -1, -1):
            vol = tex.vol_mips[mip]
            density = sample_trilinear(vol, jnp.clip(npos, 0.0, 1.0))
            thresh = 0.001 if mip > 2 else 0.01
            dz, dy, dx = vol.shape
            tex_size = jnp.array([dx, dy, dz], jnp.float32)
            cell_size = 1.0 / tex_size
            cell_min = jnp.floor(npos * tex_size) / tex_size
            cell_max = cell_min + cell_size
            inset = 0.001 + mip * 0.001
            cell_min = cell_min + cell_size * inset
            cell_max = cell_max - cell_size * inset
            wmin = tex.box_min + cell_min * box_ext
            wmax = tex.box_min + cell_max * box_ext
            _, t_far = _intersect_box(pos, ray_dir, wmin, wmax)
            exit_dist = jnp.maximum(0.0, t_far - 0.01 * (mip + 1.0))
            take = (~found) & (density < thresh) & (exit_dist > 0.0)
            skip = jnp.where(take, jnp.maximum(skip, exit_dist * (1.0 - mip * 0.05)), skip)
            found = found | take

    if enable_octree_skip:
        pre = sample_trilinear(tex.skip, jnp.clip(npos, 0.0, 1.0))
        diag = jnp.linalg.norm(box_ext)
        skip = jnp.where(skip == 0.0, pre * diag, skip)

    safety = 0.9 if use_mip_skip else 0.95
    skip = skip * safety
    if use_mip_skip and not enable_octree_skip:
        return jnp.where(inside, skip, 0.0)

    dist_cam = jnp.linalg.norm(pos - cam_pos, axis=-1)
    nd = jnp.clip(dist_cam / 50.0, 0.0, 1.0)
    scale = 0.001 + (12.0 - 0.001) * nd ** 3.5
    return jnp.where(inside, skip * scale, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "max_steps", "full_height",
        "segment_steps", "return_state",
        "use_frustum_culling", "enable_octree_skip", "use_mip_skip",
    ),
)
def raymarch_volume(
    tex: VolumeTextures,
    cam_pos,
    inv_view,
    inv_proj,
    width: int,
    height: int,
    time_value=0.0,
    octree_skip_t=0.0,
    prev_cam_pos=None,
    prev_look_dir=None,
    use_frustum_culling: bool = False,
    enable_octree_skip: bool = True,
    use_mip_skip: bool = True,
    max_steps: int = 800,
    row0=0,
    full_height: int = 0,
    resume_state=None,
    segment_steps: int = 0,
    return_state: bool = False,
):
    """Full-frame volume raymarch (traceRay, raycastFS.glsl:511-986).

    Returns dict: color f32[H, W, 4], depth f32[H, W] (refined first-edge t,
    0 where none), normal f32[H, W, 3] (gradient at the refined edge).

    ``row0``/``full_height``: render only the ``height`` pixel rows
    starting at (traced) row ``row0`` of a ``full_height``-row frame —
    pixel-identical to the corresponding rows of the full program (every
    per-pixel term derives from the absolute pixel coordinate). The
    remote XLA toolchain fails compiling this program's while-loop state
    past ~256^2 rays, so :func:`raymarch_volume_banded` tiles large
    frames over row bands of ONE compiled shape (VERDICT r4 task 6).
    """
    f32 = jnp.float32
    cam_pos = jnp.asarray(cam_pos, f32)
    inv_view = jnp.asarray(inv_view, f32)
    inv_proj = jnp.asarray(inv_proj, f32)
    time_value = jnp.asarray(time_value, f32)
    octree_skip_t = jnp.asarray(octree_skip_t, f32)
    if prev_cam_pos is None:
        prev_cam_pos = cam_pos
    if prev_look_dir is None:
        prev_look_dir = jnp.array([0.0, 0.0, -1.0], f32)
    prev_cam_pos = jnp.asarray(prev_cam_pos, f32)
    prev_look_dir = jnp.asarray(prev_look_dir, f32)

    n = width * height
    fh = full_height if full_height else height
    px = jnp.tile(jnp.arange(width, dtype=f32), height)
    py = (jnp.repeat(jnp.arange(height, dtype=f32), width)
          + jnp.asarray(row0, f32))
    coord = jnp.stack([(px + 0.5) / width, (py + 0.5) / fh], -1)
    frag_xy = jnp.stack([px, py], -1)

    def ray_from_coord(c):
        ndc = jnp.stack([2.0 * c[..., 0] - 1.0, 1.0 - 2.0 * c[..., 1]], -1)
        clip = jnp.concatenate(
            [ndc, jnp.ones(ndc.shape[:-1] + (2,), f32)], -1
        )
        # full f32 precision: the homogeneous w of clip @ invProj^T is a
        # catastrophic cancellation (~2*near/far); the TPU's default bf16
        # matmul rounds it to exactly zero -> NaN rays
        hp = jax.lax.Precision.HIGHEST
        view = jnp.matmul(clip, inv_proj.T, precision=hp)
        view = view / view[..., 3:4]
        world = jnp.matmul(view, inv_view.T, precision=hp)
        d = world[..., :3] - cam_pos
        return world[..., :3], d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    world_pt, ray_dir0 = ray_from_coord(coord)

    frame_number = jnp.mod(time_value * 60.0, 16.0).astype(jnp.int32)
    moving = (jnp.linalg.norm(cam_pos - prev_cam_pos) > 0.001) | (
        (prev_look_dir / jnp.maximum(jnp.linalg.norm(prev_look_dir), 1e-30)
         * ray_dir0).sum(-1) < 0.9999
    )
    vol0 = tex.vol_mips[0]
    tex_xy = jnp.array([vol0.shape[2], vol0.shape[1]], f32)
    jitter = jnp.asarray(HALTON_JITTER)[frame_number % 8] * 1.5 / tex_xy
    jit_coord = coord + jnp.where(moving[..., None], jitter[None, :], 0.0)
    world_pt, ray_dir = ray_from_coord(jit_coord)

    t_near_raw, t_far = _intersect_box(cam_pos, ray_dir, tex.box_min, tex.box_max)
    t_near = jnp.maximum(t_near_raw, 0.0)
    t_near = jnp.where(octree_skip_t > 0.0, jnp.maximum(t_near, octree_skip_t), t_near)
    misses_box = t_near > t_far

    view_dist = jnp.linalg.norm(world_pt - cam_pos, axis=-1)
    dist_factor = jnp.clip(view_dist / 500.0, 0.0, 1.0)
    box_diag = jnp.linalg.norm(tex.box_max - tex.box_min)
    base_step = (
        jnp.minimum(box_diag / 2048.0, (t_far - t_near) / 2048.0) * (1 - dist_factor)
        + jnp.minimum(box_diag / 1024.0, (t_far - t_near) / 1024.0) * dist_factor
    )

    # blue-noise offset (raycastFS.glsl:404-414)
    nxy = frag_xy + jnp.stack(
        [jnp.broadcast_to(time_value * 0.11, (n,)), jnp.broadcast_to(time_value * 0.17, (n,))], -1
    )
    def h2(v, k, m):
        s = jnp.sin((nxy * jnp.array(k, f32)).sum(-1)) * m
        return s - jnp.floor(s)
    noise_offset = (
        jnp.stack(
            [
                h2(nxy, [127.1, 311.7], 43758.5453123),
                h2(nxy, [269.5, 183.3], 41749.6721234),
                h2(nxy, [419.2, 371.9], 81749.8975432),
            ],
            -1,
        )
        * 2.0
        - 1.0
    ) * 0.001

    pixel_noise = _hash(
        jnp.concatenate([frag_xy, jnp.broadcast_to(time_value * 1111.0, (n, 1))], -1)
    )
    t0 = t_near + base_step * pixel_noise * 0.5
    ray_angle_var = jnp.abs(ray_dir[..., 1])
    t0 = t0 + ray_angle_var * 0.1 * base_step

    max_steps_per_ray = (max_steps - (dist_factor * 350.0).astype(jnp.int32)).astype(
        jnp.int32
    )
    box_ext = tex.box_max - tex.box_min
    max_mip = len(tex.vol_mips) - 1

    state = dict(
        i=jnp.zeros((), jnp.int32),
        T=t0,
        alpha=jnp.zeros(n, f32),
        color=jnp.zeros((n, 3), f32),
        was_inside=jnp.zeros(n, bool),
        was_empty=jnp.zeros(n, bool),
        prev_density=jnp.zeros(n, f32),
        empty_ctr=jnp.zeros(n, f32),
        detail_ctr=jnp.zeros(n, f32),
        boundary_ctr=jnp.zeros(n, f32),
        cur_step=base_step,
        steps_taken=jnp.zeros(n, jnp.int32),
        edge_depth=jnp.zeros(n, f32),
        edge_normal=jnp.zeros((n, 3), f32),
        done=misses_box,
    )
    if resume_state is not None:
        state = resume_state

    # segment cap: each dispatch runs at most ``segment_steps`` march
    # iterations (a long-marching dispatch — 451 iterations observed at
    # 512x64 — can kill the remote TPU worker); callers resume via
    # resume_state until i reaches max_steps or every ray is done.
    i_cap = (jnp.minimum(state["i"] + segment_steps, max_steps)
             if segment_steps else max_steps)

    def cond(s):
        return (s["i"] < i_cap) & jnp.any(~s["done"])

    def body(s):
        i = s["i"]
        T = s["T"]
        alive = (
            ~s["done"]
            & (T <= t_far)
            & (s["alpha"] <= ALPHA_CUTOFF)
            & (s["steps_taken"] < max_steps_per_ray)
        )
        handled = ~alive  # rays that take no action this iteration

        pos = cam_pos + ray_dir * T[..., None]

        # --- periodic skip check (raycastFS.glsl:627-637) ----------------------
        if enable_octree_skip or use_mip_skip:
            do_skip = alive & (i % 5 == 0)
            skip_d = get_optimized_skip_distance(
                tex, cam_pos, ray_dir, pos, enable_octree_skip, use_mip_skip, max_mip
            )
            skipped = do_skip & (skip_d > 0.0)
            T = jnp.where(skipped, T + skip_d, T)
            handled = handled | skipped
        # -----------------------------------------------------------------------

        pos = pos + noise_offset * (0.5 + 1.5 * dist_factor)[..., None]
        uvw = (pos - tex.box_min) / box_ext

        # mip-mode frustum boundary (raycastFS.glsl:644-672)
        if use_frustum_culling and use_mip_skip:
            visf = sample_trilinear(tex.working, jnp.clip(uvw, 0.0, 1.0))
            hard = (~handled) & alive & (visf < 0.001)
            T = jnp.where(hard, T + base_step * 4.0, T)
            handled = handled | hard
            falloff = _smoothstep(0.0, 0.1, visf)
            soft = (~handled) & alive & (visf < 0.1) & (falloff < 0.2)
            T = jnp.where(soft, T + base_step * (1.0 + (1.0 - falloff) * 3.0), T)
            handled = handled | soft

        # outside-volume handling (:675-700)
        outside_dist = jnp.maximum(jnp.maximum(-uvw, uvw - 1.0), 0.0).max(-1)
        is_outside = outside_dist > 0.0
        far_outside = (~handled) & alive & is_outside & (outside_dist >= 0.05)
        T = jnp.where(far_outside, T + base_step * (3.0 + outside_dist * 10.0), T)
        handled = handled | far_outside
        near_boundary = is_outside & (outside_dist < 0.05)
        uvw = jnp.where(
            near_boundary[..., None], jnp.clip(uvw, 0.001, 0.999), uvw
        )
        boundary_ctr = jnp.where(
            near_boundary,
            s["boundary_ctr"] + 1.0,
            jnp.maximum(0.0, s["boundary_ctr"] - 0.5),
        )

        # plain frustum-culling check (:704-714)
        if use_frustum_culling:
            vis = sample_trilinear(tex.working, jnp.clip(uvw, 0.0, 1.0))
            culled = (~handled) & alive & (vis < 0.001)
            T = jnp.where(
                culled, T + base_step * (1.0 + 3.0 * (1.0 - vis * 10.0)), T
            )
            handled = handled | culled

        rad_val = sample_trilinear(tex.radiation, jnp.clip(uvw, 0.0, 1.0))

        # density sampling (:718-760)
        hq = near_boundary | (boundary_ctr > 0.0) | (dist_factor < 0.5) | use_mip_skip
        if use_mip_skip:
            base_lod = jnp.clip(dist_factor * 2.0, 0.0, 3.0)
            jit_off = _fract(time_value * 0.1 + pixel_noise * 0.5) * 0.5
            lod = base_lod + jit_off
            offsets = jnp.array(
                [[0, 0, 0], [0.001, 0.001, 0.001], [-0.001, 0.001, -0.001], [0.001, -0.001, 0.001]],
                f32,
            )
            den_hq = jnp.zeros(n, f32)
            for sidx in range(4):
                so = offsets[sidx] * (lod + 0.5)[..., None]
                den_hq = den_hq + sample_lod(tex.vol_mips, jnp.clip(uvw + so, 0.0, 1.0), lod)
            den_hq = den_hq / 4.0
        else:
            uvw_j = uvw + noise_offset * 0.001
            den_hq = sample_trilinear(vol0, jnp.clip(uvw_j, 0.0, 1.0))
            offsets = jnp.array([[0.001, 0.001, 0.001], [-0.001, 0.001, -0.001]], f32)
            for sidx in range(2):
                so = offsets[sidx] * (1.0 + pixel_noise * 0.5)[..., None]
                den_hq = den_hq + sample_trilinear(vol0, jnp.clip(uvw + so, 0.0, 1.0))
            den_hq = den_hq / 3.0
        lod_std = dist_factor * 2.0
        den_std = sample_lod(tex.vol_mips, jnp.clip(uvw, 0.0, 1.0), lod_std)
        den = jnp.where(hq, den_hq, den_std)
        den = den + (pixel_noise - 0.5) * 0.01

        # carved-by-radiation step (:763-777)
        empty_ctr = s["empty_ctr"]
        rad_step = (~handled) & alive & (rad_val > 0.05)
        ec1 = empty_ctr + 1.0
        var_step = base_step * (1.0 + 3.0 * jnp.minimum(1.0, ec1 / 15.0))
        var_step = var_step * (
            1.0 + 0.1 * jnp.sin((ray_dir * jnp.array([1.0, 3.0, 2.0], f32)).sum(-1) * 10.0 + time_value)
        )
        T = jnp.where(rad_step, T + var_step * (1.0 + 0.5 * rad_val), T)
        handled = handled | rad_step

        # empty voxel step (:780-812)
        empty_step = (~handled) & alive & (den < 0.01)
        ec2 = empty_ctr + 1.0
        vstep = base_step * (1.5 + 4.5 * jnp.minimum(1.0, ec2 / 25.0))
        if use_mip_skip:
            vstep = vstep * (0.7 + 0.3 * _smoothstep(0.0, 30.0, ec2))
            vstep = vstep * jnp.where(dist_factor < 0.3, 0.6, 0.9)
            tj = jnp.sin(time_value * 3.0 + _hash(
                jnp.concatenate([frag_xy, jnp.zeros((n, 1), f32)], -1)) * 6.28) * 0.5 + 0.5
            vstep = vstep * (0.9 + 0.1 * tj)
        vstep = vstep * (1.0 + 0.1 * jnp.sin(ray_dir[..., 1] * 20.0 + time_value))
        vstep = jnp.where(near_boundary | (boundary_ctr > 0.0), vstep * 0.3, vstep)
        T = jnp.where(empty_step, T + vstep, T)

        took_empty = rad_step | empty_step
        empty_ctr = jnp.where(took_empty, empty_ctr + 1.0, empty_ctr)
        was_empty = jnp.where(took_empty, True, s["was_empty"])
        detail_ctr = jnp.where(took_empty, 0.0, s["detail_ctr"])
        handled = handled | empty_step

        # --- non-empty sample: shading path (:815-940) --------------------------
        shade_ray = alive & ~handled
        was_empty = jnp.where(shade_ray & was_empty, False, was_empty)
        empty_ctr = jnp.where(shade_ray, 0.0, empty_ctr)

        is_inside = den > EDGE_THRESHOLD
        crossing = shade_ray & (
            (is_inside != s["was_inside"]) | (jnp.abs(den - s["prev_density"]) > 0.15)
        )

        # binary-search edge refinement (:835-861)
        refine_ok = crossing & (i > 0) & ~near_boundary
        prev_t = T - s["cur_step"]
        cur_t = T
        for _ in range(6):
            mid_t = 0.5 * (prev_t + cur_t)
            mid_pos = cam_pos + ray_dir * mid_t[..., None]
            mid_uvw = (mid_pos - tex.box_min) / box_ext
            mid_in = ((mid_uvw >= 0.0) & (mid_uvw <= 1.0)).all(-1)
            mid_den = sample_trilinear(vol0, jnp.clip(mid_uvw, 0.0, 1.0))
            same = (mid_den > EDGE_THRESHOLD) == is_inside
            upd = refine_ok & mid_in
            cur_t = jnp.where(upd & same, mid_t, cur_t)
            prev_t = jnp.where(upd & ~same, mid_t, prev_t)
        refined_t = jnp.where(refine_ok, cur_t, T)
        refined_pos = cam_pos + ray_dir * refined_t[..., None]
        refined_uvw = jnp.clip((refined_pos - tex.box_min) / box_ext, 0.0, 1.0)
        edge_normal = jnp.where(
            crossing[..., None],
            sample_trilinear(tex.grad_dir, refined_uvw),
            s["edge_normal"],
        )
        edge_depth = jnp.where(crossing, refined_t, s["edge_depth"])
        boundary_ctr = jnp.where(crossing, 5.0, boundary_ctr)
        was_inside = jnp.where(shade_ray, is_inside, s["was_inside"])
        prev_density = jnp.where(shade_ray, den, s["prev_density"])

        grad_mag = sample_trilinear(tex.grad_mag, jnp.clip(uvw, 0.0, 1.0))
        normal = sample_trilinear(tex.grad_dir, jnp.clip(uvw, 0.0, 1.0))
        edge_dist = sample_trilinear(tex.edge_factor, jnp.clip(uvw, 0.0, 1.0))

        do_shade = shade_ray & ((edge_dist > 0.1) | is_inside)
        detail_ctr = jnp.where(do_shade, detail_ctr + 1.0, detail_ctr)

        a = jnp.minimum(0.9999, 0.95 + pixel_noise * 0.02)
        a = jnp.where(edge_dist > 0.5, 0.9999, a)
        a = jnp.where(near_boundary, jnp.minimum(0.95, a * 0.9), a)

        lit = calculate_shading(tex, pos, normal, ray_dir, edge_dist)
        old_alpha = s["alpha"]
        new_alpha = old_alpha + (1.0 - old_alpha) * a
        contrib = ((1.0 - old_alpha) * a)[..., None] * lit
        alpha = jnp.where(do_shade, new_alpha, old_alpha)
        color = jnp.where(do_shade[..., None], s["color"] + contrib, s["color"])

        # shaded step size (:900-927)
        detail_factor = jnp.minimum(1.0, detail_ctr / 20.0)
        bss_uniform = (0.2 + (0.1 - 0.2) * detail_factor)
        bss_uniform = bss_uniform + (0.5 - bss_uniform) * dist_factor
        bss = jnp.where(
            (edge_dist > 0.5) | near_boundary,
            0.02 + 0.08 * dist_factor,
            jnp.where(
                (edge_dist > 0.2) | (grad_mag > 0.8),
                0.05 + 0.15 * dist_factor,
                jnp.where(grad_mag > 0.6, 0.1 + 0.2 * dist_factor, bss_uniform),
            ),
        )
        dir_jit = 0.1 * jnp.sin(ray_dir[..., 1] * 15.0 + time_value + pixel_noise * 6.28)
        shade_step = base_step * bss * (1.0 + dir_jit)

        # non-shaded in-volume step (:929-940)
        idle_scale = 1.5 * (1.0 + 0.1 * jnp.sin(ray_dir[..., 1] * 10.0 + frag_xy[..., 0] * 0.01))
        idle_scale = jnp.where(near_boundary | (boundary_ctr > 0.0), idle_scale * 0.3, idle_scale)
        idle_step = base_step * idle_scale

        cur_step = jnp.where(
            do_shade, shade_step, jnp.where(shade_ray, idle_step, s["cur_step"])
        )
        T = jnp.where(shade_ray, T + cur_step, T)

        steps_taken = s["steps_taken"] + alive.astype(jnp.int32)
        done = s["done"] | (~alive)

        return dict(
            i=i + 1,
            T=T,
            alpha=alpha,
            color=color,
            was_inside=was_inside,
            was_empty=was_empty,
            prev_density=prev_density,
            empty_ctr=empty_ctr,
            detail_ctr=detail_ctr,
            boundary_ctr=boundary_ctr,
            cur_step=cur_step,
            steps_taken=steps_taken,
            edge_depth=edge_depth,
            edge_normal=edge_normal,
            done=done,
        )

    s = jax.lax.while_loop(cond, body, state)
    if return_state:
        return s

    accum_alpha = s["alpha"]
    accum_color = s["color"]
    boundary_ctr = s["boundary_ctr"]

    # post-processing (:943-986)
    final = jnp.where(
        (accum_alpha < 0.1)[..., None], jnp.zeros(3, f32), accum_color
    )
    nonzero = accum_alpha >= 0.1
    final = jnp.where(nonzero[..., None], jnp.abs(final) ** (1.0 / 2.2), final)
    dither = (
        _hash(jnp.concatenate([frag_xy, jnp.broadcast_to(time_value * 591.3, (n, 1))], -1))
        - 0.5
    ) * 0.01
    final = jnp.where(nonzero[..., None], final + dither[..., None], final)
    final = jnp.where(nonzero[..., None], final / (final + 0.15), final)
    fog = (1.0 - jnp.exp(-view_dist * 0.0001)) * 0.15
    fog_color = jnp.array([0.15, 0.17, 0.2], f32)
    final = jnp.where(
        nonzero[..., None], final + fog[..., None] * (fog_color - final), final
    )
    if use_mip_skip:
        tn = (noise_offset / 0.001) * 0.5 + 0.5  # blueNoise in [0,1]
        final = jnp.where(
            nonzero[..., None],
            final + 0.4 * (final * (0.97 + tn[..., :1] * 0.06) - final),
            final,
        )

    rgba = jnp.concatenate([final, jnp.ones((n, 1), f32)], -1)
    return dict(
        color=rgba.reshape(height, width, 4),
        depth=s["edge_depth"].reshape(height, width),
        normal=s["edge_normal"].reshape(height, width, 3),
        alpha=accum_alpha.reshape(height, width),
        steps=s["steps_taken"].reshape(height, width),
        iters=s["i"],
        t_final=s["T"].reshape(height, width),
        t_near=t_near.reshape(height, width),
        t_far=t_far.reshape(height, width),
    )


def raymarch_volume_banded(
    tex: VolumeTextures,
    cam_pos,
    inv_view,
    inv_proj,
    width: int,
    height: int,
    band_rows: int = 32,
    **kwargs,
):
    """Row-banded oracle frame: pixel-identical to ``raymarch_volume`` at
    (width, height), compiled at ONE (width, band_rows) shape and run
    over ceil(height / band_rows) sequential bands.

    Exists because the monolithic per-ray program cannot run past
    ~256^2 rays on the remote TPU runtime (docs/ROADMAP.md r2 outcome 5)
    while the reference ran 1300^2 (main.cpp:990). Round-5 root cause:
    it is a per-DISPATCH duration limit, not program size — a 512x64
    band whose worst ray marches 451 iterations reproducibly kills the
    TPU worker ("kernel fault"), while the same rows pass at 32-row
    bands (half the per-iteration work) or a 400-step cap. Banding
    bounds the dispatch with zero semantic change — every per-pixel
    quantity (rays, jitter, blue noise, dither) is a function of the
    absolute pixel coordinate, which ``row0`` preserves (bitwise-equal
    to the monolithic program, tests/test_raymarch.py).
    """
    assert height % band_rows == 0, (height, band_rows)
    max_steps = kwargs.get("max_steps", 800)
    seg = int(kwargs.pop("segment_steps", 100))
    outs = []
    for r0 in range(0, height, band_rows):
        # march in <= seg-iteration dispatches (resume_state threading):
        # one long dispatch can die mid-march; segments keep each under
        # the observed limit, bitwise-identical by construction
        st = None
        while True:
            st = raymarch_volume(
                tex, cam_pos, inv_view, inv_proj, width, band_rows,
                row0=r0, full_height=height, resume_state=st,
                segment_steps=seg, return_state=True, **kwargs)
            jax.block_until_ready(st["i"])
            if int(st["i"]) >= max_steps or not bool(
                    jnp.any(~st["done"])):
                break
        out = raymarch_volume(
            tex, cam_pos, inv_view, inv_proj, width, band_rows,
            row0=r0, full_height=height, resume_state=st, **kwargs)
        jax.block_until_ready(out["alpha"])
        outs.append(out)
    import numpy as _np

    res = {}
    for k in outs[0]:
        if k == "iters":
            res[k] = max(int(o[k]) for o in outs)
        else:
            res[k] = jnp.concatenate([o[k] for o in outs], axis=0)
    return res
