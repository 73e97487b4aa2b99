"""Filled-triangle z-buffer rasterizer with the reference's Phong shading.

Headless array-program replacement for the reference's GL mesh pipeline
(453-skeleton/shaders/test.vert + test.frag, drawn at main.cpp:1252-1259):
MVP transform, barycentric coverage, depth test, and the exact test.frag
lighting — ambient 0.3, Lambert diffuse, specular 0.5 * max(r.v, 0)^32,
white point light at (100, 100, 100), all modulated by the vertex color.
The reference computes its specular view vector as ``normalize(-FragPos)``
(viewer at the WORLD origin, not the camera — test.frag's quirk with
M = I); we reproduce that exactly for image parity.

Design (TPU/XLA): one jitted program; every triangle rasterizes a static
``samples x samples`` pixel grid clamped to its screen bounding box (MC/DC
/Blocks triangles are voxel-scale, a few pixels each — triangles larger
than the sample grid get partial coverage, which only matters for extreme
close-ups). Depth resolution is the classic two-pass scatter trick:
scatter-min depth per pixel, then scatter payloads where a sample's depth
equals the winning depth. Wireframe overlays rasterize line segments by
sampling along each segment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_LIGHT_POS = (100.0, 100.0, 100.0)   # test.frag:8
_AMBIENT = 0.3                       # test.frag:12
_SPECULAR = 0.5                      # test.frag:22
_SHININESS = 32.0                    # test.frag:25
_BG = (0.0, 0.0, 0.0)


def phong_shade(pos, nrm, base_color):
    """test.frag:7-29 exactly, vectorized over [..., 3] arrays."""
    light = jnp.asarray(_LIGHT_POS, jnp.float32)
    n = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-30)
    ldir = light - pos
    ldir = ldir / jnp.maximum(
        jnp.linalg.norm(ldir, axis=-1, keepdims=True), 1e-30)
    diff = jnp.maximum((n * ldir).sum(-1), 0.0)
    view = -pos
    view = view / jnp.maximum(
        jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-30)
    refl = 2.0 * (n * ldir).sum(-1, keepdims=True) * n - ldir
    spec = _SPECULAR * jnp.maximum((view * refl).sum(-1), 0.0) ** _SHININESS
    inten = _AMBIENT + diff + spec
    return inten[..., None] * base_color


@functools.partial(
    jax.jit, static_argnames=("width", "height", "samples"))
def rasterize_triangles(
    tris,        # f32[T, 3, 3] world-space triangles
    normals,     # f32[T, 3] per-triangle normals (world)
    colors,      # f32[T, 3] per-triangle base colors
    view_proj,   # f32[4, 4] P @ V
    width: int,
    height: int,
    valid=None,  # optional bool[T]
    cam_pos=None,  # f32[3]; when given, normals flip to face the camera
    samples: int = 16,
):
    """Render filled triangles; returns f32[height, width, 4] RGBA.

    Shading is computed per covered sample at the interpolated world
    position with the triangle's flat normal (the reference interpolates
    per-vertex normals, but MC emits flat per-triangle normals anyway —
    OctreeVoxel.cpp:863-871)."""
    f32 = jnp.float32
    T = tris.shape[0]
    if valid is None:
        valid = jnp.ones((T,), bool)

    hom = jnp.concatenate(
        [tris, jnp.ones((T, 3, 1), f32)], axis=-1) @ view_proj.T   # [T,3,4]
    w = hom[..., 3]
    ok = valid & (w > 1e-6).all(axis=-1)
    ndc = hom[..., :3] / jnp.maximum(w[..., None], 1e-6)
    sx = (ndc[..., 0] * 0.5 + 0.5) * (width - 1)                   # [T,3]
    sy = (0.5 - ndc[..., 1] * 0.5) * (height - 1)
    sz = ndc[..., 2]
    ok = ok & (jnp.abs(sz) <= 1.0).all(axis=-1)

    # clamped integer bbox, anchored at its min corner
    x0 = jnp.clip(jnp.floor(sx.min(-1)), 0, width - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(sy.min(-1)), 0, height - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil(sx.max(-1)), 0, width - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil(sy.max(-1)), 0, height - 1).astype(jnp.int32)

    gx = jnp.arange(samples, dtype=jnp.int32)
    px = x0[:, None, None] + gx[None, None, :]                     # [T,1,S]
    py = y0[:, None, None] + gx[None, :, None]                     # [T,S,1]
    cover_bb = (px <= x1[:, None, None]) & (py <= y1[:, None, None])
    pxf = px.astype(f32) + 0.0
    pyf = py.astype(f32) + 0.0

    # 2D edge functions (signed areas); inside = all same sign as total
    ax, ay = sx[:, 0, None, None], sy[:, 0, None, None]
    bx, by = sx[:, 1, None, None], sy[:, 1, None, None]
    cx, cy = sx[:, 2, None, None], sy[:, 2, None, None]
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    e0 = (bx - pxf) * (cy - pyf) - (by - pyf) * (cx - pxf)   # vs vertex a
    e1 = (cx - pxf) * (ay - pyf) - (cy - pyf) * (ax - pxf)   # vs vertex b
    e2 = (ax - pxf) * (by - pyf) - (ay - pyf) * (bx - pxf)   # vs vertex c
    s = jnp.sign(area)
    inside = (e0 * s >= 0) & (e1 * s >= 0) & (e2 * s >= 0) \
        & (jnp.abs(area) > 1e-12)
    cover = cover_bb & inside & ok[:, None, None]

    inv_area = 1.0 / jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
    b0 = e0 * inv_area
    b1 = e1 * inv_area
    b2 = e2 * inv_area
    depth = b0 * sz[:, 0, None, None] + b1 * sz[:, 1, None, None] \
        + b2 * sz[:, 2, None, None]
    wpos = (b0[..., None] * tris[:, None, None, 0]
            + b1[..., None] * tris[:, None, None, 1]
            + b2[..., None] * tris[:, None, None, 2])

    # Shade the VISIBLE face: MC/DC triangle winding orients normals
    # toward the filled side (OctreeVoxel.cpp:863-871 winding + the
    # FILLED -> -1 field), so flip per-triangle normals toward the
    # camera — the same two-sided convention trace/mesh_grid.py uses.
    # (Lighting itself keeps test.frag's world-origin view vector.)
    if cam_pos is not None:
        center = tris.mean(axis=1)
        to_cam = jnp.asarray(cam_pos, f32)[None, :] - center
        normals = jnp.where(
            ((normals * to_cam).sum(-1) >= 0)[:, None], normals, -normals)
    rgb = phong_shade(wpos, normals[:, None, None, :],
                      colors[:, None, None, :])

    pix = (py * width + px).reshape(-1)
    coverf = cover.reshape(-1)
    depthf = jnp.where(coverf, depth.reshape(-1), f32(2.0))
    npx = width * height
    pix_c = jnp.where(coverf, pix, npx)

    zbuf = jnp.full((npx,), f32(2.0)).at[pix_c].min(depthf, mode="drop")
    # winners: samples matching the stored depth (ties break arbitrarily
    # between equal-depth samples, as any z-buffer does)
    win = coverf & (depthf <= zbuf[jnp.minimum(pix_c, npx - 1)])
    pix_w = jnp.where(win, pix, npx)
    img = jnp.zeros((npx, 3), f32)
    img = img.at[pix_w].set(rgb.reshape(-1, 3), mode="drop")
    covered = jnp.zeros((npx,), bool).at[pix_w].set(win, mode="drop")
    img = jnp.where(covered[:, None], img,
                    jnp.asarray(_BG, f32)[None, :])
    rgba = jnp.concatenate(
        [jnp.clip(img, 0.0, 1.0),
         jnp.ones((npx, 1), f32)], axis=-1)
    return rgba.reshape(height, width, 4), zbuf.reshape(height, width)


@functools.partial(
    jax.jit, static_argnames=("width", "height", "samples"))
def rasterize_lines(
    img,         # f32[H, W, 4] to draw over
    zbuf,        # f32[H, W] depth from rasterize_triangles (or 2.0 fill)
    segs,        # f32[L, 2, 3] world-space segments
    view_proj,
    width: int,
    height: int,
    color=(1.0, 1.0, 1.0),
    valid=None,
    samples: int = 64,
    depth_bias: float = 1e-3,
):
    """Depth-tested line overlay (the reference's wireframe draw uses the
    same program with overrideColor, main.cpp:1404-1408)."""
    f32 = jnp.float32
    L = segs.shape[0]
    if valid is None:
        valid = jnp.ones((L,), bool)
    hom = jnp.concatenate(
        [segs, jnp.ones((L, 2, 1), f32)], axis=-1) @ view_proj.T
    w = hom[..., 3]
    ok = valid & (w > 1e-6).all(axis=-1)
    ndc = hom[..., :3] / jnp.maximum(w[..., None], 1e-6)
    sx = (ndc[..., 0] * 0.5 + 0.5) * (width - 1)
    sy = (0.5 - ndc[..., 1] * 0.5) * (height - 1)
    sz = ndc[..., 2]

    t = jnp.linspace(0.0, 1.0, samples)[None, :]
    px = (sx[:, 0:1] + (sx[:, 1:2] - sx[:, 0:1]) * t)
    py = (sy[:, 0:1] + (sy[:, 1:2] - sy[:, 0:1]) * t)
    pz = (sz[:, 0:1] + (sz[:, 1:2] - sz[:, 0:1]) * t)
    ix = jnp.round(px).astype(jnp.int32)
    iy = jnp.round(py).astype(jnp.int32)
    inb = (ix >= 0) & (ix < width) & (iy >= 0) & (iy < height) \
        & (jnp.abs(pz) <= 1.0) & ok[:, None]
    pix = (iy * width + ix).reshape(-1)
    npx = width * height
    zflat = zbuf.reshape(-1)
    vis = inb.reshape(-1) & (
        pz.reshape(-1) <= zflat[jnp.clip(pix, 0, npx - 1)] + depth_bias)
    pix_w = jnp.where(vis, pix, npx)
    out = img.reshape(npx, 4)
    col = jnp.concatenate([jnp.asarray(color, f32), jnp.ones(1, f32)])
    out = out.at[pix_w].set(col, mode="drop")
    return out.reshape(height, width, 4)
