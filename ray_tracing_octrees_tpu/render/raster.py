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
    jax.jit, static_argnames=("width", "height", "samples", "chunk"))
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
    chunk: int = 16384,
):
    """Render filled triangles; returns f32[height, width, 4] RGBA.

    Shading is computed per covered sample at the interpolated world
    position with the triangle's flat normal (the reference interpolates
    per-vertex normals, but MC emits flat per-triangle normals anyway —
    OctreeVoxel.cpp:863-871).

    Triangles rasterize in fori chunks of ``chunk`` with two passes
    (scatter-min depth, then color write-back where a sample's depth
    equals the winner), and every bulk array keeps its big axis LAST —
    a trailing size-3 axis tiles to 42x its bytes on TPU, which blew
    past HBM on city-scale meshes before this layout."""
    f32 = jnp.float32
    T = tris.shape[0]
    if valid is None:
        valid = jnp.ones((T,), bool)
    pad = (-T) % chunk
    if pad:
        tris = jnp.concatenate([tris, jnp.zeros((pad, 3, 3), f32)])
        normals = jnp.concatenate([normals, jnp.ones((pad, 3), f32)])
        colors = jnp.concatenate([colors, jnp.zeros((pad, 3), f32)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    n_chunks = tris.shape[0] // chunk

    # per-triangle screen data as FLAT per-component arrays [Tp]
    hom = jnp.concatenate(
        [tris, jnp.ones((tris.shape[0], 3, 1), f32)], axis=-1) @ view_proj.T
    w = hom[..., 3]
    ok = valid & (w > 1e-6).all(axis=-1)
    ndc = hom[..., :3] / jnp.maximum(w[..., None], 1e-6)
    sxv = [(ndc[:, v, 0] * 0.5 + 0.5) * (width - 1) for v in range(3)]
    syv = [(0.5 - ndc[:, v, 1] * 0.5) * (height - 1) for v in range(3)]
    szv = [ndc[:, v, 2] for v in range(3)]
    ok = ok & jnp.stack([jnp.abs(z) <= 1.0 for z in szv]).all(0)
    if cam_pos is not None:
        # flip normals camera-facing (two-sided shading of MC/DC meshes,
        # same convention as trace/mesh_grid.py)
        center = tris.mean(axis=1)
        to_cam = jnp.asarray(cam_pos, f32)[None, :] - center
        normals = jnp.where(
            ((normals * to_cam).sum(-1) >= 0)[:, None], normals, -normals)
    wxv = [tris[:, v, 0] for v in range(3)]
    wyv = [tris[:, v, 1] for v in range(3)]
    wzv = [tris[:, v, 2] for v in range(3)]
    nx, ny, nz = normals[:, 0], normals[:, 1], normals[:, 2]
    cr, cg, cb = colors[:, 0], colors[:, 1], colors[:, 2]
    npx = width * height
    gx = jnp.arange(samples, dtype=jnp.int32)

    def geom(ci):
        """Per-chunk coverage/depth/barycentrics, all [chunk, S, S]."""
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ci * chunk, chunk, 0)
        ax, bx, cx = (sl(v)[:, None, None] for v in sxv)
        ay, by, cy = (sl(v)[:, None, None] for v in syv)
        az, bz, cz = (sl(v)[:, None, None] for v in szv)
        okc = sl(ok)[:, None, None]
        x0 = jnp.clip(jnp.floor(jnp.minimum(jnp.minimum(ax, bx), cx)),
                      0, width - 1).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(jnp.minimum(jnp.minimum(ay, by), cy)),
                      0, height - 1).astype(jnp.int32)
        x1 = jnp.clip(jnp.ceil(jnp.maximum(jnp.maximum(ax, bx), cx)),
                      0, width - 1).astype(jnp.int32)
        y1 = jnp.clip(jnp.ceil(jnp.maximum(jnp.maximum(ay, by), cy)),
                      0, height - 1).astype(jnp.int32)
        px = x0 + gx[None, None, :]
        py = y0 + gx[None, :, None]
        cover_bb = (px <= x1) & (py <= y1)
        pxf = px.astype(f32)
        pyf = py.astype(f32)
        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        e0 = (bx - pxf) * (cy - pyf) - (by - pyf) * (cx - pxf)
        e1 = (cx - pxf) * (ay - pyf) - (cy - pyf) * (ax - pxf)
        e2 = (ax - pxf) * (by - pyf) - (ay - pyf) * (bx - pxf)
        s = jnp.sign(area)
        inside = (e0 * s >= 0) & (e1 * s >= 0) & (e2 * s >= 0) \
            & (jnp.abs(area) > 1e-12)
        cover = cover_bb & inside & okc
        inv_area = 1.0 / jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
        b0, b1, b2 = e0 * inv_area, e1 * inv_area, e2 * inv_area
        depth = b0 * az + b1 * bz + b2 * cz
        pix = py * width + px
        return sl, cover, depth, (b0, b1, b2), pix

    def pass1(ci, zbuf):
        _, cover, depth, _, pix = geom(ci)
        coverf = cover.reshape(-1)
        depthf = jnp.where(coverf, depth.reshape(-1), f32(2.0))
        pix_c = jnp.where(coverf, pix.reshape(-1), npx)
        return zbuf.at[pix_c].min(depthf, mode="drop")

    zbuf = jax.lax.fori_loop(
        0, n_chunks, pass1, jnp.full((npx,), f32(2.0)))

    def pass2(ci, img):
        sl, cover, depth, (b0, b1, b2), pix = geom(ci)
        interp = lambda v3: (b0 * sl(v3[0])[:, None, None]
                             + b1 * sl(v3[1])[:, None, None]
                             + b2 * sl(v3[2])[:, None, None])
        wx, wy, wz = interp(wxv), interp(wyv), interp(wzv)
        nxc = sl(nx)[:, None, None]
        nyc = sl(ny)[:, None, None]
        nzc = sl(nz)[:, None, None]
        # test.frag:7-29 on separated components
        nl = jnp.sqrt(jnp.maximum(nxc * nxc + nyc * nyc + nzc * nzc, 1e-30))
        nxc, nyc, nzc = nxc / nl, nyc / nl, nzc / nl
        lx, ly, lz = (jnp.float32(c) for c in _LIGHT_POS)
        ldx, ldy, ldz = lx - wx, ly - wy, lz - wz
        ll = jnp.sqrt(jnp.maximum(ldx * ldx + ldy * ldy + ldz * ldz, 1e-30))
        ldx, ldy, ldz = ldx / ll, ldy / ll, ldz / ll
        diff = jnp.maximum(nxc * ldx + nyc * ldy + nzc * ldz, 0.0)
        vl = jnp.sqrt(jnp.maximum(wx * wx + wy * wy + wz * wz, 1e-30))
        vx, vy, vz = -wx / vl, -wy / vl, -wz / vl
        ndl = nxc * ldx + nyc * ldy + nzc * ldz
        rx = 2.0 * ndl * nxc - ldx
        ry = 2.0 * ndl * nyc - ldy
        rz = 2.0 * ndl * nzc - ldz
        spec = _SPECULAR * jnp.maximum(
            vx * rx + vy * ry + vz * rz, 0.0) ** _SHININESS
        inten = _AMBIENT + diff + spec

        win = cover.reshape(-1) & (
            jnp.where(cover, depth, 2.0).reshape(-1)
            <= zbuf[jnp.clip(pix.reshape(-1), 0, npx - 1)])
        base = jnp.where(win, pix.reshape(-1), npx)
        for comp, cc in ((0, cr), (1, cg), (2, cb)):
            val = (inten * sl(cc)[:, None, None]).reshape(-1)
            img = img.at[base * 3 + comp].set(val, mode="drop")
        return img

    img = jax.lax.fori_loop(
        0, n_chunks, pass2, jnp.zeros((npx * 3,), f32))
    covered = zbuf < 2.0
    rgb = jnp.clip(img.reshape(npx, 3), 0.0, 1.0)
    rgb = jnp.where(covered[:, None], rgb, jnp.asarray(_BG, f32)[None, :])
    rgba = jnp.concatenate([rgb, jnp.ones((npx, 1), f32)], axis=-1)
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
