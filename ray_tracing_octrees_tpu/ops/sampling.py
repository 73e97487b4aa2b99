"""3D texture sampling — the array replacement for the GL sampler stack.

The reference's volume renderer reads eight 3D textures with trilinear
filtering, CLAMP_TO_EDGE wrap, and mip pyramids (VolumeRaycastRenderer.h:
92-99). These helpers reproduce GL sampling semantics over plain arrays:
normalized coordinate c maps to texel space c*N - 0.5, 8-corner lerp,
indices clamped to the edge.

Layout convention: volumes are [Z, Y, X] (+ optional channel dim); uvw is
(u, v, w) = (x, y, z) normalized to [0, 1], matching GLSL's sampler3D.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp


def sample_nearest(vol: jax.Array, uvw: jax.Array) -> jax.Array:
    """Nearest-texel fetch with clamp-to-edge. vol [Z,Y,X(,C)], uvw [...,3]."""
    dz, dy, dx = vol.shape[:3]
    dims = jnp.array([dx, dy, dz], jnp.float32)
    t = uvw * dims  # texel-space (floor = texel index)
    ix = jnp.clip(t[..., 0].astype(jnp.int32), 0, dx - 1)
    iy = jnp.clip(t[..., 1].astype(jnp.int32), 0, dy - 1)
    iz = jnp.clip(t[..., 2].astype(jnp.int32), 0, dz - 1)
    return vol[iz, iy, ix]


def sample_trilinear(vol: jax.Array, uvw: jax.Array) -> jax.Array:
    """GL_LINEAR + CLAMP_TO_EDGE trilinear sample.

    vol: [Z, Y, X] or [Z, Y, X, C]; uvw: [..., 3] normalized. Returns
    [...] or [..., C] float32.
    """
    dz, dy, dx = vol.shape[:3]
    dims = jnp.array([dx, dy, dz], jnp.float32)
    t = uvw * dims - 0.5
    i0 = jnp.floor(t).astype(jnp.int32)
    f = t - i0.astype(jnp.float32)

    def cl(i, n):
        return jnp.clip(i, 0, n - 1)

    x0, y0, z0 = cl(i0[..., 0], dx), cl(i0[..., 1], dy), cl(i0[..., 2], dz)
    x1, y1, z1 = cl(i0[..., 0] + 1, dx), cl(i0[..., 1] + 1, dy), cl(i0[..., 2] + 1, dz)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    if vol.ndim == 4:
        fx, fy, fz = fx[..., None], fy[..., None], fz[..., None]

    c000 = vol[z0, y0, x0].astype(jnp.float32)
    c100 = vol[z0, y0, x1].astype(jnp.float32)
    c010 = vol[z0, y1, x0].astype(jnp.float32)
    c110 = vol[z0, y1, x1].astype(jnp.float32)
    c001 = vol[z1, y0, x0].astype(jnp.float32)
    c101 = vol[z1, y0, x1].astype(jnp.float32)
    c011 = vol[z1, y1, x0].astype(jnp.float32)
    c111 = vol[z1, y1, x1].astype(jnp.float32)

    c00 = c000 * (1 - fx) + c100 * fx
    c10 = c010 * (1 - fx) + c110 * fx
    c01 = c001 * (1 - fx) + c101 * fx
    c11 = c011 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def build_mip_chain(vol: jax.Array, max_levels: int | None = None) -> List[jax.Array]:
    """GL-style box-filtered mip pyramid of a [Z, Y, X] float volume.

    Levels halve (floor) each dimension down to 1; the chain length matches
    glGenerateMipmap on the same extents.
    """
    levels = [jnp.asarray(vol, jnp.float32)]
    while max(levels[-1].shape) > 1:
        if max_levels is not None and len(levels) >= max_levels:
            break
        v = levels[-1]
        nz, ny, nx = (max(1, v.shape[0] // 2), max(1, v.shape[1] // 2), max(1, v.shape[2] // 2))
        v = v[: nz * 2 if v.shape[0] > 1 else 1,
              : ny * 2 if v.shape[1] > 1 else 1,
              : nx * 2 if v.shape[2] > 1 else 1]
        sz = 2 if v.shape[0] > 1 else 1
        sy = 2 if v.shape[1] > 1 else 1
        sx = 2 if v.shape[2] > 1 else 1
        v = v.reshape(nz, sz, ny, sy, nx, sx).mean(axis=(1, 3, 5))
        levels.append(v)
    return levels


def sample_lod(mips: List[jax.Array], uvw: jax.Array, lod) -> jax.Array:
    """textureLod with trilinear-in-level and lerp between mip levels.

    ``lod`` may be a traced array (per-sample); levels outside the chain
    clamp. Cost: two trilinear samples per lookup.
    """
    n = len(mips)
    lod = jnp.clip(jnp.asarray(lod, jnp.float32), 0.0, n - 1)
    l0 = jnp.floor(lod).astype(jnp.int32)
    frac = lod - l0.astype(jnp.float32)
    # static unroll over levels; masked accumulate (level count is small)
    out0 = jnp.zeros(uvw.shape[:-1], jnp.float32)
    out1 = jnp.zeros(uvw.shape[:-1], jnp.float32)
    for k in range(n):
        s = sample_trilinear(mips[k], uvw)
        out0 = jnp.where(l0 == k, s, out0)
        out1 = jnp.where(jnp.minimum(l0 + 1, n - 1) == k, s, out1)
    return out0 * (1 - frac) + out1 * frac


def sample_lod_nearest_level(mips: List[jax.Array], uvw: jax.Array, lod) -> jax.Array:
    """textureLod with the nearest mip level (half the gathers of sample_lod)."""
    n = len(mips)
    li = jnp.clip(jnp.round(jnp.asarray(lod, jnp.float32)), 0, n - 1).astype(jnp.int32)
    out = jnp.zeros(uvw.shape[:-1], jnp.float32)
    for k in range(n):
        s = sample_trilinear(mips[k], uvw)
        out = jnp.where(li == k, s, out)
    return out
