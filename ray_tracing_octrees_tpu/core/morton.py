"""Morton (Z-order) encoding for 3D integer coordinates.

Used for spatially-sorted linear data structures (LBVH over triangles,
leaf ordering). Supports 10 bits per axis packed into 30-bit codes (enough
for the reference's 1024-per-axis clamp, BuildingLoader.cpp:200-209) and a
21-bit variant in int64 for large scenes.

The reference's node-map key ``(x<<20)|(y<<10)|z`` (OctreeVoxel.cpp:552-554)
is *not* Morton — that exact packing lives in ``core.octree.pack_key`` for
parity; Morton codes here are for spatial sorting only.
"""

from __future__ import annotations

import jax.numpy as jnp


def _part1by2_10(v):
    """Spread the low 10 bits of v so there are 2 zero bits between each."""
    v = jnp.asarray(v, jnp.uint32) & 0x3FF
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def _compact1by2_10(v):
    v = jnp.asarray(v, jnp.uint32) & 0x09249249
    v = (v ^ (v >> 2)) & jnp.uint32(0x030C30C3)
    v = (v ^ (v >> 4)) & jnp.uint32(0x0300F00F)
    v = (v ^ (v >> 8)) & jnp.uint32(0x030000FF)
    v = (v ^ (v >> 16)) & jnp.uint32(0x000003FF)
    return v


def morton_encode_10(x, y, z):
    """30-bit Morton code from 10-bit x, y, z (x in the lowest interleave slot)."""
    return (
        _part1by2_10(x)
        | (_part1by2_10(y) << 1)
        | (_part1by2_10(z) << 2)
    )


def morton_decode_10(code):
    code = jnp.asarray(code, jnp.uint32)
    return (
        _compact1by2_10(code),
        _compact1by2_10(code >> 1),
        _compact1by2_10(code >> 2),
    )


def _part1by2_21(v):
    v = jnp.asarray(v, jnp.uint64) & jnp.uint64(0x1FFFFF)
    v = (v | (v << 32)) & jnp.uint64(0x1F00000000FFFF)
    v = (v | (v << 16)) & jnp.uint64(0x1F0000FF0000FF)
    v = (v | (v << 8)) & jnp.uint64(0x100F00F00F00F00F)
    v = (v | (v << 4)) & jnp.uint64(0x10C30C30C30C30C3)
    v = (v | (v << 2)) & jnp.uint64(0x1249249249249249)
    return v


def morton_encode_21(x, y, z):
    """63-bit Morton code from 21-bit x, y, z (requires x64 enabled)."""
    return (
        _part1by2_21(x)
        | (_part1by2_21(y) << jnp.uint64(1))
        | (_part1by2_21(z) << jnp.uint64(2))
    )


def quantize_to_morton_grid(points, lo, hi, bits: int = 10):
    """Quantize float positions [N,3] into the [0, 2^bits) integer lattice."""
    n = (1 << bits) - 1
    t = (points - lo) / jnp.maximum(hi - lo, 1e-30)
    q = jnp.clip(t * (n + 1), 0, n).astype(jnp.uint32)
    return q[..., 0], q[..., 1], q[..., 2]
