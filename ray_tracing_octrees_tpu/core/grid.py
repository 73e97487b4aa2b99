"""Dense binary voxel grid — the scene's core array.

TPU-native replacement for the reference ``VoxelGrid`` struct
(453-skeleton/OctreeVoxel.h:28-42): a dense occupancy volume plus world-space
placement. The reference stores a flat x-major ``std::vector<VoxelState>``
with ``index(x,y,z) = x + y*dimX + z*dimX*dimY``; we keep the identical
memory order by storing a C-contiguous array of shape ``(dimZ, dimY, dimX)``
indexed ``occ[z, y, x]`` — a raw reshape of the reference's buffer (and of
``sceneCache.bin``). The largest axis of the Calgary scene (X=425) therefore
lands on the TPU lane dimension.

Voxel states: 1 = FILLED, 0 = EMPTY (OctreeVoxel.h:10-13).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _repack_rows(x, rows: int, wide):
    """Jitted repack to a tile-aligned (rows, 128) 32-bit buffer."""
    f = x.astype(wide).reshape(-1)
    pad = rows * 128 - f.shape[0]
    if pad:
        f = jnp.concatenate([f, jnp.zeros((pad,), wide)])
    return f.reshape(rows, 128)


_repack_rows_jit = jax.jit(_repack_rows, static_argnames=("rows", "wide"))

# Below this many wide-bytes a direct fetch is cheap even on the slow
# path, and skipping the repack avoids a per-shape program compile.
_FETCH_REPACK_MIN_BYTES = 1 << 18


def host_fetch(x) -> np.ndarray:
    """Device -> host fetch that sidesteps the slow unaligned-shape untiling.

    Fetches of arrays whose trailing dims are not tile aligned run at
    SECONDS PER MEGABYTE through the tunneled TPU runtime: measured 102 s
    for the 3 MB u8 Calgary occupancy at (29, 243, 425) in round 2, and in
    round 3 even its int32 upcast fetched at 0.7 MB/s while an aligned
    (N, 128) int32 buffer moved at ~25 MB/s. So fetch EVERYTHING through a
    jitted repack: upcast to 32-bit (sub-32-bit untiling has its own slow
    path), flatten, pad, and ship as (ceil(n/128), 128) — the repack is
    device-side and free next to the transfer. No-op for host arrays;
    small arrays fetch directly (repack would cost a per-shape compile).
    """
    if isinstance(x, np.ndarray):
        return x
    xj = jnp.asarray(x)
    dt = xj.dtype
    if dt in (jnp.uint8, jnp.int8, jnp.uint16, jnp.int16, jnp.bool_,
              jnp.int32, jnp.uint32):
        wide = jnp.int32
    elif dt in (jnp.bfloat16, jnp.float16, jnp.float32):
        wide = jnp.float32
    else:
        return np.asarray(xj)
    n = int(xj.size)
    if n * 4 < _FETCH_REPACK_MIN_BYTES:
        if wide == xj.dtype:
            return np.asarray(xj)
        return np.asarray(xj.astype(wide)).astype(dt)
    rows = -(-n // 128)
    flat = np.asarray(_repack_rows_jit(xj, rows, wide)).reshape(-1)[:n]
    return flat.astype(dt).reshape(xj.shape)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VoxelGrid:
    """Binary occupancy grid with world placement.

    Attributes:
      occ:        uint8[dimZ, dimY, dimX]; 1 = FILLED, 0 = EMPTY.
      origin:     float32[3] = (minX, minY, minZ) world coordinate of the
                  (0,0,0) voxel's min corner.
      voxel_size: float32[] uniform voxel edge length in world units.
    """

    occ: jax.Array
    origin: jax.Array
    voxel_size: jax.Array

    # ---- static shape helpers -------------------------------------------------
    @property
    def dim_x(self) -> int:
        return self.occ.shape[2]

    @property
    def dim_y(self) -> int:
        return self.occ.shape[1]

    @property
    def dim_z(self) -> int:
        return self.occ.shape[0]

    @property
    def dims_xyz(self) -> Tuple[int, int, int]:
        return (self.occ.shape[2], self.occ.shape[1], self.occ.shape[0])

    @property
    def num_voxels(self) -> int:
        return int(np.prod(self.occ.shape))

    # ---- value access ---------------------------------------------------------
    def at_xyz(self, x, y, z):
        """occupancy at integer voxel coords (no bounds checking)."""
        return self.occ[z, y, x]

    def sample_safe(self, x, y, z):
        """Occupancy with out-of-range treated as EMPTY.

        Matches ``getVoxelSafe`` (OctreeVoxel.cpp:694-702): out-of-range
        coordinates read as EMPTY. Vectorized over any index shape.
        """
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        z = jnp.asarray(z)
        inb = (
            (x >= 0) & (y >= 0) & (z >= 0)
            & (x < self.dim_x) & (y < self.dim_y) & (z < self.dim_z)
        )
        xc = jnp.clip(x, 0, self.dim_x - 1)
        yc = jnp.clip(y, 0, self.dim_y - 1)
        zc = jnp.clip(z, 0, self.dim_z - 1)
        return jnp.where(inb, self.occ[zc, yc, xc], jnp.uint8(0))

    def scalar_field_safe(self, x, y, z):
        """-1.0 where FILLED, +1.0 where EMPTY or out of range.

        The sign convention of ``localMC``'s getScalar (OctreeVoxel.cpp:787-792)
        and DC's calculateIntersection (AdaptiveDualContouringRenderer.cpp:1253).
        """
        return jnp.where(self.sample_safe(x, y, z) > 0, jnp.float32(-1.0), jnp.float32(1.0))

    # ---- world-space geometry ---------------------------------------------------
    def grid_to_world(self, x, y, z):
        """World position of the voxel-corner lattice point (x, y, z).

        Matches ``gridToWorld`` (AdaptiveDualContouringRenderer.cpp:1358-1364):
        origin + index * voxelSize (corner, not center).
        """
        v = self.voxel_size
        return jnp.stack(
            [
                self.origin[0] + jnp.asarray(x, jnp.float32) * v,
                self.origin[1] + jnp.asarray(y, jnp.float32) * v,
                self.origin[2] + jnp.asarray(z, jnp.float32) * v,
            ],
            axis=-1,
        )

    def voxel_center(self, x, y, z):
        v = self.voxel_size
        return jnp.stack(
            [
                self.origin[0] + (jnp.asarray(x, jnp.float32) + 0.5) * v,
                self.origin[1] + (jnp.asarray(y, jnp.float32) + 0.5) * v,
                self.origin[2] + (jnp.asarray(z, jnp.float32) + 0.5) * v,
            ],
            axis=-1,
        )

    @property
    def world_min(self) -> jax.Array:
        return self.origin

    @property
    def world_max(self) -> jax.Array:
        dims = jnp.array([self.dim_x, self.dim_y, self.dim_z], jnp.float32)
        return self.origin + dims * self.voxel_size

    # ---- constructors ----------------------------------------------------------
    @staticmethod
    def create(occ, origin=(0.0, 0.0, 0.0), voxel_size=1.0) -> "VoxelGrid":
        occ = jnp.asarray(occ, jnp.uint8)
        if occ.ndim != 3:
            raise ValueError(f"occ must be 3D (Z,Y,X), got {occ.shape}")
        return VoxelGrid(
            occ=occ,
            origin=jnp.asarray(origin, jnp.float32),
            voxel_size=jnp.asarray(voxel_size, jnp.float32),
        )


def generate_test_volume(dim_x: int, dim_y: int, dim_z: int) -> jax.Array:
    """Multi-shell sphere density: +1 in the shell, -1 elsewhere.

    Bit-matches ``generateTestVolume`` (main.cpp:337-372): center at
    0.5*(dim-1), shell between rInner = 0.2*minDim and rOuter = 0.4*minDim;
    density +1 for rInner <= dist <= rOuter, else -1. Returns
    float32[dimZ, dimY, dimX].
    """
    cx = 0.5 * (dim_x - 1)
    cy = 0.5 * (dim_y - 1)
    cz = 0.5 * (dim_z - 1)
    min_dim = float(min(dim_x, dim_y, dim_z))
    r_outer = 0.4 * min_dim
    r_inner = 0.2 * min_dim
    x = jnp.arange(dim_x, dtype=jnp.float32) - cx
    y = jnp.arange(dim_y, dtype=jnp.float32) - cy
    z = jnp.arange(dim_z, dtype=jnp.float32) - cz
    dist = jnp.sqrt(
        x[None, None, :] ** 2 + y[None, :, None] ** 2 + z[:, None, None] ** 2
    )
    outside = (dist < r_inner) | (dist > r_outer)
    return jnp.where(outside, jnp.float32(-1.0), jnp.float32(1.0))


def make_sphere_grid(dim: int = 256) -> VoxelGrid:
    """The reference's sphere scene setup (main.cpp:1050-1071).

    origin (-0.5,-0.5,-0.5), voxelSize 1/dim, FILLED where density > 0.
    """
    vol = generate_test_volume(dim, dim, dim)
    occ = (vol > 0.0).astype(jnp.uint8)
    return VoxelGrid.create(occ, origin=(-0.5, -0.5, -0.5), voxel_size=1.0 / dim)


def filled_world_bounds(grid: VoxelGrid):
    """(min, max, any_filled) of the world AABB of FILLED voxel *centers*.

    Matches the scan in ``recenterFilledVoxels`` (main.cpp:376-422) and the
    building-center scan (main.cpp:1080-1105), which both use voxel centers.
    Host-side NumPy: this is scene-setup code over a few MB — running it
    eagerly on device costs dozens of remote op compiles plus the slow
    unaligned-u8 fetch (see :func:`host_fetch`).
    """
    occ = host_fetch(grid.occ) > 0
    origin = np.asarray(host_fetch(grid.origin), np.float32)
    vs = float(host_fetch(grid.voxel_size))
    any_filled = bool(occ.any())

    def axis_bounds(mask_1d, origin_c):
        idx = np.nonzero(mask_1d)[0]
        lo = idx[0] if idx.size else 0
        hi = idx[-1] if idx.size else -1
        return (origin_c + (lo + 0.5) * vs, origin_c + (hi + 0.5) * vs)

    lo_x, hi_x = axis_bounds(occ.any(axis=(0, 1)), origin[0])
    lo_y, hi_y = axis_bounds(occ.any(axis=(0, 2)), origin[1])
    lo_z, hi_z = axis_bounds(occ.any(axis=(1, 2)), origin[2])
    lo = np.array([lo_x, lo_y, lo_z], np.float32)
    hi = np.array([hi_x, hi_y, hi_z], np.float32)
    return lo, hi, any_filled


def recenter_filled_voxels(grid: VoxelGrid) -> VoxelGrid:
    """Shift the origin so the filled-region center sits at the world origin.

    Matches ``recenterFilledVoxels`` (main.cpp:376-422): computes the AABB of
    filled voxel centers and subtracts its center from the grid origin. A grid
    with no filled voxels is returned unchanged.
    """
    lo, hi, any_filled = filled_world_bounds(grid)
    if not any_filled:
        return grid
    center = 0.5 * (lo + hi)
    new_origin = np.asarray(host_fetch(grid.origin), np.float32) - center
    return dataclasses.replace(grid, origin=jnp.asarray(new_origin))


def building_center(grid: VoxelGrid) -> np.ndarray:
    """Center of the filled AABB (main.cpp:1080-1105); zeros when empty."""
    lo, hi, any_filled = filled_world_bounds(grid)
    return 0.5 * (lo + hi) if any_filled else np.zeros(3, np.float32)
