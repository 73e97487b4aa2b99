"""Table-driven Marching Cubes as a fused XLA array program.

TPU-native replacement for the reference's per-leaf recursive extraction
(``localMC``/``marchingCubesCell``, OctreeVoxel.cpp:633-879, driven by
``MarchingCubesRenderer::render``, Renderer.cpp:14-36) and the standalone
scalar-field entry (``marchingCubesVolume``, MarchingCubes.cpp:622-689).

Design: the reference's ``std::vector::push_back`` becomes prefix-sum stream
compaction (SURVEY.md §7 "hard parts" #1):

  phase 1  classify every cell -> 8-bit case, per-cell triangle count,
           exclusive-cumsum output offsets (dense, cheap, fully fused);
  phase 2  scatter (cell, tri) pairs into a bounded triangle buffer, then
           gather-compute each triangle's vertices from the case tables.

The octree plays no role in the dense pass — cells interior to uniform
leaves classify to case 0/255 (no triangles), so the output triangle
*multiset* equals the reference's union over leaf nodes; frustum culling is
applied as a cell mask (``cell_mask``), mirroring renderOctree's margin-50
AABB test (main.cpp:154-189) at cell granularity.

Float semantics: with the binary field (+-1, iso 0) every edge vertex is the
exact midpoint p1 + 0.5*(p2 - p1) and normals are normalize(cross(e1, e2)),
matching localMC bit-for-bit; the general path keeps vertexInterp's epsilon
branches (OctreeVoxel.cpp:633-640).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_octrees_tpu.core.grid import VoxelGrid
from ray_tracing_octrees_tpu.ops import mc_tables as t

_TRI_COUNTS = jnp.asarray(t.TRI_COUNTS)
_TRI_EDGES = jnp.asarray(t.TRI_EDGES)  # [256, 5, 3]
_EDGE_CORNERS = jnp.asarray(t.EDGE_CORNERS)  # [12, 2]
_CORNER_OFFSETS = jnp.asarray(t.CORNER_OFFSETS)  # [8, 3] (dx, dy, dz)


def _cell_cases(field_is_inside: jax.Array) -> jax.Array:
    """8-bit MC case per cell from an 'inside' mask over lattice points.

    field_is_inside: bool[Z, Y, X]; case bit i set iff corner i is inside
    (value < iso), the rule of marchingCubesCell (OctreeVoxel.cpp:648-651).
    Returns int32[Z-1, Y-1, X-1].
    """
    f = field_is_inside
    case = jnp.zeros(
        (f.shape[0] - 1, f.shape[1] - 1, f.shape[2] - 1), jnp.int32
    )
    for i in range(8):
        dx, dy, dz = (int(v) for v in t.CORNER_OFFSETS[i])
        bit = f[
            dz : dz + case.shape[0],
            dy : dy + case.shape[1],
            dx : dx + case.shape[2],
        ]
        case = case | (bit.astype(jnp.int32) << i)
    return case


def count_mc_triangles(grid: VoxelGrid) -> jax.Array:
    """Total triangle count without emitting geometry (for capacity sizing)."""
    case = _cell_cases(grid.occ > 0)
    return jnp.sum(_TRI_COUNTS[case])


def _interp_vertex(iso, p1, p2, v1, v2):
    """vertexInterp (OctreeVoxel.cpp:633-640) with its epsilon early-outs."""
    eps = jnp.float32(1e-5)
    mu = (iso - v1) / (v2 - v1)
    p = p1 + mu[..., None] * (p2 - p1)
    p = jnp.where((jnp.abs(v1 - v2) < eps)[..., None], p1, p)
    p = jnp.where((jnp.abs(iso - v2) < eps)[..., None], p2, p)
    p = jnp.where((jnp.abs(iso - v1) < eps)[..., None], p1, p)
    return p


@functools.partial(jax.jit, static_argnames=("max_triangles", "has_mask"))
def _mc_classify(field, iso, cell_mask, max_triangles: int, has_mask: bool):
    """Phase 1: per-cell cases, counts, and the (cell, t) slot scatters."""
    nzc, nyc, nxc = field.shape[0] - 1, field.shape[1] - 1, field.shape[2] - 1
    n_cells = nzc * nyc * nxc
    case = _cell_cases(field < iso)
    counts = _TRI_COUNTS[case]
    if has_mask:
        counts = jnp.where(cell_mask, counts, 0)
    counts_flat = counts.reshape(-1)
    offsets = jnp.cumsum(counts_flat) - counts_flat
    total = counts_flat.sum()
    lin = jnp.arange(n_cells, dtype=jnp.int32)
    slot_list = []
    cell_list = []
    t_list = []
    for ti in range(t.MAX_TRIS_PER_CELL):
        emit = counts_flat > ti
        slot_list.append(jnp.where(emit, offsets + ti, max_triangles))
        cell_list.append(lin)
        t_list.append(jnp.full((n_cells,), ti, jnp.int32))
    slots = jnp.concatenate(slot_list)
    src_cell = jnp.concatenate(cell_list)
    src_t = jnp.concatenate(t_list)
    return case.reshape(-1), slots, src_cell, src_t, total


@functools.partial(jax.jit, static_argnames=("capacity",))
def _scatter_set(slots, values, capacity: int):
    """Standalone bounded scatter (slots == capacity drop)."""
    return jnp.zeros((capacity,), values.dtype).at[slots].set(values, mode="drop")


@jax.jit
def _take(table, idx):
    return jnp.take(table, idx)


@functools.partial(jax.jit, static_argnames=("dims",))
def _mc_indices(case_f, tri_cell, tri_t, dims):
    """Phase 2: per-triangle lattice point indices from the case tables."""
    nzc, nyc, nxc = dims
    cell = tri_cell
    cz = cell // (nyc * nxc)
    rem = cell - cz * (nyc * nxc)
    cy = rem // nxc
    cx = rem - cy * nxc
    edges3 = _TRI_EDGES[case_f, tri_t]          # [T, 3] (small tables fuse fine)
    corners = _EDGE_CORNERS[edges3]             # [T, 3, 2]
    offs = _CORNER_OFFSETS[corners]             # [T, 3, 2, 3]
    px = cx[:, None, None] + offs[..., 0]
    py = cy[:, None, None] + offs[..., 1]
    pz = cz[:, None, None] + offs[..., 2]
    return px, py, pz


@functools.partial(jax.jit, static_argnames=("max_triangles",))
def _mc_vertices(px, py, pz, vals, origin, spacing, iso, total, max_triangles: int):
    """Phase 3: midpoint/interpolated vertices and flat normals."""
    pos = (
        origin[None, None, None, :]
        + jnp.stack([px, py, pz], axis=-1).astype(jnp.float32) * spacing
    )
    verts = _interp_vertex(
        iso, pos[:, :, 0, :], pos[:, :, 1, :], vals[:, :, 0], vals[:, :, 1]
    )
    e1 = verts[:, 1] - verts[:, 0]
    e2 = verts[:, 2] - verts[:, 0]
    n = jnp.cross(e1, e2)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-30)
    i = jnp.arange(max_triangles, dtype=jnp.int32)
    valid = i < jnp.minimum(total, max_triangles)
    verts = jnp.where(valid[:, None, None], verts, 0.0)
    n = jnp.where(valid[:, None], n, 0.0)
    return verts, n, jnp.minimum(total, max_triangles)


def _mc_impl(
    field: jax.Array,      # f32[Z, Y, X] lattice values
    origin: jax.Array,     # f32[3] world position of lattice point (0,0,0)
    spacing: jax.Array,    # f32[] lattice step
    iso: jax.Array,        # f32[]
    cell_mask: Optional[jax.Array],  # bool[Z-1, Y-1, X-1] or None
    max_triangles: int,
):
    """Table-driven MC in three programs.

    The two large gathers (per-triangle case codes and the 6 field values)
    run as isolated minimal programs: XLA's gather emitter is orders of
    magnitude faster standalone than fused into a big computation.
    """
    nzc, nyc, nxc = field.shape[0] - 1, field.shape[1] - 1, field.shape[2] - 1
    mask = cell_mask if cell_mask is not None else jnp.zeros((), bool)
    case_flat, slots, src_cell, src_t, total = _mc_classify(
        field, iso, mask, max_triangles, cell_mask is not None
    )
    tri_cell = _scatter_set(slots, src_cell, max_triangles)
    tri_t = _scatter_set(slots, src_t, max_triangles)
    case_f = _take(case_flat, tri_cell)
    px, py, pz = _mc_indices(case_f, tri_cell, tri_t, (nzc, nyc, nxc))
    dz, dy, dx = field.shape
    lin = (pz * dy + py) * dx + px
    vals = _take(field.reshape(-1), lin)
    return _mc_vertices(
        px, py, pz, vals, origin, spacing, iso, total, max_triangles
    )


def marching_cubes_grid(
    grid: VoxelGrid,
    max_triangles: int,
    cell_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """MC over the binary grid with localMC's conventions.

    FILLED -> -1, EMPTY -> +1, iso = 0 (OctreeVoxel.cpp:787-792). Lattice
    point (x,y,z) sits at world origin + (x,y,z)*voxelSize, i.e. the voxel's
    min corner, exactly localMC's corner positions.

    Returns (verts f32[max_triangles, 3, 3], normals f32[max_triangles, 3],
    count int32). Slots >= count are zeroed. If more than ``max_triangles``
    triangles exist, the output is truncated (count == max_triangles).
    """
    field = jnp.where(grid.occ > 0, jnp.float32(-1.0), jnp.float32(1.0))
    return _mc_impl(
        field,
        grid.origin,
        grid.voxel_size,
        jnp.float32(0.0),
        cell_mask,
        max_triangles,
    )


def marching_cubes_volume(
    field_zyx: jax.Array,
    origin,
    spacing,
    iso: float,
    max_triangles: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Whole-volume MC over an arbitrary scalar field with true interpolation.

    The library-style entry mirroring ``marchingCubesVolume``
    (MarchingCubes.h:19-23, MarchingCubes.cpp:622-689): lattice values
    field[z, y, x] at origin + (x, y, z)*spacing, corners inside when
    value < iso, edge vertices linearly interpolated to the iso level.
    """
    return _mc_impl(
        jnp.asarray(field_zyx, jnp.float32),
        jnp.asarray(origin, jnp.float32),
        jnp.asarray(spacing, jnp.float32),
        jnp.float32(iso),
        None,
        max_triangles,
    )
