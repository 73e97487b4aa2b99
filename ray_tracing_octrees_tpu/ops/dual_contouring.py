"""Dual contouring — hermite data, per-cell dual vertices, triangle topology.

TPU-native rebuild of ``AdaptiveDualContouringRenderer`` with two paths:

1. ``dual_contour_uniform`` — the single-pass per-voxel design the reference
   *intended* on the GPU (render(): executeComputeShaderSinglePass +
   buildTrianglesCPU, AdaptiveDualContouringRenderer.cpp:281-525). The
   shipped GPU path is broken (missing shader file + mismatched buffer
   layout, SURVEY.md §2.3) — this implements the fixed design: one dual
   vertex per voxel cell, then two triangles per sign-change face using the
   four cell vertices around it (buildTrianglesCPU's +X/+Y/+Z quad rule,
   AdaptiveDualContouringRenderer.cpp:436-487).

2. ``dual_contour_adaptive`` — the octree-leaf LOD path (createTriangles,
   AdaptiveDualContouringRenderer.cpp:528-803): per surface-leaf dual
   vertices, min-corner-edge quads over up to four edge-adjacent leaves with
   the <= 2x size-ratio constraint, inside/outside normal flips and the
   1e-6 degenerate-area filter, plus the boundary face-fan fallback
   (createFaceTriangles, :805-1088).

   Deliberate divergence (defect not replicated): the reference computes an
   adjacent leaf's dual vertex with the *querying* cell's size and caches it
   under the neighbor's key, so results depend on traversal order
   (AdaptiveDualContouringRenderer.cpp:699-723). Here every leaf's vertex is
   always computed from its own extent — deterministic and order-free.

Hermite intersections follow ``calculateIntersection``
(AdaptiveDualContouringRenderer.cpp:1236-1357): edge midpoints (t = 0.5 for
the +-1 field), central-difference normals perpendicular to the edge axis,
oriented filled -> empty.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_octrees_tpu.config import DCConfig, QEFConfig
from ray_tracing_octrees_tpu.core.grid import VoxelGrid
from ray_tracing_octrees_tpu.ops.compaction import compact_indices
from ray_tracing_octrees_tpu.ops.qef import generate_dual_vertex

_DC = DCConfig()

_AXES = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.int32)


def edge_hermite(grid: VoxelGrid, x, y, z, axis: int):
    """Hermite point of the lattice edge (x,y,z) -> +axis.

    Vectorized over index arrays. Returns (crossing bool, pos f32[...,3],
    normal f32[...,3]); ``crossing`` is False when either endpoint is out
    of bounds (gatherHermiteData skips those).
    """
    ax = _AXES[axis]
    x2, y2, z2 = x + ax[0], y + ax[1], z + ax[2]
    dims = grid.dims_xyz
    inb1 = (x >= 0) & (y >= 0) & (z >= 0) & (x < dims[0]) & (y < dims[1]) & (z < dims[2])
    inb2 = (x2 < dims[0]) & (y2 < dims[1]) & (z2 < dims[2])
    f1 = grid.sample_safe(x, y, z) > 0
    f2 = grid.sample_safe(x2, y2, z2) > 0
    crossing = inb1 & inb2 & (f1 != f2)

    # midpoint (t = v1/(v1-v2) = 0.5 exactly for the +-1 field)
    p1 = grid.grid_to_world(x, y, z)
    p2 = grid.grid_to_world(x2, y2, z2)
    pos = p1 + 0.5 * (p2 - p1)

    # central-difference normal perpendicular to the edge at point 1
    s = grid.scalar_field_safe
    if axis == 0:
        g1 = s(x, y + 1, z) - s(x, y - 1, z)
        g2 = s(x, y, z + 1) - s(x, y, z - 1)
        n = jnp.stack([jnp.zeros_like(g1), g1, g2], -1)
    elif axis == 1:
        g1 = s(x + 1, y, z) - s(x - 1, y, z)
        g2 = s(x, y, z + 1) - s(x, y, z - 1)
        n = jnp.stack([g1, jnp.zeros_like(g1), g2], -1)
    else:
        g1 = s(x + 1, y, z) - s(x - 1, y, z)
        g2 = s(x, y + 1, z) - s(x, y - 1, z)
        n = jnp.stack([g1, g2, jnp.zeros_like(g1)], -1)

    len2 = (n * n).sum(-1)
    edge_dir = jnp.asarray(ax, jnp.float32)
    n_unit = n / jnp.maximum(jnp.sqrt(len2)[..., None], 1e-30)
    n = jnp.where((len2 < 1e-10)[..., None], edge_dir, n_unit)

    # orientation: flip when (n . edge > 0) == isFilled2
    # (AdaptiveDualContouringRenderer.cpp:1338-1346)
    dot = (n * edge_dir).sum(-1)
    points_with_edge = dot > 0
    flip = points_with_edge == f2
    n = jnp.where(flip[..., None], -n, n)
    return crossing, pos, n


def gather_cell_hermite(grid: VoxelGrid, cx, cy, cz, size: int, stride: int):
    """gatherHermiteData for cells of one static size/stride.

    cx/cy/cz: int32[C] cell corners. Scans lattice offsets 0, stride, ...
    <= size in each axis (points beyond dim-1 are masked — the reference
    clamps maxX to dim-1) and the 3 forward edges per point
    (AdaptiveDualContouringRenderer.cpp:1090-1144).

    Returns (points f32[C, K, 3], normals f32[C, K, 3], mask bool[C, K])
    with K = 3 * n_offsets^3.
    """
    offs = np.arange(0, size + 1, stride, dtype=np.int32)
    dims = grid.dims_xyz

    # Leaves are UNIFORM by construction (buildOctreeRec only stops at
    # uniform regions or size 1), so an edge whose BOTH voxels lie inside
    # the cell ([c, c+size)) can never cross. A crossing needs the far
    # voxel to exit the cell along the edge axis (off_a >= size-1 of the
    # strided points) or the point itself to sit outside the cell on a
    # perpendicular far face (off_b == size). Scanning just that shell is
    # exactly equivalent to the full cube scan on uniform cells and
    # shrinks the point set from O((size/stride)^3) to O((size/stride)^2)
    # — the full cube materialized 6.4M-column arrays for a single
    # size-256 leaf.
    ozg, oyg, oxg = np.meshgrid(offs, offs, offs, indexing="ij")
    oxg, oyg, ozg = oxg.reshape(-1), oyg.reshape(-1), ozg.reshape(-1)
    oall = (oxg, oyg, ozg)

    pts, nrms, msks = [], [], []
    for axis in range(3):
        oa = oall[axis]
        keep = oa >= size - 1
        for b in range(3):
            if b != axis:
                keep = keep | (oall[b] == size)
        sx, sy, sz = oxg[keep], oyg[keep], ozg[keep]
        px = cx[:, None] + sx[None, :]
        py = cy[:, None] + sy[None, :]
        pz = cz[:, None] + sz[None, :]
        in_scan = (
            (px <= dims[0] - 1) & (py <= dims[1] - 1) & (pz <= dims[2] - 1)
        )
        crossing, pos, n = edge_hermite(grid, px, py, pz, axis)
        msks.append(crossing & in_scan)
        pts.append(pos)
        nrms.append(n)
    points = jnp.concatenate(pts, axis=1)
    normals = jnp.concatenate(nrms, axis=1)
    mask = jnp.concatenate(msks, axis=1)
    return points, normals, mask


def _quad_triangles(v00, v01, v11, v10, invert, eps: float):
    """addQuad (AdaptiveDualContouringRenderer.cpp:393-433): two triangles
    (v00, v01, v11) and (v00, v11, v10) with area > eps filters and flat
    normals flipped by ``invert``. Returns (verts[...,2,3,3],
    normals[...,2,3], keep[...,2])."""

    def tri(a, b, c):
        e1 = b - a
        e2 = c - a
        cr = jnp.cross(e1, e2)
        area = 0.5 * jnp.linalg.norm(cr, axis=-1)
        n = cr / jnp.maximum(jnp.linalg.norm(cr, axis=-1, keepdims=True), 1e-30)
        n = jnp.where(invert[..., None], -n, n)
        return jnp.stack([a, b, c], axis=-2), n, area > eps

    va, na, ka = tri(v00, v01, v11)
    vb, nb, kb = tri(v00, v11, v10)
    verts = jnp.stack([va, vb], axis=-3)
    normals = jnp.stack([na, nb], axis=-2)
    keep = jnp.stack([ka, kb], axis=-1)
    return verts, normals, keep


@functools.partial(
    jax.jit, static_argnames=("max_cells", "max_triangles")
)
def dual_contour_uniform(
    grid: VoxelGrid,
    max_cells: int,
    max_triangles: int,
    qef_cfg: QEFConfig = QEFConfig(),
):
    """Single-pass per-voxel DC (the fixed GPU design).

    Returns (verts f32[max_triangles, 3, 3], normals f32[max_triangles, 3],
    count int32).
    """
    dx, dy, dz = grid.dims_xyz
    occ = grid.occ > 0

    # --- per-voxel dual vertices -------------------------------------------------
    # A cell needs a computed vertex iff its size-1 hermite scan is nonempty;
    # everything else defaults to the cell center (generateDualVertex's
    # empty-set early-out). Cell activity from shifted edge-crossing masks:
    ex = occ[:, :, :-1] != occ[:, :, 1:]  # edge (x,y,z)->(x+1,y,z): [Z,Y,X-1]
    ey = occ[:, :-1, :] != occ[:, 1:, :]
    ez = occ[:-1, :, :] != occ[1:, :, :]

    def cell_any(edge_mask, axis):
        """Does cell (x,y,z) scan an active edge? Scan points are the cell's
        8 corners (clamped); an axis-a edge at point p is scanned by cells
        with corner offsets 0/1 in every axis."""
        pad = jnp.zeros_like(edge_mask, shape=(dz + 1, dy + 1, dx + 1))
        m = pad.at[: edge_mask.shape[0], : edge_mask.shape[1], : edge_mask.shape[2]].set(
            edge_mask
        )
        # cell c scans points c + {0,1}^3 -> OR over the 8 shifts
        acc = jnp.zeros((dz, dy, dx), bool)
        for ddz in (0, 1):
            for ddy in (0, 1):
                for ddx in (0, 1):
                    acc = acc | m[ddz : ddz + dz, ddy : ddy + dy, ddx : ddx + dx]
        return acc

    active = cell_any(ex, 0) | cell_any(ey, 1) | cell_any(ez, 2)
    cell_idx, n_active = compact_indices(active, max_cells)
    acz = cell_idx // (dy * dx)
    rem = cell_idx - acz * (dy * dx)
    acy = rem // dx
    acx = rem - acy * dx

    pts, nrms, msk = gather_cell_hermite(grid, acx, acy, acz, size=1, stride=1)
    valid_cell = jnp.arange(max_cells) < n_active
    msk = msk & valid_cell[:, None]

    centers = grid.voxel_center(acx, acy, acz)
    cell_size = jnp.broadcast_to(grid.voxel_size, centers.shape[:1])
    dual = generate_dual_vertex(pts, nrms, msk, centers, cell_size, qef_cfg)

    # dense vertex field: default = voxel center
    xs = jnp.arange(dx, dtype=jnp.int32)
    ys = jnp.arange(dy, dtype=jnp.int32)
    zs = jnp.arange(dz, dtype=jnp.int32)
    zz, yy, xx = jnp.meshgrid(zs, ys, xs, indexing="ij")
    vert_field = grid.voxel_center(xx, yy, zz)  # [Z, Y, X, 3]
    flat_field = vert_field.reshape(-1, 3)
    slots = jnp.where(valid_cell, cell_idx, flat_field.shape[0])
    flat_field = flat_field.at[slots].set(dual, mode="drop")
    vert_field = flat_field.reshape(dz, dy, dx, 3)

    # --- face quads ---------------------------------------------------------------
    # buildTrianglesCPU loops cells in [0, dim-1)^3 checking +X/+Y/+Z.
    fz_, fy_, fx_ = dz - 1, dy - 1, dx - 1
    inner = (slice(0, fz_), slice(0, fy_), slice(0, fx_))
    c_fill = occ[inner]
    face_x = c_fill != occ[:fz_, :fy_, 1 : fx_ + 1]
    face_y = c_fill != occ[:fz_, 1 : fy_ + 1, :fx_]
    face_z = occ[1 : fz_ + 1, :fy_, :fx_] != c_fill

    n_cells_f = fz_ * fy_ * fx_
    faces = jnp.stack(
        [face_x.reshape(-1), face_y.reshape(-1), face_z.reshape(-1)], axis=1
    ).reshape(-1)  # [n_cells_f * 3] order: cell-major, then +X, +Y, +Z
    invert_all = jnp.stack([c_fill.reshape(-1)] * 3, axis=1).reshape(-1)

    max_faces = max_triangles  # each face emits <= 2 tris; capacity shared
    fidx, n_faces = compact_indices(faces, max_faces)
    f_cell = fidx // 3
    f_dir = fidx - f_cell * 3
    cz_ = f_cell // (fy_ * fx_)
    remf = f_cell - cz_ * (fy_ * fx_)
    cy_ = remf // fx_
    cx_ = remf - cy_ * fx_
    f_valid = jnp.arange(max_faces) < n_faces

    def vert_at(x, y, z):
        return vert_field[z, y, x]

    # quad corner pattern per direction (buildTrianglesCPU:441-482):
    #  +X: V00=(x,y,z)   V01=(x,y+1,z) V10=(x+1,y,z) V11=(x+1,y+1,z)
    #  +Y: V00=(x,y,z)   V01=(x+1,y,z) V10=(x,y+1,z) V11=(x+1,y+1,z)
    #  +Z: V00=(x,y,z)   V01=(x,y+1,z) V10=(x,y,z+1) V11=(x,y+1,z+1)
    d01 = jnp.asarray(np.array([[0, 1, 0], [1, 0, 0], [0, 1, 0]]), jnp.int32)[f_dir]
    d10 = jnp.asarray(np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]]), jnp.int32)[f_dir]
    v00 = vert_at(cx_, cy_, cz_)
    v01 = vert_at(cx_ + d01[:, 0], cy_ + d01[:, 1], cz_ + d01[:, 2])
    v10 = vert_at(cx_ + d10[:, 0], cy_ + d10[:, 1], cz_ + d10[:, 2])
    v11 = vert_at(
        cx_ + d01[:, 0] + d10[:, 0],
        cy_ + d01[:, 1] + d10[:, 1],
        cz_ + d01[:, 2] + d10[:, 2],
    )
    invert = invert_all[fidx] & f_valid

    verts2, normals2, keep2 = _quad_triangles(
        v00, v01, v11, v10, invert, _DC.degenerate_area_eps
    )
    keep2 = keep2 & f_valid[:, None]

    tri_idx, n_tris = compact_indices(keep2.reshape(-1), max_triangles)
    verts = verts2.reshape(-1, 3, 3)[tri_idx]
    normals = normals2.reshape(-1, 3)[tri_idx]
    t_valid = jnp.arange(max_triangles) < n_tris
    verts = jnp.where(t_valid[:, None, None], verts, 0.0)
    normals = jnp.where(t_valid[:, None], normals, 0.0)
    return verts, normals, n_tris


# ---------------------------------------------------------------------------
# Adaptive (octree-leaf) dual contouring
# ---------------------------------------------------------------------------

def cell_contains_surface(grid: VoxelGrid, cx, cy, cz, size: int):
    """Port of cellContainsSurface (AdaptiveDualContouringRenderer.cpp:1367-1530).

    Vectorized over leaf corner arrays for one static ``size``: corner
    disagreement test, strided diagonal face probes on all six faces, and
    the exhaustive interior scan for size <= 4.
    """
    dx, dy, dz = grid.dims_xyz
    min_x = jnp.maximum(cx, 0)
    min_y = jnp.maximum(cy, 0)
    min_z = jnp.maximum(cz, 0)
    max_x = jnp.minimum(cx + size, dx)
    max_y = jnp.minimum(cy + size, dy)
    max_z = jnp.minimum(cz + size, dz)
    nonempty = (min_x < max_x) & (min_y < max_y) & (min_z < max_z)

    def occ_at(x, y, z):
        inb = (x >= 0) & (y >= 0) & (z >= 0) & (x < dx) & (y < dy) & (z < dz)
        return inb, grid.sample_safe(x, y, z) > 0

    # Offsets ride array axes, not Python loop constants: a loop-constant
    # per iteration bakes a distinct HLO per step, and on remote-compile
    # TPU runtimes every one of those is a multi-second compile RPC
    # (measured 8-19 s per level for this function before the rewrite).

    # --- corners ([C, 8] in one shot) ----------------------------------------------
    sel = np.array(
        [[(i >> 0) & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)],
        np.int32,
    )
    qx = jnp.where(sel[None, :, 0], (max_x - 1)[:, None], min_x[:, None])
    qy = jnp.where(sel[None, :, 1], (max_y - 1)[:, None], min_y[:, None])
    qz = jnp.where(sel[None, :, 2], (max_z - 1)[:, None], min_z[:, None])
    inb, f = occ_at(qx, qy, qz)
    result = (inb & f).any(-1) & (inb & ~f).any(-1)

    # --- strided diagonal face probes ([C, n_off] per direction/end) ---------------
    stride = max(1, size // 4)
    offs = np.arange(0, size, stride, dtype=np.int32)[None, :]

    def probes(at, p1, p2, ok, lo_end, hi_end, dcap):
        r = jnp.zeros_like(result)
        for ea, eb in ((lo_end - 1, lo_end), (hi_end - 1, hi_end)):
            inb_ = (ea[:, None] >= 0) & (eb[:, None] < dcap) & ok
            _, f1 = at(jnp.clip(ea, 0, dcap - 1)[:, None], p1, p2)
            _, f2 = at(jnp.clip(eb, 0, dcap - 1)[:, None], p1, p2)
            r = r | (inb_ & (f1 != f2)).any(-1)
        return r

    y1 = min_y[:, None] + offs
    z1 = min_z[:, None] + offs
    x1 = min_x[:, None] + offs
    result = result | probes(
        lambda a, b, c: occ_at(a, b, c), y1, z1,
        (y1 < max_y[:, None]) & (z1 < max_z[:, None]), min_x, max_x, dx)
    result = result | probes(
        lambda a, b, c: occ_at(b, a, c), x1, z1,
        (x1 < max_x[:, None]) & (z1 < max_z[:, None]), min_y, max_y, dy)
    result = result | probes(
        lambda a, b, c: occ_at(b, c, a), x1, y1,
        (x1 < max_x[:, None]) & (y1 < max_y[:, None]), min_z, max_z, dz)

    # --- exhaustive interior scan for small cells ([C, size^3] in one shot) --------
    if size <= 4:
        o = np.arange(size, dtype=np.int32)
        ozg, oyg, oxg = np.meshgrid(o, o, o, indexing="ij")
        oxg, oyg, ozg = oxg.reshape(-1), oyg.reshape(-1), ozg.reshape(-1)
        x = min_x[:, None] + oxg[None, :]
        y = min_y[:, None] + oyg[None, :]
        z = min_z[:, None] + ozg[None, :]
        inb_ = (x < max_x[:, None] - 1) & (y < max_y[:, None] - 1) \
            & (z < max_z[:, None] - 1)
        _, f = occ_at(x, y, z)
        _, fx = occ_at(x + 1, y, z)
        _, fy = occ_at(x, y + 1, z)
        _, fz = occ_at(x, y, z + 1)
        result = result | (
            inb_ & ((f != fx) | (f != fy) | (f != fz))
        ).any(-1)

    return result & nonempty


_PERP = {0: (1, 2), 1: (0, 2), 2: (0, 1)}  # dir -> perpendicular axes


@jax.jit
def _node_centers(tree, grid: VoxelGrid):
    """Per-node cell center with each node's own size."""
    corner = grid.grid_to_world(tree.x, tree.y, tree.z)
    return corner + 0.5 * tree.size[:, None].astype(jnp.float32) * grid.voxel_size


def _pass0_level_body(grid, tree, id_vol, ids_j, n_real, node_mask,
                      need_vertex, s: int, max_ratio: float):
    """One level of DC pass 0 (traceable body; see _pass0_all).

    surface classification + per-direction min-corner crossing edges +
    size-ratio-gated adjacent-leaf lookups (createTriangles' neighbor
    gather, AdaptiveDualContouringRenderer.cpp:683-685) + need-vertex
    scatter accumulation (including boundary-fan face neighbors).

    ``id_vol`` (core/octree.py::build_node_id_volume): when given, each
    neighbor lookup is one volume gather + anchored check instead of a
    log2(N)-step binary search — the 15 find_node calls per id here were
    the measured pass-0 bottleneck on Calgary (binary search = ~19 scalar
    gathers each at the ~8 ns/element floor).

    Returns (surf bool[P], adj_per_dir [3 x (crossing, [(nid, ok) x 3])],
    need_vertex')."""
    from ray_tracing_octrees_tpu.core.octree import find_node_vol

    def locate(qx, qy, qz):
        if id_vol is not None:
            return find_node_vol(tree, id_vol, qx, qy, qz)
        return tree.find_node(qx, qy, qz)

    n_nodes = tree.num_nodes
    cx = tree.x[ids_j]
    cy = tree.y[ids_j]
    cz = tree.z[ids_j]
    surf = cell_contains_surface(grid, cx, cy, cz, s)
    surf = surf & (jnp.arange(ids_j.shape[0]) < n_real)
    if node_mask is not None:
        surf = surf & node_mask[ids_j]

    dims = grid.dims_xyz
    adj_per_dir = []
    for d in range(3):
        ax = _AXES[d]
        ex2 = cx + s * ax[0]
        ey2 = cy + s * ax[1]
        ez2 = cz + s * ax[2]
        inb = (
            (cx >= 0) & (cy >= 0) & (cz >= 0)
            & (cx < dims[0]) & (cy < dims[1]) & (cz < dims[2])
            & (ex2 >= 0) & (ey2 >= 0) & (ez2 >= 0)
            & (ex2 < dims[0]) & (ey2 < dims[1]) & (ez2 < dims[2])
        )
        f1 = grid.sample_safe(cx, cy, cz) > 0
        f2 = grid.sample_safe(ex2, ey2, ez2) > 0
        crossing = surf & inb & (f1 != f2)

        a1, a2 = _PERP[d]
        adj_info = []
        for da1, da2 in ((1, 0), (0, 1), (1, 1)):
            off = np.zeros(3, np.int32)
            off[a1] = da1 * s
            off[a2] = da2 * s
            ax_ = cx - off[0]
            ay_ = cy - off[1]
            az_ = cz - off[2]
            inb_a = (
                (ax_ >= 0) & (ay_ >= 0) & (az_ >= 0)
                & (ax_ < dims[0]) & (ay_ < dims[1]) & (az_ < dims[2])
            )
            nid = locate(ax_, ay_, az_)
            nid_c = jnp.clip(nid, 0, n_nodes - 1)
            ok = (
                inb_a
                & (nid >= 0)
                & tree.is_leaf[nid_c]
                & (
                    jnp.maximum(s, tree.size[nid_c])
                    <= jnp.minimum(s, tree.size[nid_c]) * max_ratio
                )
                & crossing
            )
            adj_info.append((jnp.where(ok, nid, -1), ok))
        adj_per_dir.append((crossing, adj_info))

    # need-vertex: surface leaves + valid adjacents (`max` = scatter-OR;
    # padded duplicate ids must not clobber True with False)
    need_vertex = need_vertex.at[ids_j].max(surf, mode="drop")
    for crossing, adj_info in adj_per_dir:
        for nid, ok in adj_info:
            nid_c = jnp.clip(nid, 0, n_nodes - 1)
            need_vertex = need_vertex.at[nid_c].max(ok, mode="drop")

    # potential boundary-fan participants: face neighbors of boundary
    # surface leaves also need their (own-size) dual vertex
    at_boundary = (
        (cx == 0) | (cy == 0) | (cz == 0)
        | (cx + s >= dims[0]) | (cy + s >= dims[1]) | (cz + s >= dims[2])
    )
    fan_possible = surf & at_boundary
    for fd in ([1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
               [0, 0, 1], [0, 0, -1]):
        nx_ = cx + fd[0] * s
        ny_ = cy + fd[1] * s
        nz_ = cz + fd[2] * s
        inb_f = (
            (nx_ >= 0) & (ny_ >= 0) & (nz_ >= 0)
            & (nx_ < dims[0]) & (ny_ < dims[1]) & (nz_ < dims[2])
        )
        nid = locate(nx_, ny_, nz_)
        nid_c = jnp.clip(nid, 0, n_nodes - 1)
        ok = fan_possible & inb_f & (nid >= 0) & tree.is_leaf[nid_c]
        need_vertex = need_vertex.at[nid_c].max(ok, mode="drop")

    return surf, adj_per_dir, need_vertex


@functools.partial(jax.jit, static_argnames=("s", "max_ratio"))
def _pass0_level(grid, tree, id_vol, ids_j, n_real, node_mask, need_vertex,
                 s: int, max_ratio: float):
    """Single-level pass 0 program (kept for probes/tools; the extraction
    driver uses :func:`_pass0_all`)."""
    return _pass0_level_body(grid, tree, id_vol, ids_j, n_real, node_mask,
                             need_vertex, s, max_ratio)


@functools.partial(jax.jit, static_argnames=("sizes", "max_ratio"))
def _pass0_all(grid, tree, id_vol, ids_list, n_real_arr, node_mask,
               sizes: tuple, max_ratio: float):
    """EVERY level of pass 0 as ONE program.

    The per-level jitted form compiled (and dispatched) once per octree
    level — 9 programs on Calgary, each a multi-second compile RPC on
    remote-compile runtimes plus a ~30 ms warm dispatch floor
    (docs/ROADMAP.md). The level loop is static, so unrolling it inside
    one jit keeps the math bit-identical while collapsing 9 compiles +
    9 dispatches into 1 + 1. ``ids_list``: per-level padded id buckets
    (shapes static); ``n_real_arr``: i32[L] real counts; ``sizes``:
    static per-level cell sizes.

    Returns ([(surf, adj_per_dir)] per level, need_vertex).
    """
    need_vertex = jnp.zeros((tree.num_nodes,), bool)
    outs = []
    for i, s in enumerate(sizes):
        surf, adj, need_vertex = _pass0_level_body(
            grid, tree, id_vol, ids_list[i], n_real_arr[i], node_mask,
            need_vertex, s, max_ratio)
        outs.append((surf, adj))
    return outs, need_vertex


def _pass1_level_body(grid, tree, vertex, ids_j, s: int, stride: int,
                      qef_cfg: QEFConfig):
    """One level of DC pass 1 (traceable body): hermite shell scan +
    QEF dual vertex for every needed leaf of size ``s``.

    ids_j is padded/bucketed; duplicate padding ids scatter identical
    vertices so the update is idempotent."""
    pts, nrms, msk = gather_cell_hermite(
        grid, tree.x[ids_j], tree.y[ids_j], tree.z[ids_j], s, stride
    )
    centers = vertex[ids_j]
    cell_size = (
        jnp.full((ids_j.shape[0],), s, jnp.float32) * grid.voxel_size
    )
    dv = generate_dual_vertex(pts, nrms, msk, centers, cell_size, qef_cfg)
    return vertex.at[ids_j].set(dv)


@functools.partial(jax.jit, static_argnames=("s", "stride", "qef_cfg"))
def _pass1_level(grid, tree, vertex, ids_j, s: int, stride: int,
                 qef_cfg: QEFConfig):
    """Single-level pass 1 program (kept for probes/tools; the extraction
    driver uses :func:`_pass1_all`)."""
    return _pass1_level_body(grid, tree, vertex, ids_j, s, stride, qef_cfg)


@functools.partial(jax.jit, static_argnames=("seg_cfg", "qef_cfg"))
def _pass1_all(grid, tree, vertex, ids_list, seg_cfg: tuple,
               qef_cfg: QEFConfig):
    """EVERY level of pass 1 as ONE program (see _pass0_all's rationale).

    ``seg_cfg``: static ((s, stride), ...) aligned with ``ids_list``. Each
    level keeps its own hermite shell template (the shell shapes are
    size-dependent), but they all live in one compiled program now.
    """
    for ids_j, (s, stride) in zip(ids_list, seg_cfg):
        vertex = _pass1_level_body(grid, tree, vertex, ids_j, s, stride,
                                   qef_cfg)
    return vertex


@functools.partial(jax.jit, static_argnames=("area_eps",))
def _pass2_level(tree, vertex, ids_parts, adj_parts, emitted_any,
                 area_eps: float):
    """DC pass 2 (createTriangles emission over the 3 edge directions),
    every level, as a single program.

    ``ids_parts``/``adj_parts``: per-level tuples straight from
    _pass0_all — concatenated IN-PROGRAM (each driver-level eager
    concatenate was its own ~30 ms warm dispatch on the remote runtime;
    there were 22 of them).

    Returns (verts_flat [6P*9], normals_flat [6P*3], keep [6P],
    emitted_any') — flat f32 layouts (a [M,3,3] array tiles to T(4,128)
    on TPU: 57x the logical bytes)."""
    ids_j = jnp.concatenate(ids_parts)
    adj_per_dir = []
    for d in range(3):
        crossing = jnp.concatenate([a[d][0] for a in adj_parts])
        infos = []
        for j in range(3):
            nid = jnp.concatenate([a[d][1][j][0] for a in adj_parts])
            ok = jnp.concatenate([a[d][1][j][1] for a in adj_parts])
            infos.append((nid, ok))
        adj_per_dir.append((crossing, infos))
    n_nodes = tree.num_nodes
    solid_self = tree.is_solid[ids_j]
    v_self = vertex[ids_j]
    leaf_emitted = jnp.zeros(ids_j.shape, bool)
    vs, ns, ks = [], [], []

    for crossing, adj_info in adj_per_dir:
        nid1, ok1 = adj_info[0]
        nid2, ok2 = adj_info[1]
        nid3, ok3 = adj_info[2]
        v1 = vertex[jnp.clip(nid1, 0, n_nodes - 1)]
        v2 = vertex[jnp.clip(nid2, 0, n_nodes - 1)]
        v3 = vertex[jnp.clip(nid3, 0, n_nodes - 1)]

        cnt = (1 + ok1.astype(jnp.int32) + ok2.astype(jnp.int32)
               + ok3.astype(jnp.int32))
        # ordered compaction of [self, v1, v2, v3]
        second = jnp.where(ok1[:, None], v1, v2)
        third = jnp.where(ok1[:, None], jnp.where(ok2[:, None], v2, v3), v3)
        fourth = v3

        def tri(a, b, c, valid):
            e1 = b - a
            e2 = c - a
            cr = jnp.cross(e1, e2)
            area = 0.5 * jnp.linalg.norm(cr, axis=-1)
            n = cr / jnp.maximum(
                jnp.linalg.norm(cr, axis=-1, keepdims=True), 1e-30
            )
            n = jnp.where(solid_self[:, None], -n, n)
            keep = valid & (area > area_eps)
            return jnp.stack([a, b, c], axis=-2), n, keep

        t1v, t1n, t1k = tri(v_self, second, third, crossing & (cnt >= 3))
        t2v, t2n, t2k = tri(v_self, third, fourth, crossing & (cnt == 4))

        vs.append(jnp.concatenate([t1v, t2v], 0).reshape(-1))
        ns.append(jnp.concatenate([t1n, t2n], 0).reshape(-1))
        ks.append(jnp.concatenate([t1k, t2k], 0))
        leaf_emitted = leaf_emitted | t1k | t2k

    emitted_any = emitted_any.at[ids_j].max(leaf_emitted, mode="drop")
    return (
        jnp.concatenate(vs), jnp.concatenate(ns), jnp.concatenate(ks),
        emitted_any,
    )


@jax.jit
def _count_tris(k_list):
    """Live-triangle count over the per-level keep masks (one tiny program;
    its scalar is the only mid-extraction host sync)."""
    return jnp.sum(jnp.concatenate(k_list).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("out_cap",))
def _compact_gather(v_list, n_list, k_list, out_cap: int):
    """Gather-side stream compaction of the per-level flat triangle
    buffers into a bucketed [out_cap] output (rows past the live count are
    zero).

    The scatter form built and wrote cap*9 ~ 18M-element buffers (and the
    caller then host-fetched ALL of them: 97 MB, 4.3 s of the measured
    6 s warm Calgary extraction). Here one iota scatter builds the kept-row
    index list and two ROW gathers (~0.3 ns/element vs ~8 for scalar
    scatters) produce only the bucketed output actually consumed."""
    k_all = jnp.concatenate(k_list)                    # [T] bool
    v_all = jnp.concatenate(v_list).reshape(-1, 9)     # [T, 9]
    n_all = jnp.concatenate(n_list).reshape(-1, 3)     # [T, 3]
    cap = k_all.shape[0]
    rank = jnp.cumsum(k_all.astype(jnp.int32)) - 1
    slot = jnp.where(k_all, jnp.minimum(rank, out_cap), out_cap)
    ids = jnp.zeros((out_cap + 1,), jnp.int32).at[slot].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop")[:out_cap]
    valid = jnp.arange(out_cap) < jnp.sum(k_all.astype(jnp.int32))
    v_rows = jnp.where(valid[:, None], v_all[ids], 0.0)
    n_rows = jnp.where(valid[:, None], n_all[ids], 0.0)
    return v_rows, n_rows


def tree_host_meta(tree):
    """Host copies of (is_leaf, level) for :func:`adaptive_dual_contouring`.

    Per-tree constants: compute once per scene next to the octree build and
    pass as ``tree_meta`` so repeated per-pose extractions skip the two
    device->host pulls (~0.4 s through the tunneled runtime)."""
    from ray_tracing_octrees_tpu.core.grid import host_fetch

    return host_fetch(tree.is_leaf).astype(bool), host_fetch(tree.level)


def adaptive_dual_contouring(
    grid: VoxelGrid,
    tree,
    node_mask=None,
    max_triangles_per_level: int = 262144,
    qef_cfg: QEFConfig = QEFConfig(),
    dc_cfg: DCConfig = DCConfig(),
    with_boundary_fans: bool = True,
    node_id_vol=None,
    tree_meta=None,
    device_out: bool = False,
):
    """Adaptive octree-leaf DC (createTriangles semantics, order-free).

    Host-orchestrated over octree levels (the structure is static per
    scene); each level runs as one jitted batch. Returns (verts, normals)
    as stacked numpy-backed jnp arrays plus the count.

    node_mask: optional bool[N] visibility (frustum culling at margin 50,
    as renderOctree applies before calling render(), main.cpp:154-189).

    node_id_vol: optional i32[S,S,S] from core.octree.build_node_id_volume
    — turns every neighbor lookup into one gather (same results; scene
    preprocessing, like the reference's g_octreeMap registered during the
    octree build).

    tree_meta: optional (is_leaf, level) host pair from
    :func:`tree_host_meta` (skips two per-call device->host pulls).

    device_out: return device-resident (verts f32[K,3,3], normals f32[K,3],
    count) with K >= count a padded bucket and rows past count zeroed —
    the production path for on-device consumers (the rasterizer; the
    reference's analog hands the triangle vector straight to a VBO).
    Default False returns exact-count arrays via a host round trip.
    """
    import numpy as _np

    from ray_tracing_octrees_tpu.core.grid import host_fetch

    # host_fetch, NOT np.asarray: raw narrow-dtype unaligned fetches run at
    # seconds/MB through the tunneled runtime — these two bool[N] pulls were
    # most of the measured 21.7 s warm Calgary extraction (LADDER_r02).
    if tree_meta is not None:
        leaf, level = tree_meta
    else:
        leaf, level = tree_host_meta(tree)
    n_nodes = tree.num_nodes

    def _pad_pow2(ids, lo=64):
        """Pad id lists to power-of-two buckets so per-level batches share
        compiled programs (per-level exact shapes would recompile every op
        for every level — multi-second RPCs each on remote-compile TPU
        runtimes). Pads duplicate ids[0]; callers mask with `n_real`."""
        n = len(ids)
        p = max(lo, 1 << int(_np.ceil(_np.log2(max(1, n)))))
        return _np.concatenate(
            [ids, _np.full(p - n, ids[0], ids.dtype)]), n

    # ---- pass 0: surface leaves & crossing edges, ALL levels, ONE program --------
    # (the per-level jitted form cost one compile RPC + one ~30 ms warm
    # dispatch per level; the level loop is static, so it unrolls inside
    # a single program — see _pass0_all)
    levels_present = sorted(set(level[leaf].tolist()))
    surface_by_level = {}
    adj_ids_by_level = {}

    seg_keys, seg_ids, seg_nreal, seg_sizes = [], [], [], []
    for k in levels_present:
        ids = _np.nonzero(leaf & (level == k))[0].astype(_np.int32)
        if len(ids) == 0:
            continue
        ids, n_real = _pad_pow2(ids)
        seg_keys.append(k)
        seg_ids.append(jnp.asarray(ids))
        seg_nreal.append(n_real)
        seg_sizes.append(1 << k)
    mask_arg = node_mask if node_mask is not None else None
    outs, need_vertex = _pass0_all(
        grid, tree, node_id_vol, tuple(seg_ids),
        jnp.asarray(seg_nreal, jnp.int32), mask_arg,
        sizes=tuple(seg_sizes), max_ratio=float(dc_cfg.max_size_ratio),
    )
    for k, ids_j, (surf, adj_per_dir) in zip(seg_keys, seg_ids, outs):
        surface_by_level[k] = (ids_j, surf)
        adj_ids_by_level[k] = adj_per_dir

    # ---- pass 1: dual vertices for all needed leaves, ALL levels, ONE program ----
    vertex = _node_centers(tree, grid)  # default: own-size cell center
    need_np = host_fetch(need_vertex).astype(bool)
    p1_ids, p1_cfg = [], []
    for k in levels_present:
        ids = _np.nonzero(leaf & (level == k) & need_np)[0].astype(_np.int32)
        if len(ids) == 0:
            continue
        ids, _ = _pad_pow2(ids)   # duplicate ids write identical vertices
        s = 1 << k
        stride = (
            dc_cfg.stride_large_cell if s > dc_cfg.stride_switch_size else 1
        )
        p1_ids.append(jnp.asarray(ids))
        p1_cfg.append((s, stride))
    if p1_ids:
        vertex = _pass1_all(grid, tree, vertex, tuple(p1_ids),
                            seg_cfg=tuple(p1_cfg), qef_cfg=qef_cfg)

    # ---- pass 2: triangle emission, ALL levels as one program --------------------
    # _pass2_level's math never uses the level size, so every level's
    # (ids, adjacency) rows concatenate into a single call — the per-level
    # form paid a ~30 ms remote-dispatch floor per level.
    out_verts = []
    out_normals = []
    emitted_any = jnp.zeros((n_nodes,), bool)

    lvls2 = [k for k in levels_present if k in adj_ids_by_level]
    if lvls2:
        v_flat, n_flat, k_flat, emitted_any = _pass2_level(
            tree, vertex,
            tuple(surface_by_level[k][0] for k in lvls2),
            tuple(adj_ids_by_level[k] for k in lvls2),
            emitted_any,
            area_eps=float(dc_cfg.degenerate_area_eps),
        )
        out_verts.append((v_flat, k_flat))
        out_normals.append(n_flat)

    # ---- pass 3: boundary face fans (createFaceTriangles fallback) ---------------
    if with_boundary_fans:
        fan_v, fan_n, fan_k = _boundary_face_fans(
            grid, tree, vertex, surface_by_level, emitted_any, dc_cfg,
            _pad_pow2, id_vol=node_id_vol,
        )
        if fan_v is not None:
            out_verts.append((fan_v, fan_k))
            out_normals.append(fan_n)

    # ---- device-side compaction into a bucketed buffer ---------------------------
    from ray_tracing_octrees_tpu.core.grid import host_fetch

    if not out_verts:
        z = _np.zeros((0, 3, 3), _np.float32)
        return jnp.asarray(z), jnp.asarray(z[:, :, 0]), 0
    k_list = [k for _, k in out_verts]
    total = int(host_fetch(_count_tris(k_list)))
    # bucket the output cap (multiples of 64k: one cached program per
    # scene-scale, and the host fetch moves only ~total rows, not the
    # ~2M-row padded emission buffers)
    out_cap = max(4096, -(-max(total, 1) // 65536) * 65536)
    v_rows, n_rows = _compact_gather(
        [v for v, _ in out_verts], out_normals, k_list, out_cap=out_cap
    )
    if device_out:
        return v_rows.reshape(-1, 3, 3), n_rows, total
    # ONE packed fetch of only ~total rows: `total` is already on the host,
    # so slice device-side to an 8k bucket (bounded program count) and ship
    # verts+normals as a single [tot_r, 12] f32 buffer — the padded
    # out_cap tail (up to 64k rows) never crosses the tunnel, and the
    # second RPC disappears. Bit-exact with the device_out arrays.
    tot_r = min(out_cap, max(4096, -(-max(total, 1) // 8192) * 8192))
    packed = jnp.concatenate([v_rows[:tot_r], n_rows[:tot_r]], axis=1)
    host = host_fetch(packed)
    verts = host[:total, :9].reshape(-1, 3, 3)
    normals = np.ascontiguousarray(host[:total, 9:12])
    return jnp.asarray(verts), jnp.asarray(normals), total


def _boundary_face_fans(grid, tree, vertex, surface_by_level, emitted_any,
                        dc_cfg, _pad_pow2, id_vol=None):
    """createFaceTriangles (AdaptiveDualContouringRenderer.cpp:805-1088) for
    surface leaves that emitted nothing and touch the grid boundary.

    Fan candidates are HOST-compacted before the 192-triangles-per-cell
    expansion (each fan emission is E * 192 triangles — expanding the full
    padded level instead of the handful of eligible boundary cells cost
    tens of millions of padded rows). All levels run as ONE eligibility
    program + ONE fan program (sizes are per-row arrays): per-level calls
    paid a ~30 ms remote-dispatch floor each on the tunneled runtime."""
    import numpy as _np

    from ray_tracing_octrees_tpu.core.grid import host_fetch

    lvls = sorted(surface_by_level)
    if not lvls:
        return None, None, None
    sizes = tuple(1 << k for k in lvls)
    elig, ids_cat, s_cat = _fan_eligible(
        grid, tree,
        tuple(surface_by_level[k][0] for k in lvls),
        emitted_any,
        tuple(surface_by_level[k][1] for k in lvls),
        sizes=sizes)
    elig_np = host_fetch(elig).astype(bool)
    sel = _np.nonzero(elig_np)[0].astype(_np.int32)
    if len(sel) == 0:
        return None, None, None
    sel, n_real = _pad_pow2(sel, lo=64)
    sel_j = jnp.asarray(sel)
    return _fan_level(
        grid, tree, vertex, id_vol, ids_cat, s_cat, sel_j,
        jnp.int32(n_real),
        divisions=int(dc_cfg.face_fan_divisions),
        max_ratio=float(dc_cfg.max_size_ratio),
    )


@functools.partial(jax.jit, static_argnames=("sizes",))
def _fan_eligible(grid, tree, ids_parts, emitted_any, surf_parts,
                  sizes: tuple):
    """Fan candidacy per surface leaf: emitted nothing + touches the grid
    boundary, one program over ALL levels. Takes per-level parts and
    concatenates in-program (driver-level eager concats were their own
    warm dispatches); returns (eligible, ids_cat, s_cat) so the caller
    reuses the concatenated device arrays."""
    ids_j = jnp.concatenate(ids_parts)
    surf = jnp.concatenate(surf_parts)
    s = jnp.concatenate([
        jnp.full(p.shape, sz, jnp.int32)
        for p, sz in zip(ids_parts, sizes)])
    dx, dy, dz = grid.dims_xyz
    cx, cy, cz = tree.x[ids_j], tree.y[ids_j], tree.z[ids_j]
    at_boundary = (
        (cx == 0) | (cy == 0) | (cz == 0)
        | (cx + s >= dx) | (cy + s >= dy) | (cz + s >= dz)
    )
    return surf & (~emitted_any[ids_j]) & at_boundary, ids_j, s


@functools.partial(jax.jit, static_argnames=("divisions", "max_ratio"))
def _fan_level(grid, tree, vertex, id_vol, ids_cat, s_cat, sel_j, n_real,
               divisions: int, max_ratio: float):
    """Boundary-fan emission as a single program over ALL levels.

    ``sel_j``/``n_real`` select the host-compacted eligible rows from the
    concatenated (ids_cat, s_cat) in-program (the eager index/arange ops
    were their own warm dispatches). ``s`` is a TRACED per-row array (it
    only enters arithmetic), so every level's candidates batch into one
    call — the eager per-level form issued ~400 dispatches per level
    (192 emits x 2 ops), which dominated the warm extraction on
    remote-dispatch runtimes.

    Returns flat (verts [E*9], normals [E*3], keep [E]) with
    E = P * 6 faces * divisions^2 * 8 triangles."""
    import numpy as _np

    from ray_tracing_octrees_tpu.core.octree import find_node_vol

    ids_j = ids_cat[sel_j]
    s = s_cat[sel_j]
    eligible = jnp.arange(sel_j.shape[0]) < n_real

    dx, dy, dz = grid.dims_xyz
    n_nodes = tree.num_nodes

    fan_verts = []
    fan_normals = []
    fan_keep = []

    face_dirs = _np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        _np.int32,
    )
    tangents = {
        0: (_np.array([0, 1, 0], _np.float32), _np.array([0, 0, 1], _np.float32)),
        1: (_np.array([1, 0, 0], _np.float32), _np.array([0, 0, 1], _np.float32)),
        2: (_np.array([1, 0, 0], _np.float32), _np.array([0, 1, 0], _np.float32)),
    }

    if True:  # (keeps the reference loop body's indentation readable)
        cx, cy, cz = tree.x[ids_j], tree.y[ids_j], tree.z[ids_j]
        v_self = vertex[ids_j]
        solid_self = tree.is_solid[ids_j]
        # per-row half-extent [P, 1] (s is per-row now)
        half = (0.5 * s.astype(jnp.float32) * grid.voxel_size)[:, None]

        for f in range(6):
            fd = face_dirs[f]
            axis = f // 2
            nx = cx + int(fd[0]) * s
            ny = cy + int(fd[1]) * s
            nz = cz + int(fd[2]) * s
            inb = (
                (nx >= 0) & (ny >= 0) & (nz >= 0)
                & (nx < dx) & (ny < dy) & (nz < dz)
            )
            if id_vol is not None:
                nid = find_node_vol(tree, id_vol, nx, ny, nz)
            else:
                nid = tree.find_node(nx, ny, nz)
            nid_c = jnp.clip(nid, 0, n_nodes - 1)
            found_leaf = (nid >= 0) & tree.is_leaf[nid_c]
            ratio_bad = found_leaf & (
                jnp.maximum(s, tree.size[nid_c])
                > jnp.minimum(s, tree.size[nid_c]) * max_ratio
            )
            # grid-sample fallback at neighbor center (clamped)
            sx = jnp.clip(nx + s // 2, 0, dx - 1)
            sy = jnp.clip(ny + s // 2, 0, dy - 1)
            sz = jnp.clip(nz + s // 2, 0, dz - 1)
            sample_solid = grid.sample_safe(sx, sy, sz) > 0
            neighbor_solid = jnp.where(
                found_leaf, tree.is_solid[nid_c], sample_solid
            )
            active = (
                eligible & inb & (~ratio_bad)
                & (neighbor_solid != solid_self)
            )

            # neighbor vertex: leaf's own vertex, else its center at self size
            nb_center = grid.grid_to_world(nx, ny, nz) + half
            v_nb = jnp.where(found_leaf[:, None], vertex[nid_c], nb_center)

            t1v, t2v = tangents[axis]
            t1v = jnp.asarray(t1v)
            t2v = jnp.asarray(t2v)
            f_normal = jnp.asarray(fd, jnp.float32)
            out_normal = jnp.where(
                solid_self[:, None], f_normal[None, :], -f_normal[None, :]
            )
            face_center = 0.5 * (v_self + v_nb)

            # (divisions+1)^2 bulged grid points
            pts = {}
            for i in range(divisions + 1):
                for j in range(divisions + 1):
                    u = 2.0 * (i / divisions) - 1.0
                    v = 2.0 * (j / divisions) - 1.0
                    bulge = 0.05 * half * (1.0 - (u * u + v * v))
                    pts[(i, j)] = (
                        face_center
                        + t1v[None, :] * (u * half)
                        + t2v[None, :] * (v * half)
                        + f_normal[None, :] * bulge
                    )

            def emit(a, b, c, nrm):
                fan_verts.append(jnp.stack([a, b, c], axis=1).reshape(-1))
                fan_normals.append(nrm.reshape(-1))
                fan_keep.append(active)

            for i in range(divisions):
                for j in range(divisions):
                    p00 = pts[(i, j)]
                    p10 = pts[(i + 1, j)]
                    p01 = pts[(i, j + 1)]
                    p11 = pts[(i + 1, j + 1)]
                    # cell-vertex fan (tri1..tri4, :992-1032)
                    emit(v_self, p00, p10, out_normal)
                    emit(v_self, p10, p11, out_normal)
                    emit(v_self, p11, p01, out_normal)
                    emit(v_self, p01, p00, out_normal)
                    # neighbor fan, reversed winding, negated normal (:1036-1083)
                    emit(v_nb, p10, p00, -out_normal)
                    emit(v_nb, p11, p10, -out_normal)
                    emit(v_nb, p01, p11, -out_normal)
                    emit(v_nb, p00, p01, -out_normal)

    # always non-empty: 6 faces x divisions^2 x 8 emits per call
    v = jnp.concatenate(fan_verts)     # flat [E*9]
    n = jnp.concatenate(fan_normals)   # flat [E*3]
    keep = jnp.concatenate(fan_keep)   # [E]
    return v, n, keep
