"""NumPy oracle implementations of the reference's CPU algorithms.

Direct ports of the *semantics* in /root/reference/453-skeleton (pointer
octree, localMC, block faces, DC) used as ground truth for the TPU array
implementations. Deliberately simple and slow.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

FILLED = 1
EMPTY = 0


@dataclasses.dataclass
class OracleGrid:
    """x-major grid mirroring VoxelGrid (OctreeVoxel.h:28-42)."""

    occ: np.ndarray  # uint8[Z, Y, X]
    origin: np.ndarray  # float32[3] = minX, minY, minZ
    voxel_size: float

    @property
    def dims(self):  # (dimX, dimY, dimZ)
        return self.occ.shape[2], self.occ.shape[1], self.occ.shape[0]

    def get_safe(self, x: int, y: int, z: int) -> int:
        dx, dy, dz = self.dims
        if x < 0 or y < 0 or z < 0 or x >= dx or y >= dy or z >= dz:
            return EMPTY  # getVoxelSafe: out of range -> EMPTY
        return int(self.occ[z, y, x])


@dataclasses.dataclass
class OracleNode:
    """Pointer octree node (OctreeVoxel.h:45-62)."""

    x: int
    y: int
    z: int
    size: int
    is_leaf: bool = False
    is_solid: bool = False
    is_uniform: bool = False
    children: List[Optional["OracleNode"]] = dataclasses.field(
        default_factory=lambda: [None] * 8
    )
    parent: Optional["OracleNode"] = None


def build_key(x: int, y: int, z: int) -> int:
    return (x << 20) | (y << 10) | z


def build_octree(grid: OracleGrid):
    """Port of createOctreeFromVoxelGrid/buildOctreeRec (OctreeVoxel.cpp:704-778).

    Returns (root, node_map) where node_map matches g_octreeMap insertion
    semantics (later inserts overwrite; recursion order means the deepest
    node anchored at a corner wins).
    """
    dx, dy, dz = grid.dims
    size = 1
    while size < max(dx, dy, dz):
        size <<= 1
    node_map: Dict[int, OracleNode] = {}

    def rec(x0, y0, z0, s) -> OracleNode:
        node = OracleNode(x0, y0, z0, s)
        node_map[build_key(x0, y0, z0)] = node
        if s == 1:
            node.is_leaf = True
            node.is_solid = grid.get_safe(x0, y0, z0) == FILLED
            node.is_uniform = True
            return node
        first = grid.get_safe(x0, y0, z0)
        all_same = True
        for zz in range(z0, z0 + s):
            for yy in range(y0, y0 + s):
                for xx in range(x0, x0 + s):
                    if grid.get_safe(xx, yy, zz) != first:
                        all_same = False
                        break
                if not all_same:
                    break
            if not all_same:
                break
        if all_same:
            node.is_leaf = True
            node.is_uniform = True
            node.is_solid = first == FILLED
            return node
        node.is_leaf = False
        node.is_uniform = False
        half = s // 2
        for i in range(8):
            ox = x0 + (half if (i & 1) else 0)
            oy = y0 + (half if (i & 2) else 0)
            oz = z0 + (half if (i & 4) else 0)
            child = rec(ox, oy, oz, half)
            node.children[i] = child
            child.parent = node
        return node

    # Faster uniformity via precomputed prefix over the padded cube
    # (identical result; the triple loop above is kept for clarity but the
    # scan is vectorized here for speed on 64^3+ grids).
    pad = np.zeros((size, size, size), np.uint8)
    pad[:dz, :dy, :dx] = grid.occ

    def rec_fast(x0, y0, z0, s) -> OracleNode:
        node = OracleNode(x0, y0, z0, s)
        node_map[build_key(x0, y0, z0)] = node
        region = pad[z0 : z0 + s, y0 : y0 + s, x0 : x0 + s]
        if s == 1 or region.min() == region.max():
            node.is_leaf = True
            node.is_uniform = True
            node.is_solid = bool(region.flat[0] == FILLED)
            return node
        node.is_leaf = False
        node.is_uniform = False
        half = s // 2
        for i in range(8):
            ox = x0 + (half if (i & 1) else 0)
            oy = y0 + (half if (i & 2) else 0)
            oz = z0 + (half if (i & 4) else 0)
            child = rec_fast(ox, oy, oz, half)
            node.children[i] = child
            child.parent = node
        return node

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(100000)
    try:
        root = rec_fast(0, 0, 0, size)
    finally:
        sys.setrecursionlimit(old_limit)
    return root, node_map


def bfs_flatten(root: OracleNode):
    """Port of RayTracerBVH::setOctree's BFS flatten (RayTracerBVH.cpp:430-505)."""
    nodes: List[OracleNode] = []
    index: Dict[int, int] = {}
    queue = [root]
    while queue:
        n = queue.pop(0)
        index[id(n)] = len(nodes)
        nodes.append(n)
        if not n.is_leaf:
            for c in n.children:
                if c is not None:
                    queue.append(c)
    flat = []
    for n in nodes:
        child_idx = [
            (index[id(c)] if (not n.is_leaf and c is not None) else -1)
            for c in n.children
        ]
        flat.append(
            dict(
                x=n.x,
                y=n.y,
                z=n.z,
                size=n.size,
                is_leaf=n.is_leaf,
                is_solid=n.is_solid,
                is_uniform=n.is_uniform,
                children=child_idx,
            )
        )
    return flat


def scalar_at(grid: OracleGrid, x: int, y: int, z: int) -> float:
    """localMC's getScalar: FILLED -> -1, EMPTY/out-of-range -> +1."""
    return -1.0 if grid.get_safe(x, y, z) == FILLED else 1.0


# ---------------------------------------------------------------------------
# Marching cubes oracle — port of localMC (OctreeVoxel.cpp:780-879)
# ---------------------------------------------------------------------------

from ray_tracing_octrees_tpu.ops.mc_tables import (  # noqa: E402
    EDGE_TABLE,
    TRI_TABLE,
    EDGE_CORNERS,
    CORNER_OFFSETS,
)


def vertex_interp(iso, p1, p2, v1, v2):
    """vertexInterp (OctreeVoxel.cpp:633-640)."""
    if abs(iso - v1) < 1e-5:
        return p1
    if abs(iso - v2) < 1e-5:
        return p2
    if abs(v1 - v2) < 1e-5:
        return p1
    mu = np.float32((iso - v1) / (v2 - v1))
    return p1 + mu * (p2 - p1)


def local_mc(grid: OracleGrid, x0: int, y0: int, z0: int, size: int):
    """Port of localMC: returns list of (verts[3,3], normal[3]) float32."""
    dx, dy, dz = grid.dims
    vx = np.float32(grid.voxel_size)
    origin = grid.origin.astype(np.float32)
    tris = []
    for z in range(z0, min(z0 + size, dz - 1)):
        for y in range(y0, min(y0 + size, dy - 1)):
            for x in range(x0, min(x0 + size, dx - 1)):
                corners_pos = []
                corners_val = []
                for i in range(8):
                    ox, oy, oz = CORNER_OFFSETS[i]
                    cxx, cyy, czz = x + int(ox), y + int(oy), z + int(oz)
                    corners_pos.append(
                        np.array(
                            [
                                origin[0] + cxx * vx,
                                origin[1] + cyy * vx,
                                origin[2] + czz * vx,
                            ],
                            np.float32,
                        )
                    )
                    corners_val.append(np.float32(scalar_at(grid, cxx, cyy, czz)))
                cube_index = 0
                for i in range(8):
                    if corners_val[i] < 0:
                        cube_index |= 1 << i
                edge_flags = EDGE_TABLE[cube_index]
                if edge_flags == 0:
                    continue
                vert_list = [None] * 12
                for e in range(12):
                    if edge_flags & (1 << e):
                        c1, c2 = EDGE_CORNERS[e]
                        vert_list[e] = vertex_interp(
                            np.float32(0.0),
                            corners_pos[c1],
                            corners_pos[c2],
                            corners_val[c1],
                            corners_val[c2],
                        )
                row = TRI_TABLE[cube_index]
                i = 0
                while row[i] != -1:
                    v = np.stack(
                        [vert_list[row[i]], vert_list[row[i + 1]], vert_list[row[i + 2]]]
                    )
                    e1 = v[1] - v[0]
                    e2 = v[2] - v[0]
                    n = np.cross(e1, e2)
                    n = n / max(np.linalg.norm(n), 1e-30)
                    tris.append((v.astype(np.float32), n.astype(np.float32)))
                    i += 3
    return tris


def render_octree_mc(grid: OracleGrid):
    """renderOctree driver without frustum culling (main.cpp:154-189):
    traverse the octree, run localMC on each leaf region."""
    root, _ = build_octree(grid)
    out = []

    def traverse(n):
        if n is None:
            return
        if n.is_leaf:
            out.extend(local_mc(grid, n.x, n.y, n.z, n.size))
            return
        for c in n.children:
            traverse(c)

    traverse(root)
    return out


# ---------------------------------------------------------------------------
# Voxel blocks oracle — port of VoxelCubeRenderer (Renderer.cpp:40-168)
# ---------------------------------------------------------------------------


def block_faces(grid: OracleGrid, x0, y0, z0, size):
    """addBlockFaces: emits (verts[3,3], normal[3]) per triangle."""
    vx = np.float32(grid.voxel_size)
    origin = grid.origin.astype(np.float32)
    mn = np.array(
        [origin[0] + x0 * vx, origin[1] + y0 * vx, origin[2] + z0 * vx], np.float32
    )
    mx = mn + np.float32(size) * vx
    out = []

    def check(tx, ty, tz):
        dx, dy, dz = grid.dims
        if tx < 0 or ty < 0 or tz < 0 or tx >= dx or ty >= dy or tz >= dz:
            return True
        return grid.occ[tz, ty, tx] == EMPTY

    def emit(v0, v1, v2, v3, n):
        # addQuad(v0, v1, v3, v2) -> tris (v0, v1, v3), (v3, v1, v2)
        out.append((np.stack([v0, v1, v3]).astype(np.float32), n))
        out.append((np.stack([v3, v1, v2]).astype(np.float32), n))

    h = size // 2
    P = lambda sx, sy, sz: np.array(
        [mx[0] if sx else mn[0], mx[1] if sy else mn[1], mx[2] if sz else mn[2]],
        np.float32,
    )
    if check(x0 + size, y0 + h, z0 + h):
        emit(P(1,0,0), P(1,1,0), P(1,1,1), P(1,0,1), np.array([1,0,0], np.float32))
    if check(x0 - 1, y0 + h, z0 + h):
        emit(P(0,0,0), P(0,0,1), P(0,1,1), P(0,1,0), np.array([-1,0,0], np.float32))
    if check(x0 + h, y0 + size, z0 + h):
        emit(P(0,1,0), P(0,1,1), P(1,1,1), P(1,1,0), np.array([0,1,0], np.float32))
    if check(x0 + h, y0 - 1, z0 + h):
        emit(P(0,0,0), P(1,0,0), P(1,0,1), P(0,0,1), np.array([0,-1,0], np.float32))
    if check(x0 + h, y0 + h, z0 + size):
        emit(P(0,0,1), P(0,1,1), P(1,1,1), P(1,0,1), np.array([0,0,1], np.float32))
    if check(x0 + h, y0 + h, z0 - 1):
        emit(P(0,0,0), P(1,0,0), P(1,1,0), P(0,1,0), np.array([0,0,-1], np.float32))
    return out


def render_octree_blocks(grid: OracleGrid):
    """VoxelCubeRenderer::render over the whole octree (Renderer.cpp:40-62)."""
    root, _ = build_octree(grid)
    out = []

    def rec(n):
        if n is None:
            return
        if n.is_leaf:
            if n.is_solid:
                out.extend(block_faces(grid, n.x, n.y, n.z, n.size))
            return
        for c in n.children:
            rec(c)

    rec(root)
    return out
