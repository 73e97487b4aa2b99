"""Voxel block ("minecraft-style") exposed-face extraction.

TPU-native replacement for ``VoxelCubeRenderer`` (Renderer.cpp:40-168):
for every *solid leaf* of the octree, emit the two triangles of each cube
face whose face-center neighbor voxel is EMPTY or out of bounds (hidden-face
removal at leaf granularity, ``addBlockFaces`` Renderer.cpp:64-99).

Vectorized over the linear octree's node arrays with prefix-sum compaction;
an optional per-node mask folds in frustum culling (renderOctree's margin-50
traversal test, main.cpp:154-189).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_octrees_tpu.core.grid import VoxelGrid
from ray_tracing_octrees_tpu.core.octree import LinearOctree

# Face order +X, -X, +Y, -Y, +Z, -Z as in addBlockFaces (Renderer.cpp:84-99).
# Neighbor probe at (x0, y0, z0) + size * PROBE_SCALE + PROBE_OFFSET with
# half = size // 2 encoded via the 0.5 scales below (computed in ints).
_FACE_NORMALS = np.array(
    [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
    np.float32,
)

# Quad corner selectors (sx, sy, sz): 0 -> minCorner component, 1 -> max.
# Each face lists (v0, v1, v2, v3) as in addFace{Pos,Neg}{X,Y,Z}
# (Renderer.cpp:101-156); addQuad(v0, v1, v3, v2) emits triangles
# (v0, v1, v3) and (v3, v1, v2) (Renderer.cpp:158-168).
_FACE_QUADS = np.array(
    [
        [[1, 0, 0], [1, 1, 0], [1, 1, 1], [1, 0, 1]],  # +X
        [[0, 0, 0], [0, 0, 1], [0, 1, 1], [0, 1, 0]],  # -X
        [[0, 1, 0], [0, 1, 1], [1, 1, 1], [1, 1, 0]],  # +Y
        [[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]],  # -Y
        [[0, 0, 1], [0, 1, 1], [1, 1, 1], [1, 0, 1]],  # +Z
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],  # -Z
    ],
    np.int32,
)
# Triangles as quad-corner indices: (v0, v1, v3) and (v3, v1, v2).
_TRI_CORNERS = np.array([[0, 1, 3], [3, 1, 2]], np.int32)

# [6, 2, 3, 3] selectors per face/tri/vertex.
_FACE_TRIS = _FACE_QUADS[:, _TRI_CORNERS]  # (6, 2, 3, 3)


def _probe_coords(x0, y0, z0, size):
    """Face-center neighbor voxel per face ([N] ints -> [N, 6, 3])."""
    half = size // 2
    px = jnp.stack(
        [x0 + size, x0 - 1, x0 + half, x0 + half, x0 + half, x0 + half], -1
    )
    py = jnp.stack(
        [y0 + half, y0 + half, y0 + size, y0 - 1, y0 + half, y0 + half], -1
    )
    pz = jnp.stack(
        [z0 + half, z0 + half, z0 + half, z0 + half, z0 + size, z0 - 1], -1
    )
    return px, py, pz


@functools.partial(jax.jit, static_argnames=("max_triangles",))
def extract_block_faces(
    grid: VoxelGrid,
    tree: LinearOctree,
    max_triangles: int,
    node_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Exposed faces of all solid leaves.

    Returns (verts f32[max_triangles, 3, 3], normals f32[max_triangles, 3],
    count). ``node_mask`` (bool[N]) restricts emission (frustum culling).
    """
    n = tree.num_nodes
    active = tree.is_leaf & tree.is_solid
    if node_mask is not None:
        active = active & node_mask

    px, py, pz = _probe_coords(tree.x, tree.y, tree.z, tree.size)  # [N,6]
    # checkFace (Renderer.cpp:76-82): exposed iff out-of-bounds or EMPTY.
    exposed = (grid.sample_safe(px, py, pz) == 0) & active[:, None]  # [N,6]

    # Two triangles per exposed face -> flatten to [N*6] faces.
    face_counts = jnp.where(exposed, 2, 0).astype(jnp.int32).reshape(-1)
    offsets = jnp.cumsum(face_counts) - face_counts
    total = face_counts.sum()

    tri_face = jnp.zeros((max_triangles,), jnp.int32)
    tri_t = jnp.zeros((max_triangles,), jnp.int32)
    lin = jnp.arange(n * 6, dtype=jnp.int32)
    for ti in range(2):
        emit = face_counts > ti
        slots = jnp.where(emit, offsets + ti, max_triangles)
        tri_face = tri_face.at[slots].set(lin, mode="drop")
        tri_t = tri_t.at[slots].set(ti, mode="drop")

    i = jnp.arange(max_triangles, dtype=jnp.int32)
    valid = i < jnp.minimum(total, max_triangles)
    node = tri_face // 6
    face = tri_face - node * 6

    # Corner positions: minCorner = origin + (x0,y0,z0)*vs; ext = size*vs.
    xyz0 = jnp.stack([tree.x[node], tree.y[node], tree.z[node]], -1).astype(
        jnp.float32
    )
    min_c = grid.origin[None, :] + xyz0 * grid.voxel_size  # [T, 3]
    ext = tree.size[node].astype(jnp.float32)[:, None] * grid.voxel_size

    sel = jnp.asarray(_FACE_TRIS)[face, tri_t]  # [T, 3, 3] 0/1 selectors
    verts = min_c[:, None, :] + sel.astype(jnp.float32) * ext[:, None, :]
    normals = jnp.asarray(_FACE_NORMALS)[face]

    verts = jnp.where(valid[:, None, None], verts, 0.0)
    normals = jnp.where(valid[:, None], normals, 0.0)
    return verts, normals, jnp.minimum(total, max_triangles)


def count_block_triangles(grid: VoxelGrid, tree: LinearOctree) -> jax.Array:
    """Triangle count for capacity sizing (2 per exposed face)."""
    active = tree.is_leaf & tree.is_solid
    px, py, pz = _probe_coords(tree.x, tree.y, tree.z, tree.size)
    exposed = (grid.sample_safe(px, py, pz) == 0) & active[:, None]
    return 2 * exposed.sum()
