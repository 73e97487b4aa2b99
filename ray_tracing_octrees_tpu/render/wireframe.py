"""Octree wireframe debug geometry (the 'S'-key overlay).

Array port of ``generateOctreeWireframe`` (main.cpp:443-493): every octree
*leaf* whose AABB survives the frustum test (margin 50) emits its 12 box
edges as line segments; internal nodes only gate traversal. With the linear
octree this is one vectorized mask + a compaction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_octrees_tpu.core.octree import LinearOctree
from ray_tracing_octrees_tpu.ops.compaction import compact_indices
from ray_tracing_octrees_tpu.render.frustum import visible_node_mask

# Cube corner order of getCubeCorners (main.cpp:424-441) and the 12-edge
# table (main.cpp:473-477).
_CORNERS = np.array(
    [
        [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
    ],
    np.float32,
)
_EDGES = np.array(
    [
        [0, 1], [1, 2], [2, 3], [3, 0],
        [4, 5], [5, 6], [6, 7], [7, 4],
        [0, 4], [1, 5], [2, 6], [3, 7],
    ],
    np.int32,
)


@functools.partial(jax.jit, static_argnames=("max_lines",))
def octree_wireframe(
    tree: LinearOctree,
    grid_origin,
    voxel_size,
    view_proj=None,
    margin: float = 50.0,
    max_lines: int = 1 << 20,
):
    """Line segments f32[max_lines, 2, 3] + count for visible leaves."""
    active = tree.is_leaf
    if view_proj is not None:
        active = active & visible_node_mask(
            tree, jnp.asarray(grid_origin, jnp.float32), voxel_size, view_proj, margin
        )
    idx, count = compact_indices(active, max(max_lines // 12, 1))
    base = (
        jnp.asarray(grid_origin, jnp.float32)[None, :]
        + jnp.stack([tree.x[idx], tree.y[idx], tree.z[idx]], -1).astype(jnp.float32)
        * voxel_size
    )
    w = tree.size[idx].astype(jnp.float32)[:, None] * voxel_size
    corners = base[:, None, :] + jnp.asarray(_CORNERS)[None, :, :] * w[:, None, :]
    segs = corners[:, jnp.asarray(_EDGES)]  # [N, 12, 2, 3]
    segs = segs.reshape(-1, 2, 3)
    n_lines = count * 12
    valid = jnp.arange(segs.shape[0]) < n_lines
    segs = jnp.where(valid[:, None, None], segs, 0.0)
    return segs, n_lines
