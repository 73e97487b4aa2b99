"""View-frustum plane extraction and AABB classification.

Array port of ``Frustum`` (Frustum.cpp:5-93): Gribb-Hartmann plane
extraction from the combined view-projection matrix and the p/n-vertex
AABB test returning -1 (outside) / 0 (intersecting) / 1 (inside), with the
reference's inflate margin. ``classify_nodes`` applies the test to the
whole linear-octree node array at once — replacing all three per-renderer
CPU culling loops (main.cpp:154-189, RayTracerBVH.cpp:743-762,
VolumeRaycastRenderer.cpp:1367-1481).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def frustum_planes(view_proj) -> jax.Array:
    """Six normalized planes [6, 4] (L, R, B, T, N, F) from row-major VP.

    The reference indexes glm column-major (viewProj[c][r]); with row-major
    M this is rows: left = row3 + row0, right = row3 - row0, etc.
    """
    m = jnp.asarray(view_proj, jnp.float32)
    r0, r1, r2, r3 = m[0], m[1], m[2], m[3]
    planes = jnp.stack(
        [r3 + r0, r3 - r0, r3 + r1, r3 - r1, r3 + r2, r3 - r2], axis=0
    )
    norm = jnp.linalg.norm(planes[:, :3], axis=-1, keepdims=True)
    return planes / jnp.maximum(norm, 1e-30)


def test_aabb(planes, box_min, box_max, margin=0.0) -> jax.Array:
    """Classify AABBs: 1 inside, 0 intersecting, -1 outside.

    Vectorized over leading box dims; matches Frustum::testAABB
    (Frustum.cpp:52-93) including the expansion margin.
    """
    box_min = jnp.asarray(box_min, jnp.float32) - margin
    box_max = jnp.asarray(box_max, jnp.float32) + margin
    n_xyz = planes[:, :3]  # [6, 3]
    d = planes[:, 3]  # [6]
    pos = n_xyz > 0  # [6, 3]
    # p-vertex: furthest along the normal; n-vertex: nearest.
    p = jnp.where(pos, box_max[..., None, :], box_min[..., None, :])  # [..., 6, 3]
    n = jnp.where(pos, box_min[..., None, :], box_max[..., None, :])
    p_dist = (p * n_xyz).sum(-1) + d  # [..., 6]
    n_dist = (n * n_xyz).sum(-1) + d
    outside = (p_dist < 0).any(-1)
    intersecting = (n_dist < 0).any(-1)
    return jnp.where(outside, -1, jnp.where(intersecting, 0, 1)).astype(jnp.int32)


def classify_nodes(tree, grid_origin, voxel_size, view_proj, margin) -> jax.Array:
    """Frustum result per octree node ([N] in {-1, 0, 1})."""
    planes = frustum_planes(view_proj)
    lo, hi = tree.world_bounds(jnp.asarray(grid_origin, jnp.float32), voxel_size)
    return test_aabb(planes, lo, hi, margin)


def visible_node_mask(tree, grid_origin, voxel_size, view_proj, margin) -> jax.Array:
    """Boolean visibility (not fully outside) per node."""
    return classify_nodes(tree, grid_origin, voxel_size, view_proj, margin) >= 0


def visible_cell_mask(dims_zyx, grid_origin, voxel_size, view_proj, margin):
    """Per-MC-cell visibility mask bool[Z-1, Y-1, X-1].

    Cell (x, y, z) spans world [origin + p*vs, origin + (p+1)*vs] over its
    8 lattice corners; used to fold frustum culling into the dense MC/DC
    passes at cell granularity (conservative vs the reference's leaf-level
    culling: never drops a visible triangle).
    """
    dz, dy, dx = dims_zyx
    planes = frustum_planes(view_proj)
    origin = jnp.asarray(grid_origin, jnp.float32)
    xs = origin[0] + jnp.arange(dx - 1, dtype=jnp.float32) * voxel_size
    ys = origin[1] + jnp.arange(dy - 1, dtype=jnp.float32) * voxel_size
    zs = origin[2] + jnp.arange(dz - 1, dtype=jnp.float32) * voxel_size
    lo = jnp.stack(
        jnp.meshgrid(zs, ys, xs, indexing="ij")[::-1], axis=-1
    )  # [Z-1, Y-1, X-1, 3] (x, y, z)
    hi = lo + voxel_size
    return test_aabb(planes, lo, hi, margin) >= 0
