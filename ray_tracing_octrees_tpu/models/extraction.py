"""Mesh-extraction pipelines: Marching Cubes and Voxel Blocks.

These are the model-level equivalents of ``MarchingCubesRenderer``
(Renderer.cpp:14-36) and ``VoxelCubeRenderer`` (Renderer.cpp:40-168) driven
by ``renderOctree`` (main.cpp:95-208): extraction with optional frustum
culling, returning a bounded triangle soup (verts, normals, count).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_octrees_tpu.config import EngineConfig, DEFAULT_CONFIG
from ray_tracing_octrees_tpu.core.grid import VoxelGrid
from ray_tracing_octrees_tpu.core.octree import LinearOctree, build_linear_octree
from ray_tracing_octrees_tpu.ops.marching_cubes import (
    marching_cubes_grid,
    count_mc_triangles,
)
from ray_tracing_octrees_tpu.ops.blocks import (
    extract_block_faces,
    count_block_triangles,
)
from ray_tracing_octrees_tpu.render.frustum import (
    visible_cell_mask,
    visible_node_mask,
)


@dataclasses.dataclass
class MarchingCubesRenderer:
    """Dense table-driven MC with cell-level frustum culling.

    The reference culls octree subtrees with margin 50 then runs localMC per
    leaf (main.cpp:154-189); culling at cell granularity is the array-native
    equivalent and conservative (a superset of surviving cells never drops
    visible geometry).
    """

    config: EngineConfig = DEFAULT_CONFIG
    max_triangles: Optional[int] = None

    def render(self, grid: VoxelGrid, view_proj=None):
        cap = self.max_triangles or self.config.max_triangles
        mask = None
        if view_proj is not None:
            mask = visible_cell_mask(
                grid.occ.shape,
                grid.origin,
                grid.voxel_size,
                view_proj,
                self.config.extraction_frustum_margin,
            )
        return marching_cubes_grid(grid, cap, cell_mask=mask)

    def count(self, grid: VoxelGrid):
        return count_mc_triangles(grid)


@dataclasses.dataclass
class VoxelBlockRenderer:
    """Exposed-face extraction over solid octree leaves with node culling."""

    config: EngineConfig = DEFAULT_CONFIG
    max_triangles: Optional[int] = None

    def render(self, grid: VoxelGrid, tree: LinearOctree, view_proj=None):
        cap = self.max_triangles or self.config.max_triangles
        mask = None
        if view_proj is not None:
            mask = visible_node_mask(
                tree,
                grid.origin,
                grid.voxel_size,
                view_proj,
                self.config.extraction_frustum_margin,
            )
        return extract_block_faces(grid, tree, cap, node_mask=mask)

    def count(self, grid: VoxelGrid, tree: LinearOctree):
        return count_block_triangles(grid, tree)
