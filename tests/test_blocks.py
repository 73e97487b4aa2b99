"""Voxel block renderer vs oracle."""

import numpy as np
import pytest

from ray_tracing_octrees_tpu.core.grid import VoxelGrid, make_sphere_grid
from ray_tracing_octrees_tpu.core.octree import build_linear_octree
from ray_tracing_octrees_tpu.ops.blocks import (
    extract_block_faces,
    count_block_triangles,
)

from tests.oracles import OracleGrid, render_octree_blocks


def tri_key(v, n):
    return (tuple(np.round(v.reshape(-1), 5)), tuple(np.round(n, 5)))


@pytest.mark.parametrize("dims_zyx", [(4, 4, 4), (6, 5, 7), (8, 8, 8)])
def test_blocks_match_oracle(rng, dims_zyx):
    occ = (rng.random(dims_zyx) < 0.45).astype(np.uint8)
    g = VoxelGrid.create(occ, origin=(-2.0, 1.0, 4.0), voxel_size=0.5)
    tree = build_linear_octree(occ)
    verts, normals, count = extract_block_faces(g, tree, max_triangles=20000)
    verts, normals, count = np.asarray(verts), np.asarray(normals), int(count)

    oracle = OracleGrid(occ, np.array([-2.0, 1.0, 4.0], np.float32), 0.5)
    ref = render_octree_blocks(oracle)
    assert count == len(ref)
    ours = sorted(tri_key(verts[i], normals[i]) for i in range(count))
    theirs = sorted(tri_key(v, n) for v, n in ref)
    assert ours == theirs


def test_single_voxel_emits_all_six_faces():
    occ = np.zeros((3, 3, 3), np.uint8)
    occ[1, 1, 1] = 1
    g = VoxelGrid.create(occ)
    tree = build_linear_octree(occ)
    verts, normals, count = extract_block_faces(g, tree, max_triangles=64)
    assert int(count) == 12  # 6 faces * 2 triangles
    assert int(count_block_triangles(g, tree)) == 12


def test_fully_solid_grid_emits_boundary_only():
    occ = np.ones((4, 4, 4), np.uint8)
    g = VoxelGrid.create(occ)
    tree = build_linear_octree(occ)
    # One solid leaf (the root): all 6 faces exposed via out-of-bounds probes.
    verts, normals, count = extract_block_faces(g, tree, max_triangles=64)
    assert int(count) == 12


def test_node_mask_culls():
    occ = np.zeros((4, 4, 4), np.uint8)
    occ[0, 0, 0] = 1
    occ[3, 3, 3] = 1
    tree = build_linear_octree(occ)
    g = VoxelGrid.create(occ)
    _, _, full = extract_block_faces(g, tree, max_triangles=64)
    assert int(full) == 24
    # mask out nodes whose x-extent is beyond 2 -> only the low-corner voxel
    mask = np.asarray(tree.x) < 2
    _, _, masked = extract_block_faces(g, tree, 64, node_mask=mask)
    assert int(masked) == 12


def test_sphere_blocks():
    g = make_sphere_grid(16)
    tree = build_linear_octree(g.occ)
    cap = int(count_block_triangles(g, tree)) + 8
    verts, normals, count = extract_block_faces(g, tree, max_triangles=cap)
    count = int(count)
    assert count > 100
    v = np.asarray(verts)[:count]
    assert v.min() >= -0.5 - 1e-6 and v.max() <= 0.5 + 1e-6
    n = np.asarray(normals)[:count]
    assert set(np.abs(n).sum(axis=-1).tolist()) == {1.0}
