"""Marching cubes: table validity, oracle bit-match, topology invariants."""

import numpy as np
import pytest

from ray_tracing_octrees_tpu.core.grid import VoxelGrid, make_sphere_grid
from ray_tracing_octrees_tpu.ops.mc_tables import EDGE_TABLE, TRI_TABLE, TRI_COUNTS
from ray_tracing_octrees_tpu.ops.marching_cubes import (
    marching_cubes_grid,
    marching_cubes_volume,
    count_mc_triangles,
)

from tests.oracles import OracleGrid, render_octree_mc


def canonical_edge_table_head():
    return [0x0, 0x109, 0x203, 0x30A, 0x406, 0x50F, 0x605, 0x70C,
            0x80C, 0x905, 0xA0F, 0xB06, 0xC0A, 0xD03, 0xE09, 0xF00]


def test_edge_table_matches_canonical_head():
    assert list(EDGE_TABLE[:16]) == canonical_edge_table_head()
    assert EDGE_TABLE[255] == 0 and EDGE_TABLE[0] == 0


def test_tables_complement_symmetry():
    # Complementary cases triangulate the same edge set (the triangulations
    # themselves differ — Bourke's table picks different diagonals, so the
    # per-case triangle counts are NOT symmetric).
    for c in range(256):
        assert EDGE_TABLE[c] == EDGE_TABLE[255 - c]
        assert 0 <= TRI_COUNTS[c] <= 5


def tri_set(verts: np.ndarray, count: int):
    """Multiset of triangles as sorted tuples of rounded vertex coords."""
    out = []
    for i in range(count):
        tri = verts[i]
        pts = sorted(tuple(np.round(p, 5)) for p in tri)
        out.append(tuple(map(tuple, pts)))
    return sorted(out)


def run_ours(occ, origin=(0.0, 0.0, 0.0), voxel_size=1.0, cap=200000):
    g = VoxelGrid.create(occ, origin=origin, voxel_size=voxel_size)
    verts, normals, count = marching_cubes_grid(g, cap)
    return np.asarray(verts), np.asarray(normals), int(count)


@pytest.mark.parametrize("dims_zyx", [(4, 4, 4), (6, 5, 7), (8, 8, 8)])
def test_matches_oracle_random(rng, dims_zyx):
    occ = (rng.random(dims_zyx) < 0.4).astype(np.uint8)
    verts, normals, count = run_ours(occ, origin=(-1.0, 2.0, 0.5), voxel_size=0.25)
    oracle = OracleGrid(occ, np.array([-1.0, 2.0, 0.5], np.float32), 0.25)
    ref = render_octree_mc(oracle)
    assert count == len(ref)
    ours_set = tri_set(verts, count)
    ref_verts = np.stack([t[0] for t in ref]) if ref else np.zeros((0, 3, 3))
    ref_set = tri_set(ref_verts, len(ref))
    assert ours_set == ref_set


def test_matches_oracle_near_exact_floats(rng):
    """Vertex coordinates match the oracle to float32 rounding (<= 1 ulp).

    XLA fuses a*b+c into FMA, so exact bit equality with the NumPy oracle
    (or the MSVC-built reference) is not attainable; the algorithmic
    expressions are identical and agree to ~1e-7 relative.
    """
    occ = (rng.random((5, 5, 5)) < 0.5).astype(np.uint8)
    verts, _, count = run_ours(occ, origin=(-3.7, 11.1, 0.9), voxel_size=1.7)
    oracle = OracleGrid(occ, np.array([-3.7, 11.1, 0.9], np.float32), 1.7)
    ref = render_octree_mc(oracle)
    assert count == len(ref)
    ours = np.array(sorted(tuple(np.asarray(verts[i]).reshape(-1)) for i in range(count)))
    theirs = np.array(sorted(tuple(t[0].reshape(-1)) for t in ref))
    np.testing.assert_allclose(ours, theirs, atol=2e-6, rtol=1e-6)


def test_single_voxel_cube():
    occ = np.zeros((3, 3, 3), np.uint8)
    occ[1, 1, 1] = 1
    verts, normals, count = run_ours(occ)
    # One isolated interior voxel: all 8 cells around it contribute;
    # classic MC produces 8 corner triangles (one per surrounding cell).
    assert count == 8
    # surface must be closed: every edge appears exactly twice
    assert_watertight(np.asarray(verts), count)


def assert_watertight(verts, count):
    from collections import Counter

    edges = Counter()
    for i in range(count):
        tri = [tuple(np.round(p, 5)) for p in verts[i]]
        for a, b in ((0, 1), (1, 2), (2, 0)):
            edges[(tri[a], tri[b])] += 1
    # each directed edge appears once, and its reverse exactly once
    for (a, b), c in edges.items():
        assert c == 1, f"duplicate directed edge {a}->{b}"
        assert edges.get((b, a), 0) == 1, f"unmatched edge {a}->{b}"


def test_watertight_random_interior(rng):
    """Random blob strictly inside the grid -> closed oriented surface."""
    occ = np.zeros((10, 10, 10), np.uint8)
    occ[2:8, 2:8, 2:8] = (rng.random((6, 6, 6)) < 0.5).astype(np.uint8)
    verts, _, count = run_ours(occ)
    if count:
        assert_watertight(np.asarray(verts), count)


def test_sphere_counts_and_normals():
    g = make_sphere_grid(32)
    total = int(count_mc_triangles(g))
    verts, normals, count = marching_cubes_grid(g, max_triangles=total + 16)
    assert int(count) == total and total > 1000
    verts = np.asarray(verts)[:count]
    normals = np.asarray(normals)[:count]
    # normals are unit length
    np.testing.assert_allclose(np.linalg.norm(normals, axis=-1), 1.0, atol=1e-5)
    # mesh bounded by grid AABB
    assert verts.min() >= -0.5 - 1e-6 and verts.max() <= 0.5 + 1e-6
    assert_watertight(verts, count)


def test_truncation_by_capacity():
    g = make_sphere_grid(16)
    total = int(count_mc_triangles(g))
    cap = total // 2
    verts, _, count = marching_cubes_grid(g, max_triangles=cap)
    assert int(count) == cap


def test_volume_mc_interpolates():
    """Smooth SDF sphere: vertices should sit near the iso surface."""
    dim = 24
    idx = np.arange(dim, dtype=np.float32)
    c = 0.5 * (dim - 1)
    zz, yy, xx = np.meshgrid(idx, idx, idx, indexing="ij")
    field = np.sqrt((xx - c) ** 2 + (yy - c) ** 2 + (zz - c) ** 2) - 7.0
    verts, normals, count = marching_cubes_volume(
        field, origin=(0, 0, 0), spacing=1.0, iso=0.0, max_triangles=20000
    )
    count = int(count)
    assert count > 100
    v = np.asarray(verts)[:count].reshape(-1, 3)
    r = np.linalg.norm(v - c, axis=-1)
    np.testing.assert_allclose(r, 7.0, atol=0.6)  # within one cell
