"""Dual contouring vs scalar oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from ray_tracing_octrees_tpu.core.grid import VoxelGrid, make_sphere_grid
from ray_tracing_octrees_tpu.core.octree import build_linear_octree
from ray_tracing_octrees_tpu.ops.dual_contouring import (
    dual_contour_uniform,
    adaptive_dual_contouring,
    cell_contains_surface,
    edge_hermite,
)

from tests.oracles import OracleGrid
from tests import dc_oracle


def assert_tri_sets_close(verts, normals, count, ref, atol=1e-3):
    """Greedy nearest matching between triangle multisets (order-free).

    Rounding-based multiset keys are fragile at exact float halves
    (f32 0.40625 vs f64 0.40625 round to different 4-digit strings), so
    match each of our triangles to its nearest unused oracle triangle and
    bound the worst vertex/normal deviation.
    """
    assert count == len(ref), (count, len(ref))
    if count == 0:
        return
    ours_v = np.asarray(verts[:count], np.float64).reshape(count, 9)
    ours_n = np.asarray(normals[:count], np.float64).reshape(count, 3)
    ref_v = np.stack([np.asarray(t[0], np.float64).reshape(9) for t in ref])
    ref_n = np.stack([np.asarray(t[1], np.float64).reshape(3) for t in ref])
    used = np.zeros(count, bool)
    for i in range(count):
        d = np.abs(ref_v - ours_v[i]).max(axis=1)
        d[used] = np.inf
        j = int(d.argmin())
        used[j] = True
        assert d[j] < atol, f"triangle {i}: nearest oracle match off by {d[j]}"
        nd = np.abs(ref_n[j] - ours_n[i]).max()
        assert nd < atol, f"triangle {i}: normal off by {nd}"


def make(occ, origin=(0.0, 0.0, 0.0), vs=1.0):
    g = VoxelGrid.create(occ, origin=origin, voxel_size=vs)
    og = OracleGrid(np.asarray(occ, np.uint8), np.asarray(origin, np.float32), vs)
    return g, og


def test_edge_hermite_matches_oracle(rng):
    occ = (rng.random((6, 6, 6)) < 0.5).astype(np.uint8)
    g, og = make(occ, origin=(-1.0, 0.5, 2.0), vs=0.5)
    for axis, ax in ((0, (1, 0, 0)), (1, (0, 1, 0)), (2, (0, 0, 1))):
        for _ in range(50):
            x, y, z = rng.integers(0, 5, 3)
            crossing, pos, n = edge_hermite(
                g, jnp.int32(x), jnp.int32(y), jnp.int32(z), axis
            )
            f1 = og.occ[z, y, x] == 1
            f2 = og.occ[z + ax[2], y + ax[1], x + ax[0]] == 1
            assert bool(crossing) == (f1 != f2)
            if crossing:
                ref_pos, ref_n = dc_oracle.calculate_intersection(
                    og, x, y, z, x + ax[0], y + ax[1], z + ax[2]
                )
                np.testing.assert_allclose(np.asarray(pos), ref_pos, atol=1e-5)
                np.testing.assert_allclose(np.asarray(n), ref_n, atol=1e-5)


@pytest.mark.parametrize("dims", [(4, 4, 4), (6, 5, 7)])
def test_uniform_dc_matches_oracle(rng, dims):
    occ = (rng.random(dims) < 0.4).astype(np.uint8)
    g, og = make(occ, origin=(-2.0, 1.0, 0.0), vs=0.5)
    verts, normals, count = dual_contour_uniform(g, max_cells=2048, max_triangles=8192)
    count = int(count)
    ref = dc_oracle.uniform_dc(og)
    assert_tri_sets_close(verts, normals, count, ref)


def test_uniform_dc_sphere_sanity():
    g = make_sphere_grid(16)
    verts, normals, count = dual_contour_uniform(
        g, max_cells=8192, max_triangles=32768
    )
    count = int(count)
    assert count > 200
    v = np.asarray(verts)[:count]
    # dual vertices live inside cells -> mesh within grid AABB
    assert v.min() >= -0.5 - 1e-5 and v.max() <= 0.5 + 1e-5
    n = np.asarray(normals)[:count]
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)


def test_cell_contains_surface_matches_oracle(rng):
    occ = (rng.random((8, 8, 8)) < 0.3).astype(np.uint8)
    g, og = make(occ)
    for size in (1, 2, 4, 8):
        coords = rng.integers(-2, 9, size=(40, 3))
        got = cell_contains_surface(
            g,
            jnp.asarray(coords[:, 0], jnp.int32),
            jnp.asarray(coords[:, 1], jnp.int32),
            jnp.asarray(coords[:, 2], jnp.int32),
            size,
        )
        for i, (cx, cy, cz) in enumerate(coords):
            ref = dc_oracle.cell_contains_surface(og, int(cx), int(cy), int(cz), size)
            assert bool(got[i]) == ref, (size, cx, cy, cz)


@pytest.mark.parametrize("dims", [(8, 8, 8), (6, 9, 5)])
def test_adaptive_dc_matches_oracle(rng, dims):
    occ = (rng.random(dims) < 0.35).astype(np.uint8)
    g, og = make(occ, origin=(1.0, -1.0, 3.0), vs=0.25)
    tree = build_linear_octree(occ)
    verts, normals, count = adaptive_dual_contouring(g, tree)
    ref = dc_oracle.adaptive_dc(og)
    assert_tri_sets_close(verts, normals, count, ref)


def test_adaptive_dc_sphere_sanity():
    g = make_sphere_grid(16)
    tree = build_linear_octree(g.occ)
    verts, normals, count = adaptive_dual_contouring(g, tree)
    assert count > 100
    v = np.asarray(verts)[:count]
    assert np.isfinite(v).all()
    n = np.asarray(normals)[:count]
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)


def test_adaptive_dc_node_id_volume_paths_match(rng):
    """id-volume neighbor lookups, tree_meta, and device_out must all
    reproduce the baseline extraction exactly (same triangles, same
    order)."""
    from ray_tracing_octrees_tpu.core.octree import build_node_id_volume
    from ray_tracing_octrees_tpu.ops.dual_contouring import tree_host_meta

    occ = (rng.random((9, 7, 8)) < 0.35).astype(np.uint8)
    g, _ = make(occ, origin=(0.5, -2.0, 1.0), vs=0.5)
    tree = build_linear_octree(occ)
    v0, n0, c0 = adaptive_dual_contouring(g, tree)

    id_vol = build_node_id_volume(tree)
    meta = tree_host_meta(tree)
    v1, n1, c1 = adaptive_dual_contouring(
        g, tree, node_id_vol=id_vol, tree_meta=meta
    )
    assert int(c1) == int(c0)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n0))

    v2, n2, c2 = adaptive_dual_contouring(
        g, tree, node_id_vol=id_vol, tree_meta=meta, device_out=True
    )
    assert int(c2) == int(c0)
    # bucketed device output: first count rows match, the rest are zero
    np.testing.assert_array_equal(np.asarray(v2)[: int(c0)], np.asarray(v0))
    np.testing.assert_array_equal(np.asarray(n2)[: int(c0)], np.asarray(n0))
    assert not np.asarray(v2)[int(c0):].any()
