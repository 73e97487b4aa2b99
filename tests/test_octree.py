"""Linear octree vs the pointer-octree oracle."""

import numpy as np
import pytest

from ray_tracing_octrees_tpu.core.grid import VoxelGrid, make_sphere_grid
from ray_tracing_octrees_tpu.core.octree import (
    build_pyramid,
    build_linear_octree,
    padded_cube_size,
    pack_key,
)

from tests.oracles import OracleGrid, build_octree, bfs_flatten


def random_grid(rng, dims_zyx, p=0.3):
    occ = (rng.random(dims_zyx) < p).astype(np.uint8)
    return occ


@pytest.mark.parametrize(
    "dims_zyx", [(4, 4, 4), (8, 8, 8), (5, 7, 3), (16, 9, 12)]
)
def test_linear_octree_matches_oracle_bfs(rng, dims_zyx):
    occ = random_grid(rng, dims_zyx)
    tree = build_linear_octree(occ)
    oracle = OracleGrid(occ, np.zeros(3, np.float32), 1.0)
    root, node_map = build_octree(oracle)
    flat = bfs_flatten(root)

    assert tree.num_nodes == len(flat)
    xs = np.asarray(tree.x)
    ys = np.asarray(tree.y)
    zs = np.asarray(tree.z)
    sizes = np.asarray(tree.size)
    leaf = np.asarray(tree.is_leaf)
    solid = np.asarray(tree.is_solid)
    unif = np.asarray(tree.is_uniform)
    children = np.asarray(tree.children)
    for i, ref in enumerate(flat):
        assert (xs[i], ys[i], zs[i], sizes[i]) == (
            ref["x"],
            ref["y"],
            ref["z"],
            ref["size"],
        ), f"node {i} coords mismatch"
        assert leaf[i] == ref["is_leaf"], f"node {i} leaf mismatch"
        assert solid[i] == ref["is_solid"], f"node {i} solid mismatch"
        assert unif[i] == ref["is_uniform"], f"node {i} uniform mismatch"
        assert children[i].tolist() == ref["children"], f"node {i} children mismatch"


def test_node_map_deepest_wins(rng):
    occ = random_grid(rng, (8, 8, 8), p=0.4)
    tree = build_linear_octree(occ)
    oracle = OracleGrid(occ, np.zeros(3, np.float32), 1.0)
    root, node_map = build_octree(oracle)

    # Every oracle map entry resolves to the same (deepest) node.
    xs = np.asarray(tree.x)
    ys = np.asarray(tree.y)
    zs = np.asarray(tree.z)
    sizes = np.asarray(tree.size)
    for key, node in node_map.items():
        x, y, z = key >> 20, (key >> 10) & 1023, key & 1023
        idx = int(tree.find_node(x, y, z))
        assert idx >= 0
        assert (xs[idx], ys[idx], zs[idx]) == (node.x, node.y, node.z)
        assert sizes[idx] == node.size

    # Missing key -> -1
    assert int(tree.find_node(999, 999, 999)) == -1


def test_pyramid_uniformity(rng):
    occ = random_grid(rng, (6, 10, 7), p=0.25)
    pyr = build_pyramid(occ)
    s = padded_cube_size(7, 10, 6)
    assert pyr.root_size == s
    # level 0 == occupancy
    np.testing.assert_array_equal(np.asarray(pyr.any_levels[0]), occ > 0)
    # Check an arbitrary level against brute force (with virtual padding)
    pad = np.zeros((s, s, s), bool)
    pad[:6, :10, :7] = occ > 0
    for k in range(1, pyr.num_levels):
        cs = 1 << k
        n = s // cs
        brute_any = pad.reshape(n, cs, n, cs, n, cs).any(axis=(1, 3, 5))
        brute_all = pad.reshape(n, cs, n, cs, n, cs).all(axis=(1, 3, 5))
        got_any = np.asarray(pyr.any_levels[k])
        got_all = np.asarray(pyr.all_levels[k])
        gz, gy, gx = got_any.shape
        np.testing.assert_array_equal(got_any, brute_any[:gz, :gy, :gx])
        np.testing.assert_array_equal(got_all, brute_all[:gz, :gy, :gx])
        # virtually padded region must be all-empty
        assert not brute_any[gz:].any() and not brute_any[:, gy:].any() and not brute_any[:, :, gx:].any()


def test_octree_partition_invariants(rng):
    """Children tile the parent exactly; uniform => leaf."""
    occ = random_grid(rng, (8, 8, 8), p=0.35)
    tree = build_linear_octree(occ)
    xs, ys, zs = np.asarray(tree.x), np.asarray(tree.y), np.asarray(tree.z)
    sizes = np.asarray(tree.size)
    leaf = np.asarray(tree.is_leaf)
    unif = np.asarray(tree.is_uniform)
    children = np.asarray(tree.children)
    assert (unif == leaf).all()  # builder never makes non-uniform leaves
    for i in range(tree.num_nodes):
        if leaf[i]:
            assert (children[i] == -1).all()
            continue
        half = sizes[i] // 2
        for ci in range(8):
            c = children[i, ci]
            assert c >= 0
            ox = xs[i] + (half if (ci & 1) else 0)
            oy = ys[i] + (half if (ci & 2) else 0)
            oz = zs[i] + (half if (ci & 4) else 0)
            assert (xs[c], ys[c], zs[c], sizes[c]) == (ox, oy, oz, half)


def test_sphere_octree_scales():
    g = make_sphere_grid(32)
    tree = build_linear_octree(g.occ)
    assert tree.num_nodes > 100
    assert int(np.asarray(tree.size)[0]) == 32  # root covers the cube
    # solid leaves cover exactly the filled voxel count
    leaf = np.asarray(tree.is_leaf)
    solid = np.asarray(tree.is_solid)
    sizes = np.asarray(tree.size)
    covered = (sizes[leaf & solid].astype(np.int64) ** 3).sum()
    assert covered == int(np.asarray(g.occ).astype(np.int64).sum())


def test_get_neighbors_matches_oracle(rng):
    from ray_tracing_octrees_tpu.core.octree import get_neighbors
    from tests.oracles import build_key

    occ = random_grid(rng, (8, 8, 8), p=0.4)
    tree = build_linear_octree(occ)
    oracle = OracleGrid(occ, np.zeros(3, np.float32), 1.0)
    root, node_map = build_octree(oracle)

    xs, ys, zs = np.asarray(tree.x), np.asarray(tree.y), np.asarray(tree.z)
    sizes = np.asarray(tree.size)
    nb = np.asarray(get_neighbors(tree, np.arange(tree.num_nodes)))
    for i in range(tree.num_nodes):
        s = sizes[i]
        for j, (dx, dy, dz) in enumerate(
            ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1))
        ):
            key = build_key(xs[i] + dx * s, ys[i] + dy * s, zs[i] + dz * s)
            ref = node_map.get(key)
            if ref is None:
                assert nb[i, j] == -1
            else:
                k = nb[i, j]
                assert k >= 0
                assert (xs[k], ys[k], zs[k]) == (ref.x, ref.y, ref.z)


def test_find_node_vol_matches_binary_search():
    """build_node_id_volume + find_node_vol == LinearOctree.find_node on
    every in-cube corner (leaf corners, interior corners, and random
    non-anchored coordinates)."""
    import jax.numpy as jnp

    from ray_tracing_octrees_tpu.core.octree import (
        build_linear_octree,
        build_node_id_volume,
        find_node_vol,
    )

    rng = np.random.default_rng(7)
    occ = (rng.random((16, 16, 16)) < 0.3).astype(np.uint8)
    tree = build_linear_octree(occ)
    id_vol = build_node_id_volume(tree)
    S = id_vol.shape[0]

    # all node corners + random coords (anchored and not)
    xs = np.concatenate([np.asarray(tree.x), rng.integers(0, S, 500)])
    ys = np.concatenate([np.asarray(tree.y), rng.integers(0, S, 500)])
    zs = np.concatenate([np.asarray(tree.z), rng.integers(0, S, 500)])
    xj = jnp.asarray(xs, jnp.int32)
    yj = jnp.asarray(ys, jnp.int32)
    zj = jnp.asarray(zs, jnp.int32)
    ref = np.asarray(tree.find_node(xj, yj, zj))
    got = np.asarray(find_node_vol(tree, id_vol, xj, yj, zj))
    np.testing.assert_array_equal(got, ref)
