"""Core grid, sphere generator, recentering, and cache IO tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from ray_tracing_octrees_tpu.core.grid import (
    VoxelGrid,
    generate_test_volume,
    make_sphere_grid,
    recenter_filled_voxels,
    building_center,
)
from ray_tracing_octrees_tpu.core.cache import (
    save_voxel_grid,
    load_voxel_grid,
    load_voxel_grid_partial,
)


def reference_sphere_volume(dim):
    """Direct scalar port of generateTestVolume (main.cpp:337-372)."""
    vol = np.empty((dim, dim, dim), np.float32)
    c = 0.5 * (dim - 1)
    r_outer = 0.4 * dim
    r_inner = 0.2 * dim
    zz, yy, xx = np.meshgrid(
        np.arange(dim), np.arange(dim), np.arange(dim), indexing="ij"
    )
    dist = np.sqrt(
        (xx - c) ** 2.0 + (yy - c) ** 2.0 + (zz - c) ** 2.0
    )
    vol = np.where((dist < r_inner) | (dist > r_outer), -1.0, 1.0).astype(np.float32)
    return vol


@pytest.mark.parametrize("dim", [16, 33, 64])
def test_sphere_volume_matches_reference(dim):
    ours = np.asarray(generate_test_volume(dim, dim, dim))
    ref = reference_sphere_volume(dim)
    assert ours.shape == (dim, dim, dim)
    np.testing.assert_array_equal(ours, ref)


def test_sphere_grid_setup():
    g = make_sphere_grid(32)
    assert g.dims_xyz == (32, 32, 32)
    np.testing.assert_allclose(np.asarray(g.origin), [-0.5, -0.5, -0.5])
    assert np.isclose(float(g.voxel_size), 1.0 / 32)
    occ = np.asarray(g.occ)
    assert occ.sum() > 0
    # filled voxels lie in the shell [0.2*dim, 0.4*dim]
    c = 0.5 * (32 - 1)
    zz, yy, xx = np.nonzero(occ)
    dist = np.sqrt((xx - c) ** 2 + (yy - c) ** 2 + (zz - c) ** 2)
    assert dist.min() >= 0.2 * 32 - 1e-4
    assert dist.max() <= 0.4 * 32 + 1e-4


def test_sample_safe_out_of_bounds():
    g = VoxelGrid.create(np.ones((2, 3, 4), np.uint8))
    assert int(g.sample_safe(0, 0, 0)) == 1
    assert int(g.sample_safe(-1, 0, 0)) == 0
    assert int(g.sample_safe(4, 0, 0)) == 0
    assert int(g.sample_safe(0, 3, 0)) == 0
    assert int(g.sample_safe(0, 0, 2)) == 0
    assert float(g.scalar_field_safe(0, 0, 0)) == -1.0
    assert float(g.scalar_field_safe(9, 9, 9)) == 1.0


def test_recenter(rng):
    occ = np.zeros((8, 8, 8), np.uint8)
    occ[2:5, 1:4, 3:7] = 1  # z in [2,4], y in [1,3], x in [3,6]
    g = VoxelGrid.create(occ, origin=(10.0, 20.0, 30.0), voxel_size=2.0)
    g2 = recenter_filled_voxels(g)
    # Center of filled voxel centers:
    # x centers: 10 + (3+0.5)*2 .. 10+(6+0.5)*2 -> [17, 23], center 20
    # y centers: 20 + (1.5)*2 .. 20+(3.5)*2 -> [23, 27], center 25
    # z centers: 30 + (2.5)*2 .. 30+(4.5)*2 -> [35, 39], center 37
    np.testing.assert_allclose(
        np.asarray(g2.origin), [10.0 - 20.0, 20.0 - 25.0, 30.0 - 37.0]
    )
    # Recentered: building center ends up at origin
    np.testing.assert_allclose(np.asarray(building_center(g2)), [0, 0, 0], atol=1e-5)


def test_recenter_empty_grid_noop():
    g = VoxelGrid.create(np.zeros((4, 4, 4), np.uint8), origin=(1.0, 2.0, 3.0))
    g2 = recenter_filled_voxels(g)
    np.testing.assert_allclose(np.asarray(g2.origin), [1.0, 2.0, 3.0])


def test_cache_roundtrip(tmp_path, rng):
    occ = (rng.random((5, 7, 9)) > 0.5).astype(np.uint8)
    g = VoxelGrid.create(occ, origin=(-3.5, 2.25, 0.125), voxel_size=0.75)
    fn = str(tmp_path / "grid.bin")
    assert save_voxel_grid(fn, g)
    g2 = load_voxel_grid(fn)
    np.testing.assert_array_equal(np.asarray(g2.occ), occ)
    np.testing.assert_allclose(np.asarray(g2.origin), [-3.5, 2.25, 0.125])
    assert np.isclose(float(g2.voxel_size), 0.75)


def test_cache_binary_layout(tmp_path):
    """Byte-level check against the reference format (CacheUtils.cpp:14-25)."""
    import struct

    occ = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4) % 2
    g = VoxelGrid.create(occ, origin=(1.0, 2.0, 3.0), voxel_size=0.5)
    fn = str(tmp_path / "grid.bin")
    save_voxel_grid(fn, g)
    raw = open(fn, "rb").read()
    dims = struct.unpack("<iii", raw[:12])
    assert dims == (4, 3, 2)  # dimX, dimY, dimZ
    mins = struct.unpack("<fff", raw[12:24])
    assert mins == (1.0, 2.0, 3.0)
    (vs,) = struct.unpack("<f", raw[24:28])
    assert vs == 0.5
    (count,) = struct.unpack("<Q", raw[28:36])
    assert count == 24
    data = np.frombuffer(raw[36:], np.uint8)
    # x-major: flat index x + y*dimX + z*dimX*dimY
    for z in range(2):
        for y in range(3):
            for x in range(4):
                assert data[x + y * 4 + z * 12] == occ[z, y, x]


def test_partial_zslab_load(tmp_path, rng):
    occ = (rng.random((10, 4, 6)) > 0.5).astype(np.uint8)
    g = VoxelGrid.create(occ, origin=(0.0, 0.0, -5.0), voxel_size=2.0)
    fn = str(tmp_path / "grid.bin")
    save_voxel_grid(fn, g)
    part = load_voxel_grid_partial(fn, start_layer=3, num_layers=4)
    assert part.dims_xyz == (6, 4, 4)
    np.testing.assert_array_equal(np.asarray(part.occ), occ[3:7])
    # minZ shifted by startLayer * voxelSize (CacheUtils.cpp:104)
    np.testing.assert_allclose(np.asarray(part.origin), [0.0, 0.0, -5.0 + 3 * 2.0])
    with pytest.raises(ValueError):
        load_voxel_grid_partial(fn, start_layer=8, num_layers=4)


def test_reference_scene_cache_loads_if_present():
    import os

    path = "/root/reference/sceneCache.bin"
    if not os.path.exists(path):
        pytest.skip("reference scene cache not mounted")
    g = load_voxel_grid(path)
    assert g.dims_xyz == (425, 243, 29)
    np.testing.assert_allclose(np.asarray(g.origin), [-2125.0, -1215.0, -150.0])
    assert np.isclose(float(g.voxel_size), 10.0)
    assert int(np.asarray(g.occ).sum()) > 0


def test_host_fetch_roundtrips_all_dtypes():
    """host_fetch (the aligned-repack device->host path every warm-path
    pull rides) must be value-exact for every dtype it accepts, at
    unaligned shapes."""
    import jax.numpy as jnp
    from ray_tracing_octrees_tpu.core.grid import host_fetch

    rng = np.random.default_rng(11)
    for arr in (
        rng.random((29, 243, 5)).astype(np.float32),
        (rng.random((348409,)) < 0.5),
        rng.integers(0, 255, (1013,)).astype(np.uint8),
        rng.integers(-2**31, 2**31 - 1, (777, 3)).astype(np.int32),
        rng.random((129,)).astype(np.float32).astype(jnp.bfloat16),
    ):
        dev = jnp.asarray(arr)
        out = host_fetch(dev)
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(dev, out.dtype))
    # numpy passthrough
    a = np.arange(5)
    assert host_fetch(a) is a
