"""CSV ingest, voxelization (NumPy / dense JAX / native C++) equivalence."""

import io
import numpy as np
import pytest

from ray_tracing_octrees_tpu.ingest.csv_loader import (
    load_csv_vertices,
    load_csv_faces,
    assemble_triangles,
)
from ray_tracing_octrees_tpu.ingest.voxelize import (
    voxelize_triangles,
    voxelize_triangles_dense,
    grid_geometry,
    point_in_triangle,
)


VERTS_CSV = """mesh,vertex,easting,northing,elevation,lat,lon,elevmin
0, 0, 0.0, 0.0, 0.0, 51.0, -114.0, 0.0
0, 1, 10.0, 0.0, 0.0, 51.0, -114.0, 0.0
0, 2, 0.0, 10.0, 0.0, 51.0, -114.0, 0.0
0, 3, 0.0, 0.0, 10.0, 51.0, -114.0, 0.0
1, 0, 20.0, 20.0, 5.0, 51.0, -114.0, 0.0
garbage line that should be skipped
1, 1, 30.0, 20.0, 5.0, 51.0, -114.0, bad_number
"""

FACES_CSV = """mesh,v1,v2,v3
0, 0, 1, 2
0, 0, 1, 3
1, 0, 1, 99
short,row
"""


def test_csv_parsing_with_error_recovery():
    v = load_csv_vertices(io.StringIO(VERTS_CSV))
    assert v.shape == (5, 8)  # bad lines dropped
    f = load_csv_faces(io.StringIO(FACES_CSV))
    assert f.shape == (3, 4)
    tris, kept = assemble_triangles(v, f)
    # face referencing missing vertex 99 of mesh 1 is dropped
    assert tris.shape == (2, 3, 3)
    assert kept.tolist() == [True, True, False]


def test_point_in_triangle():
    a = np.array([0.0, 0, 0])
    b = np.array([1.0, 0, 0])
    c = np.array([0.0, 1, 0])
    assert bool(point_in_triangle(np.array([0.25, 0.25, 0.0]), a, b, c))
    assert not bool(point_in_triangle(np.array([0.9, 0.9, 0.0]), a, b, c))
    # the test projects onto the plane: a point above the triangle counts
    assert bool(point_in_triangle(np.array([0.25, 0.25, 5.0]), a, b, c))
    # degenerate triangle -> false
    assert not bool(point_in_triangle(np.array([0.0, 0, 0]), a, a, a))


def test_grid_geometry_auto_coarsen():
    tris = np.array([[[0, 0, 0], [5000.0, 0, 0], [0, 5000.0, 0]]])
    lo, hi, vs, dims = grid_geometry(tris, voxel_size=1.0, max_axis=1000)
    assert max(dims) <= 1001  # ceil after integer-ratio coarsening
    assert vs > 1.0


def square_tris():
    # two triangles covering the unit square at z=0.5, world extent 10
    return np.array(
        [
            [[0.0, 0.0, 5.0], [10.0, 0.0, 5.0], [0.0, 10.0, 5.0]],
            [[10.0, 0.0, 5.0], [10.0, 10.0, 5.0], [0.0, 10.0, 5.0]],
        ]
    )


def test_voxelizers_agree():
    tris = square_tris()
    g1 = voxelize_triangles(tris, voxel_size=1.0)
    g2 = voxelize_triangles_dense(tris, voxel_size=1.0, face_chunk=2)
    assert g1.dims_xyz == g2.dims_xyz
    np.testing.assert_array_equal(np.asarray(g1.occ), np.asarray(g2.occ))
    assert int(np.asarray(g1.occ).sum()) > 50


def test_native_voxelizer_matches():
    from ray_tracing_octrees_tpu.native import runtime as rt

    if not rt.available():
        pytest.skip("native toolchain unavailable")
    tris = square_tris()
    g1 = voxelize_triangles(tris, voxel_size=1.0)
    g2 = rt.voxelize_triangles(tris, voxel_size=1.0)
    assert g1.dims_xyz == g2.dims_xyz
    np.testing.assert_array_equal(np.asarray(g1.occ), np.asarray(g2.occ))
    np.testing.assert_allclose(np.asarray(g1.origin), np.asarray(g2.origin))


def test_native_cache_roundtrip(tmp_path, rng):
    from ray_tracing_octrees_tpu.native import runtime as rt
    from ray_tracing_octrees_tpu.core.cache import load_voxel_grid, save_voxel_grid
    from ray_tracing_octrees_tpu.core.grid import VoxelGrid

    if not rt.available():
        pytest.skip("native toolchain unavailable")
    occ = (rng.random((6, 5, 4)) > 0.5).astype(np.uint8)
    g = VoxelGrid.create(occ, origin=(1.0, 2.0, 3.0), voxel_size=0.5)
    p = str(tmp_path / "native.bin")
    assert rt.save_grid(p, g)
    # native write <-> python read
    g2 = load_voxel_grid(p)
    np.testing.assert_array_equal(np.asarray(g2.occ), occ)
    # python write <-> native read (full + slab)
    p2 = str(tmp_path / "py.bin")
    save_voxel_grid(p2, g)
    g3 = rt.load_grid(p2)
    np.testing.assert_array_equal(np.asarray(g3.occ), occ)
    g4 = rt.load_grid(p2, start_layer=2, num_layers=3)
    np.testing.assert_array_equal(np.asarray(g4.occ), occ[2:5])
    np.testing.assert_allclose(np.asarray(g4.origin), [1.0, 2.0, 3.0 + 2 * 0.5])


def test_native_csv_matches_python(tmp_path, rng):
    """Native CSV parse + face assembly == the Python loader, including
    error recovery and missing-vertex drops."""
    from ray_tracing_octrees_tpu.native import runtime

    if not runtime.available():
        import pytest

        pytest.skip("native toolchain unavailable")

    vp = tmp_path / "verts.csv"
    fp = tmp_path / "faces.csv"
    vp.write_text(VERTS_CSV)
    fp.write_text(FACES_CSV)

    v_py = load_csv_vertices(str(vp))
    f_py = load_csv_faces(str(fp))
    v_nat = runtime.parse_csv_file(str(vp), min_tokens=8, n_numeric=8)
    f_nat = runtime.parse_csv_file(str(fp), min_tokens=4, n_numeric=4)
    np.testing.assert_array_equal(v_nat, v_py)
    np.testing.assert_array_equal(f_nat, f_py)

    tris_py, kept_py = assemble_triangles(v_py, f_py)
    tris_nat, kept_nat = runtime.assemble_triangles_native(v_nat, f_nat)
    np.testing.assert_array_equal(kept_nat, kept_py)
    np.testing.assert_allclose(tris_nat, tris_py.astype(np.float32))

    # a larger randomized corpus: duplicate keys (later row wins), many
    # meshes, missing references
    n = 500
    rows = []
    for i in range(n):
        m = int(rng.integers(0, 20))
        vi = int(rng.integers(0, 40))
        e, no, el = rng.random(3) * 100
        rows.append(f"{m}, {vi}, {e:.6f}, {no:.6f}, {el:.6f}, 51.0, -114.0, 0.0")
    vp2 = tmp_path / "verts2.csv"
    vp2.write_text("h\n" + "\n".join(rows) + "\n")
    frs = []
    for j in range(300):
        m = int(rng.integers(0, 22))
        a, b, c = (int(rng.integers(0, 44)) for _ in range(3))
        frs.append(f"{m}, {a}, {b}, {c}")
    fp2 = tmp_path / "faces2.csv"
    fp2.write_text("h\n" + "\n".join(frs) + "\n")

    v_py = load_csv_vertices(str(vp2))
    f_py = load_csv_faces(str(fp2))
    v_nat = runtime.parse_csv_file(str(vp2), 8, 8)
    f_nat = runtime.parse_csv_file(str(fp2), 4, 4)
    np.testing.assert_array_equal(v_nat, v_py)
    np.testing.assert_array_equal(f_nat, f_py)
    tris_py, kept_py = assemble_triangles(v_py, f_py)
    tris_nat, kept_nat = runtime.assemble_triangles_native(v_nat, f_nat)
    np.testing.assert_array_equal(kept_nat, kept_py)
    np.testing.assert_allclose(tris_nat, tris_py.astype(np.float32))


def test_load_csv_into_voxel_grid_native_matches_python(tmp_path):
    """End-to-end CSV -> grid: all-native pipeline == all-Python pipeline."""
    from ray_tracing_octrees_tpu.ingest.voxelize import load_csv_into_voxel_grid

    vp = tmp_path / "verts.csv"
    fp = tmp_path / "faces.csv"
    vp.write_text(VERTS_CSV)
    fp.write_text(FACES_CSV)
    g_py = load_csv_into_voxel_grid(str(vp), str(fp), voxel_size=1.0,
                                    use_native=False)
    g_nat = load_csv_into_voxel_grid(str(vp), str(fp), voxel_size=1.0,
                                     use_native=True)
    assert g_py is not None and g_nat is not None
    np.testing.assert_array_equal(np.asarray(g_nat.occ), np.asarray(g_py.occ))
    np.testing.assert_allclose(np.asarray(g_nat.origin),
                               np.asarray(g_py.origin), atol=1e-5)
