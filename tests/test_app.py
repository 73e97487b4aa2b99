"""Application shell: modes, scheduling, caches, wireframe, PNG."""

import numpy as np
import pytest

from ray_tracing_octrees_tpu.config import EngineConfig
from ray_tracing_octrees_tpu.core.grid import make_sphere_grid
from ray_tracing_octrees_tpu.render.app import Application, RenderMode, TriangleCache
from ray_tracing_octrees_tpu.render.image import write_png
from ray_tracing_octrees_tpu.render.wireframe import octree_wireframe
from ray_tracing_octrees_tpu.render.camera import Camera
from ray_tracing_octrees_tpu.core.octree import build_linear_octree


@pytest.fixture(scope="module")
def app():
    cfg = EngineConfig(use_buildings=False, sphere_dim=16)
    a = Application(config=cfg)
    a.setup(grid=make_sphere_grid(16))
    return a


def test_mode_cycle(app):
    start = app.mode
    names = [start.name]
    for _ in range(5):
        app.handle_key("R")
        names.append(app.mode.name)
    assert app.mode == start
    assert len(set(names)) == 5


def test_extraction_modes_produce_meshes(app, tmp_path):
    app.mode = RenderMode.MARCHING_CUBES
    out = app.frame(32, 32)
    assert out["mesh"]["count"] > 0
    assert out["color"].shape == (32, 32, 4)
    app.mode = RenderMode.BLOCKS
    app._cached_mesh = None
    out = app.frame(32, 32)
    assert out["mesh"]["count"] > 0
    write_png(str(tmp_path / "frame.png"), out["color"])
    assert (tmp_path / "frame.png").stat().st_size > 100


def test_raytrace_mode_schedules_and_caches(app):
    app.mode = RenderMode.OCTREE_RAYTRACE
    out1 = app.frame(24, 24)
    img1 = out1["color"]
    # no camera change: the next frames reuse the cache until the interval
    out2 = app.frame(24, 24)
    assert out2["color"] is img1 or np.array_equal(out2["color"], img1)
    # camera change forces a re-render
    app.orbit(40.0, 0.0)
    out3 = app.frame(24, 24)
    assert not np.array_equal(out3["color"], img1)


def test_volume_mode_renders(app):
    app.mode = RenderMode.VOLUME_RAYCAST
    out = app.frame(24, 24)
    assert out["color"].shape == (24, 24, 4)
    assert np.isfinite(out["color"]).all()


def test_wireframe_overlay(app):
    app.show_octree_wireframe = True
    app.mode = RenderMode.MARCHING_CUBES
    out = app.frame(24, 24)
    wf = out["wireframe"]
    assert wf["count"] > 0 and wf["count"] % 12 == 0
    segs = wf["segments"][: wf["count"]]
    assert np.isfinite(segs).all()
    app.show_octree_wireframe = False


def test_wireframe_counts_match_visible_leaves():
    g = make_sphere_grid(8)
    tree = build_linear_octree(g.occ)
    segs, count = octree_wireframe(tree, g.origin, g.voxel_size, None)
    n_leaves = int(np.asarray(tree.is_leaf).sum())
    assert int(count) == 12 * n_leaves


def test_dc_triangle_cache_roundtrip(tmp_path):
    cache = TriangleCache(directory=str(tmp_path / "tc"))
    cam = Camera(theta=0.2, phi=0.3, radius=2.0)
    verts = np.random.default_rng(0).random((10, 3, 3)).astype(np.float32)
    normals = np.random.default_rng(1).random((10, 3)).astype(np.float32)
    cache.save(cam, 1.0, verts, normals, 10)
    got = cache.load(cam, 1.0)
    assert got is not None
    v, n, c = got
    assert c == 10
    np.testing.assert_array_equal(v, verts)
    # different pose -> different key -> miss
    cam2 = Camera(theta=0.21, phi=0.3, radius=2.0)
    assert cache.load(cam2, 1.0) is None


def test_key_toggles(app):
    w0 = app.wireframe_fill
    app.handle_key("W")
    assert app.wireframe_fill != w0
    o0 = app.raycaster.enable_octree_skip
    app.handle_key("O")
    assert app.raycaster.enable_octree_skip != o0
    app.handle_key("C")
    np.testing.assert_allclose(app.camera.target, app.building_center)
