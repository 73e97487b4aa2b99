"""Filled-triangle rasterizer (render/raster.py) vs test.frag semantics.

The reference draws extracted meshes with GL filled triangles
(main.cpp:1252-1259, shaders/test.vert + test.frag); these tests check
the headless rasterizer produces a FILLED silhouette (no point-splat
holes), correct Phong shading terms, depth ordering, and a depth-tested
wireframe overlay.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ray_tracing_octrees_tpu.core.grid import make_sphere_grid
from ray_tracing_octrees_tpu.ops.marching_cubes import marching_cubes_grid
from ray_tracing_octrees_tpu.render.camera import Camera
from ray_tracing_octrees_tpu.render.raster import (
    phong_shade,
    rasterize_lines,
    rasterize_triangles,
)


@pytest.fixture(scope="module")
def sphere_render():
    grid = make_sphere_grid(48)
    verts, normals, count = marching_cubes_grid(grid, max_triangles=40000)
    count = int(count)
    tris = jnp.asarray(verts)[:count]
    nrm = jnp.asarray(normals)[:count]
    extent = float(np.max(np.asarray(grid.world_max) - np.asarray(grid.world_min)))
    cam = Camera(theta=0.6, phi=0.4, radius=1.6 * extent)
    W = H = 200
    vp = jnp.asarray(cam.get_proj(1.0) @ cam.get_view(), jnp.float32)
    colors = jnp.broadcast_to(jnp.asarray([0.8, 0.8, 0.85]), (count, 3))
    img, zbuf = rasterize_triangles(tris, nrm, colors, vp, W, H,
                                    cam_pos=jnp.asarray(cam.get_pos()),
                                    samples=24)
    return grid, np.asarray(img), np.asarray(zbuf), vp, extent


def test_filled_silhouette_no_holes(sphere_render):
    """The outer shell projects to a filled disc: interior rows of the
    silhouette must be contiguous (filled triangles, not vertex splats)."""
    grid, img, zbuf, vp, extent = sphere_render
    covered = img[..., :3].max(axis=-1) > 0
    frac = covered.mean()
    # outer radius 0.4 of the volume, camera at 1.6 extents, 45 deg fov
    assert 0.1 < frac < 0.6, frac
    ys, xs = np.nonzero(covered)
    cy, cx = int(ys.mean()), int(xs.mean())
    # every row crossing the central third of the disc is gap-free
    for y in range(cy - 10, cy + 11, 5):
        row = covered[y]
        x_idx = np.nonzero(row)[0]
        assert x_idx.size > 0
        gaps = np.diff(x_idx)
        assert gaps.max() == 1, f"row {y} has interior holes"


def test_depth_buffer_front_surface(sphere_render):
    """Depth at the silhouette center is nearer than at the rim."""
    grid, img, zbuf, vp, extent = sphere_render
    covered = img[..., :3].max(axis=-1) > 0
    ys, xs = np.nonzero(covered)
    cy, cx = int(ys.mean()), int(xs.mean())
    center_z = zbuf[cy, cx]
    assert center_z < 1.0
    rim_y = ys.min() + 2
    rim_x = int(xs[ys <= rim_y].mean())
    assert center_z < zbuf[rim_y, rim_x]


def test_phong_terms_match_reference_formula():
    """phong_shade == test.frag:7-29 evaluated by hand."""
    pos = jnp.asarray([[1.0, 2.0, 3.0]])
    nrm = jnp.asarray([[0.0, 0.0, 1.0]])
    col = jnp.asarray([[0.5, 1.0, 0.25]])
    out = np.asarray(phong_shade(pos, nrm, col))[0]

    light = np.array([100.0, 100.0, 100.0]) - np.array([1.0, 2.0, 3.0])
    ldir = light / np.linalg.norm(light)
    diff = max(ldir[2], 0.0)
    view = -np.array([1.0, 2.0, 3.0])
    view = view / np.linalg.norm(view)
    refl = 2 * ldir[2] * np.array([0.0, 0.0, 1.0]) - ldir
    spec = 0.5 * max(float(view @ refl), 0.0) ** 32
    expect = (0.3 + diff + spec) * np.array([0.5, 1.0, 0.25])
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_shading_varies_across_surface(sphere_render):
    grid, img, zbuf, vp, extent = sphere_render
    lit = img[..., 0][img[..., 0] > 0]
    assert lit.std() > 0.05   # Lambert gradient, not flat fill


def test_wireframe_overlay_depth_tested(sphere_render):
    grid, img, zbuf, vp, extent = sphere_render
    # one segment crossing in FRONT of the sphere, one fully behind
    half = 0.5 * extent
    front = [[-half, 0.0, 2.0 * half], [half, 0.0, 2.0 * half]]
    behind = [[-half, 0.1, -3.0 * half], [half, 0.1, -3.0 * half]]
    segs = jnp.asarray([front, behind], jnp.float32)
    out = np.asarray(rasterize_lines(
        jnp.asarray(img), jnp.asarray(zbuf), segs, vp, 200, 200,
        color=(1.0, 0.0, 0.0),
    ))
    red = (out[..., 0] == 1.0) & (out[..., 1] == 0.0)
    assert red.any(), "front segment must draw"
    # the behind segment must be hidden where the sphere covers it:
    covered = img[..., :3].max(axis=-1) > 0
    ys, xs = np.nonzero(covered)
    cy = int(ys.mean())
    band = red[cy - 2 : cy + 3]
    cov_band = covered[cy - 2 : cy + 3]
    assert not (band & cov_band).all(), "hidden segment should be occluded"
