"""Grid-wavefront MC-mesh tracer vs the exact LBVH tracer (same rays).

The LBVH tracer (trace/lbvh.py, escape-link traversal + Moller-Trumbore)
is exact per ray; feeding it the mesh tracer's OWN texel rays makes the
comparison 1:1 — every disagreement is the mesh tracer's documented
nearest-cell sampling approximation, which these tests bound.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ray_tracing_octrees_tpu.core.grid import make_sphere_grid
from ray_tracing_octrees_tpu.ops.marching_cubes import marching_cubes_grid
from ray_tracing_octrees_tpu.trace.lbvh import build_lbvh, trace_lbvh
from ray_tracing_octrees_tpu.trace.mesh_grid import (
    MCMeshScene,
    case_triangle_table,
    prepare_mc_scene,
    render_mc_mesh_frame,
    trace_mc_mesh_texels,
)
from ray_tracing_octrees_tpu.render.camera import Camera


@pytest.fixture(scope="module")
def sphere_scene():
    grid = make_sphere_grid(48)
    verts, normals, count = marching_cubes_grid(grid, max_triangles=40000)
    count = int(count)
    tris = np.asarray(verts)[:count]
    # light on the camera's side (test cameras orbit the (+,+,+) octant);
    # to_light points TOWARD the light, shading takes -to_light
    scene = prepare_mc_scene(grid.occ, grid.origin, grid.voxel_size,
                             to_light=(0.5, 0.9, 0.4))
    return grid, tris, scene


def test_case_table_matches_mc_vertices(sphere_scene):
    """Case-table triangles == marching_cubes_grid output (as multisets)."""
    grid, tris, scene = sphere_scene
    table = np.asarray(case_triangle_table()).reshape(256, 5, 3, 3)
    case = np.asarray(scene.case_vol).astype(np.int32)
    origin = np.asarray(grid.origin)
    vs = float(grid.voxel_size)
    zz, yy, xx = np.nonzero(case)
    rebuilt = []
    from ray_tracing_octrees_tpu.ops import mc_tables as t

    for cz, cy, cx in zip(zz, yy, xx):
        c = case[cz, cy, cx]
        for ti in range(int(t.TRI_COUNTS[c])):
            local = table[c, ti]
            world = origin[None, :] + (np.array([cx, cy, cz], np.float32)[None, :] + local) * vs
            rebuilt.append(world)
    rebuilt = np.asarray(rebuilt, np.float32)
    assert rebuilt.shape == tris.shape
    key = lambda a: np.sort(
        a.reshape(len(a), -1) @ np.arange(1, 10, dtype=np.float64), axis=0)
    np.testing.assert_allclose(key(rebuilt), key(tris), rtol=1e-6, atol=1e-4)


@pytest.mark.parametrize("pose", [0, 1, 2])
def test_texel_trace_matches_lbvh_oracle(sphere_scene, pose):
    grid, tris, scene = sphere_scene
    bvh = build_lbvh(jnp.asarray(tris))

    extent = float(np.max(np.asarray(grid.world_max) - np.asarray(grid.world_min)))
    cam = Camera(theta=0.5 + 0.9 * pose, phi=0.3 + 0.25 * pose,
                 radius=1.4 * extent)
    res = trace_mc_mesh_texels(
        scene, cam.get_pos(), cam.get_view(), fov_deg=45.0, aspect=1.0,
        inter_h=160, inter_w=160, max_rounds=24, tol_texels=0,
    )
    res = jax.tree_util.tree_map(np.asarray, res)

    oracle = trace_lbvh(bvh, jnp.asarray(res["ray_o"]),
                        jnp.asarray(res["ray_d"]), max_steps=4096)
    o_hit = np.asarray(oracle["hit"])
    o_t = np.asarray(oracle["t"]) * np.linalg.norm(res["ray_d"], axis=-1)

    n = o_hit.size
    mismatch = (res["hit"] != o_hit).sum() / n
    assert mismatch < 0.005, f"hit mask mismatch {mismatch:.4%}"

    both = res["hit"] & o_hit
    # same triangle -> same Moller-Trumbore t (float-order differences only)
    np.testing.assert_allclose(res["t"][both], o_t[both], rtol=2e-3)
    agree_exact = np.isclose(res["t"][both], o_t[both], rtol=1e-4).mean()
    assert agree_exact > 0.995

    # every reported hit is a genuine triangle hit with an exact normal
    nrm = res["normal"][both]
    assert np.allclose(np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-4)
    assert int(res["unresolved"]) == 0


def test_kcells4_packed_window_matches_3x3(sphere_scene):
    """The 2x2 u32-packed single-gather fetch == the 3x3 packed-triple path.

    Both are exact on reported hits; at a |slope| <= 1 pose the 3x3 is a
    cell superset of the 2x2 window, so hits/t/case/tri must agree."""
    from ray_tracing_octrees_tpu.trace import mesh_grid as mgrid

    grid, tris, scene = sphere_scene
    extent = float(np.max(np.asarray(grid.world_max) - np.asarray(grid.world_min)))

    def smax_of(cam):
        # host-side replica of _scene_sweep_setup's gate (no device work)
        _, _, _, eyes, window, _ = mgrid._sweep_geometry(
            scene.case_vol, np.asarray(scene.origin), scene.voxel_size,
            cam.get_pos(), cam.get_view())
        eye_s, eye_a, eye_b, z0 = eyes
        a_min, a_max, b_min, b_max = window
        return max(abs(a_min - eye_a), abs(a_max - eye_a),
                   abs(b_min - eye_b), abs(b_max - eye_b)) / max(
                       abs(z0 - eye_s), 1e-12)

    cam = None
    for th, ph, r in [(0.15, 0.1, 2.5), (0.1, 0.05, 3.0), (0.3, 0.2, 2.0),
                      (0.05, 0.03, 4.0)]:
        c = Camera(theta=th, phi=ph, radius=r * extent)
        if smax_of(c) <= 1.0:
            cam = c
            break
    assert cam is not None, "no pose satisfies the |slope| <= 1 gate"
    setup = mgrid._scene_sweep_setup(scene, cam.get_pos(), cam.get_view(),
                                     45.0, 1.0, 96, 96)
    (axis_world, flip, (S, A, B), case_sw, shadow_sw, scal_np, kc) = setup
    assert kc == 4
    outs = {}
    for kcells in (4, 9):
        outs[kcells] = jax.tree_util.tree_map(np.asarray, mgrid._trace_texels(
            case_sw, shadow_sw, jnp.asarray(scal_np),
            case_sw.shape[0] // 32, S, A, B, 96, 96, bool(flip), axis_world,
            24, 0, shadow_sw is not None, kcells=kcells,
        ))
    np.testing.assert_array_equal(outs[4]["hit"], outs[9]["hit"])
    both = outs[4]["hit"]
    np.testing.assert_allclose(outs[4]["t"][both], outs[9]["t"][both],
                               rtol=1e-5)
    same_tri = (outs[4]["case"][both] == outs[9]["case"][both]) & (
        outs[4]["tri"][both] == outs[9]["tri"][both])
    assert same_tri.mean() > 0.999


def test_frame_renders_and_shades(sphere_scene):
    grid, tris, scene = sphere_scene
    extent = float(np.max(np.asarray(grid.world_max) - np.asarray(grid.world_min)))
    cam = Camera(theta=0.7, phi=0.5, radius=1.3 * extent)
    img, stats = render_mc_mesh_frame(
        scene, cam.get_pos(), cam.get_view(), 45.0, 1.0, 128, 128,
        light_dir=(-0.5, -0.9, -0.4),
        inter_h=160, inter_w=160, max_rounds=16, tol_texels=0,
        with_stats=True,
    )
    img = np.asarray(img)
    assert img.shape == (128, 128, 4)
    hit_frac = (img[..., :3].max(axis=-1) > 0).mean()
    assert 0.05 < hit_frac < 0.9
    assert np.isfinite(img).all()
    # Lambert shading produces a range of intensities, not flat fill
    lit = img[..., 0][img[..., 0] > 0]
    assert lit.std() > 0.02
    assert int(stats["rounds"]) >= 1


def test_shadow_channel_darkens_occluded_side(sphere_scene):
    """With the light at +x+y+z, some hit texels carry shadow > 0.5."""
    grid, tris, scene = sphere_scene
    extent = float(np.max(np.asarray(grid.world_max) - np.asarray(grid.world_min)))
    cam = Camera(theta=0.7, phi=0.15, radius=1.5 * extent)
    res = trace_mc_mesh_texels(
        scene, cam.get_pos(), cam.get_view(), fov_deg=45.0, aspect=1.0,
        inter_h=128, inter_w=128, max_rounds=16, tol_texels=0,
    )
    hit = np.asarray(res["hit"])
    sh = np.asarray(res["shadow"])[hit]
    # multi-shell sphere: the inner shell is occluded by the outer one
    assert (sh > 0.5).any()
    assert (sh < 0.5).any()
