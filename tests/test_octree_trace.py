"""Stackless octree ray tracing vs a brute-force nearest-leaf oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from ray_tracing_octrees_tpu.core.grid import VoxelGrid, make_sphere_grid
from ray_tracing_octrees_tpu.core.octree import build_pyramid, build_linear_octree
from ray_tracing_octrees_tpu.trace.octree_trace import (
    trace_octree,
    compact_visible_nodes,
)
from ray_tracing_octrees_tpu.render.camera import Camera, generate_rays
from ray_tracing_octrees_tpu.models.octree_raytracer import (
    OctreeRayTracer,
    render_octree_image,
)


def brute_force_hits(tree, grid, origins, dirs):
    """Nearest solid-leaf hit by exhaustive slab tests over all solid leaves.

    Implements the semantics of intersectOctreeIterative with the
    first-hit-break artifact removed: tHit = max(0, tNear), valid iff
    tNear <= tFar and tFar > 0; nearest over all solid leaves.
    """
    xs = np.asarray(tree.x, np.float64)
    ys = np.asarray(tree.y, np.float64)
    zs = np.asarray(tree.z, np.float64)
    sizes = np.asarray(tree.size, np.float64)
    solid_leaf = np.asarray(tree.is_leaf) & np.asarray(tree.is_solid)
    origin = np.asarray(grid.origin, np.float64)
    vs = float(grid.voxel_size)
    bmin = origin[None, :] + np.stack([xs, ys, zs], -1)[solid_leaf] * vs
    bmax = bmin + sizes[solid_leaf, None] * vs

    hits = np.zeros(len(origins), bool)
    t_hits = np.full(len(origins), np.inf)
    normals = np.zeros((len(origins), 3))
    for i, (o, d) in enumerate(zip(origins, dirs)):
        inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
        t1 = (bmin - o) * inv
        t2 = (bmax - o) * inv
        tn = np.minimum(t1, t2).max(axis=1)
        tf = np.maximum(t1, t2).min(axis=1)
        ok = (tn <= tf) & (tf > 0)
        if not ok.any():
            continue
        th = np.where(tn > 0, tn, 0.0)
        th = np.where(ok, th, np.inf)
        j = th.argmin()
        hits[i] = True
        t_hits[i] = th[j]
        p = o + d * th[j]
        c = 0.5 * (bmin[j] + bmax[j])
        n = p - c
        normals[i] = n / max(np.linalg.norm(n), 1e-30)
    return hits, t_hits, normals


def run_trace(grid, origins, dirs):
    pyr = build_pyramid(grid.occ)
    res = trace_octree(
        pyr,
        jnp.asarray(origins, jnp.float32),
        jnp.asarray(dirs, jnp.float32),
        grid.origin,
        grid.voxel_size,
    )
    return {k: np.asarray(v) for k, v in res.items()}


def random_dirs(rng, n):
    d = rng.normal(size=(n, 3))
    return d / np.linalg.norm(d, axis=1, keepdims=True)


@pytest.mark.parametrize("dims", [(8, 8, 8), (6, 9, 5)])
def test_trace_matches_brute_force(rng, dims):
    occ = (rng.random(dims) < 0.12).astype(np.uint8)
    grid = VoxelGrid.create(occ, origin=(-1.0, -2.0, 0.5), voxel_size=0.3)
    tree = build_linear_octree(occ)

    n = 200
    # rays from a shell around the grid toward random interior points
    center = np.asarray(grid.world_min) + 0.5 * (
        np.asarray(grid.world_max) - np.asarray(grid.world_min)
    )
    origins = center + random_dirs(rng, n) * 5.0
    targets = center + (rng.random((n, 3)) - 0.5) * 2.0
    dirs = targets - origins
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    res = run_trace(grid, origins.astype(np.float32), dirs.astype(np.float32))
    ref_hit, ref_t, ref_n = brute_force_hits(tree, grid, origins, dirs)

    # Tolerate boundary-grazing disagreements (hits within ~1e-3 voxel of a
    # face can differ between float32 DDA and float64 brute force).
    agree = res["hit"] == ref_hit
    assert agree.mean() > 0.98, f"hit agreement {agree.mean()}"
    both = res["hit"] & ref_hit
    np.testing.assert_allclose(res["t"][both], ref_t[both], atol=5e-3, rtol=1e-4)
    # normals from the same leaf center
    dot = (res["normal"][both] * ref_n[both]).sum(1)
    assert (dot > 0.999).mean() > 0.98


def test_rays_from_inside_solid():
    occ = np.ones((4, 4, 4), np.uint8)
    grid = VoxelGrid.create(occ)
    o = np.array([[2.0, 2.0, 2.0]], np.float32)
    d = np.array([[1.0, 0.0, 0.0]], np.float32)
    res = run_trace(grid, o, d)
    assert res["hit"][0]
    assert res["t"][0] == 0.0  # tHit = max(0, tNear) when starting inside


def test_miss_everything():
    occ = np.zeros((4, 4, 4), np.uint8)
    occ[1, 1, 1] = 1
    grid = VoxelGrid.create(occ)
    o = np.array([[10.0, 10.0, 10.0]], np.float32)
    d = np.array([[1.0, 0.0, 0.0]], np.float32)
    res = run_trace(grid, o, d)
    assert not res["hit"][0]


def test_sphere_hit_distance_analytic():
    """Rays at the 256^3-style sphere scene: hit at the outer shell radius."""
    grid = make_sphere_grid(64)
    # outer radius = 0.4 * 64 voxels of size 1/64 -> 0.4 world units around 0
    n = 64
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    origins = np.stack(
        [2.0 * np.cos(ang), np.zeros(n), 2.0 * np.sin(ang)], -1
    ).astype(np.float32)
    dirs = -origins / np.linalg.norm(origins, axis=1, keepdims=True)
    res = run_trace(grid, origins.astype(np.float32), dirs.astype(np.float32))
    assert res["hit"].all()
    # entry distance ~ 2.0 - 0.4, within a voxel (1/64) + center offset 0.5 vox
    np.testing.assert_allclose(res["t"], 1.6, atol=2.5 / 64)


def test_render_image_sphere():
    grid = make_sphere_grid(32)
    tracer = OctreeRayTracer()
    tracer.set_octree(grid)
    cam = Camera(theta=0.3, phi=0.7, radius=2.0)
    img = np.asarray(tracer.render(cam, 64, 64, aspect=1.0))
    assert img.shape == (64, 64, 4)
    # sphere visible in the middle; background black
    assert img[32, 32, :3].max() > 0.05
    assert img[0, 0, :3].max() == 0.0
    assert np.all(img[..., 3] == 1.0)
    # shadows variant runs and darkens or equals
    img_s = np.asarray(tracer.render(cam, 64, 64, aspect=1.0, shadows=True))
    assert img_s[..., :3].sum() <= img[..., :3].sum() + 1e-3


def test_compact_visible_nodes_remap(rng):
    occ = (rng.random((8, 8, 8)) < 0.3).astype(np.uint8)
    tree = build_linear_octree(occ)
    n = tree.num_nodes
    visible = np.asarray(rng.random(n) < 0.7)
    tree2, count = compact_visible_nodes(tree, jnp.asarray(visible))
    count = int(count)
    vis = visible.copy()
    vis[0] = True
    assert count == vis.sum()
    # surviving nodes keep their coords, in original relative order
    old_idx = np.nonzero(vis)[0]
    np.testing.assert_array_equal(np.asarray(tree2.x)[:count], np.asarray(tree.x)[old_idx])
    np.testing.assert_array_equal(np.asarray(tree2.size)[:count], np.asarray(tree.size)[old_idx])
    # children of culled nodes are -1; surviving children point at the
    # remapped position of the same node
    ch_old = np.asarray(tree.children)
    ch_new = np.asarray(tree2.children)
    new_of_old = -np.ones(n, np.int64)
    new_of_old[old_idx] = np.arange(count)
    for ni, oi in enumerate(old_idx):
        for c in range(8):
            oc = ch_old[oi, c]
            expect = -1 if oc < 0 or not vis[oc] else new_of_old[oc]
            assert ch_new[ni, c] == expect


# ---------------------------------------------------------------------------
# trace_octree_fast: the one-gather leaf-volume tracer
# ---------------------------------------------------------------------------


def _leaf_volume_oracle(pyr):
    """Per-voxel (level, solid) by the literal find_leaf walk (cell_code
    per level, topmost uniform wins)."""
    import numpy as _np

    S = pyr.root_size
    level = _np.zeros((S, S, S), _np.int32)
    solid = _np.zeros((S, S, S), bool)
    found = _np.zeros((S, S, S), bool)
    zz, yy, xx = _np.meshgrid(
        _np.arange(S), _np.arange(S), _np.arange(S), indexing="ij")
    for k in range(pyr.num_levels - 1, -1, -1):
        code = _np.asarray(pyr.code_levels[k])
        cz, cy, cx = zz >> k, yy >> k, xx >> k
        inb = (cz < code.shape[0]) & (cy < code.shape[1]) & (cx < code.shape[2])
        c = _np.where(
            inb,
            code[_np.minimum(cz, code.shape[0] - 1),
                 _np.minimum(cy, code.shape[1] - 1),
                 _np.minimum(cx, code.shape[2] - 1)],
            0,
        )
        uni = c != 1
        take = uni & ~found
        level[take] = k
        solid[take] = (c == 2)[take]
        found |= uni
    return level, solid


@pytest.mark.parametrize("dims", [(8, 8, 8), (6, 9, 5)])
def test_leaf_volume_matches_cell_code_walk(rng, dims):
    from ray_tracing_octrees_tpu.core.octree import build_leaf_volume

    occ = (rng.random(dims) < 0.2).astype(np.uint8)
    pyr = build_pyramid(jnp.asarray(occ))
    lv = np.asarray(build_leaf_volume(pyr))
    level_o, solid_o = _leaf_volume_oracle(pyr)
    np.testing.assert_array_equal((lv >> 1) & 0xF, level_o)
    np.testing.assert_array_equal(lv & 1, solid_o.astype(np.uint8))

    # skip radius: the ball [v - r, v + r + 1) is solid-free (always), and
    # the EXACT sub-scale (codes 0..3) is maximal — checked brute-force.
    # Log-scale codes 4..7 (r = 8/16/32/64) are conservative by
    # construction, not maximal (alignment-quantized).
    from ray_tracing_octrees_tpu.core.octree import decode_skip_radius

    occ_pad = np.zeros((pyr.root_size,) * 3, bool)
    occ_pad[: dims[0], : dims[1], : dims[2]] = occ > 0
    code = (lv >> 5).astype(np.int32)
    r = np.asarray(decode_skip_radius(jnp.asarray(code)))
    S = pyr.root_size
    for v in np.argwhere(~occ_pad)[:: max(1, (~occ_pad).sum() // 64)]:
        rr = int(r[tuple(v)])
        lo = np.maximum(v - rr, 0)
        hi = np.minimum(v + rr + 1, S)
        assert not occ_pad[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]].any()
        if rr < 3:   # exact range: radius rr+1 must contain a solid voxel
            lo = np.maximum(v - rr - 1, 0)
            hi = np.minimum(v + rr + 2, S)
            box = occ_pad[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]]
            assert box.any() or (
                # unless the larger box ran off the cube (cube edge holds
                # no solid by construction)
                (v - rr - 1 < 0).any() or (v + rr + 2 > S).any()
            )


@pytest.mark.parametrize("dims", [(8, 8, 8), (6, 9, 5), (16, 16, 16)])
def test_trace_fast_bit_matches_exact(rng, dims):
    """trace_octree_fast(ball_skip=False) == trace_octree, bitwise."""
    from ray_tracing_octrees_tpu.core.octree import build_leaf_volume
    from ray_tracing_octrees_tpu.trace.octree_trace import trace_octree_fast

    occ = (rng.random(dims) < 0.12).astype(np.uint8)
    grid = VoxelGrid(
        occ=jnp.asarray(occ),
        origin=jnp.asarray((-1.0, -0.5, -0.25), jnp.float32),
        voxel_size=jnp.float32(0.21),
    )
    pyr = build_pyramid(grid.occ)
    lv = build_leaf_volume(pyr)

    n = 256
    o = np.asarray(grid.origin)[None, :] + rng.random((n, 3)) * np.array(
        [dims[2], dims[1], dims[0]]) * 0.21 * 1.4 - 0.3
    d = random_dirs(rng, n)
    ref = run_trace(grid, o, d)
    res = trace_octree_fast(
        lv, jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        grid.origin, grid.voxel_size)
    res = {k: np.asarray(v) for k, v in res.items()}
    np.testing.assert_array_equal(res["hit"], ref["hit"])
    np.testing.assert_array_equal(res["t"], ref["t"])
    np.testing.assert_array_equal(res["normal"], ref["normal"])
    np.testing.assert_array_equal(res["steps"], ref["steps"])


def test_trace_fast_ball_skip_matches_on_sphere(rng):
    """ball_skip=True: same hits/t on camera rays (fewer steps)."""
    from ray_tracing_octrees_tpu.core.octree import build_leaf_volume
    from ray_tracing_octrees_tpu.trace.octree_trace import trace_octree_fast

    grid = make_sphere_grid(32)
    pyr = build_pyramid(grid.occ)
    lv = build_leaf_volume(pyr)
    cam = Camera(theta=0.4, phi=0.8, radius=2.2)
    o, d = generate_rays(
        48, 48, jnp.asarray(cam.get_pos(), jnp.float32),
        jnp.asarray(cam.get_view(), jnp.float32), 45.0, 1.0)
    ref = run_trace(grid, np.asarray(o), np.asarray(d))
    res = trace_octree_fast(lv, o, d, grid.origin, grid.voxel_size,
                            ball_skip=True)
    res = {k: np.asarray(v) for k, v in res.items()}
    np.testing.assert_array_equal(res["hit"], ref["hit"])
    np.testing.assert_allclose(res["t"], ref["t"], atol=1e-5)
    assert res["steps"].sum() < ref["steps"].sum()


def test_interior_backward_cone_falls_back_to_exact():
    """An interior camera whose frustum cone crosses the sweep plane must
    not read miss from the half-volume sweep: render(fast=True) routes to
    the exact tracer for such poses (ADVICE r2)."""
    import dataclasses as _dc
    import jax.numpy as jnp
    from ray_tracing_octrees_tpu.config import DEFAULT_CONFIG
    from ray_tracing_octrees_tpu.models.octree_raytracer import (
        _frustum_crosses_sweep_plane,
    )

    grid = make_sphere_grid(32)
    cfg = _dc.replace(
        DEFAULT_CONFIG, camera=_dc.replace(DEFAULT_CONFIG.camera,
                                           fov_deg=100.0))
    rt = OctreeRayTracer(config=cfg)
    rt.set_octree(grid)

    # eye at the hollow sphere center, looking diagonally: with fov 100
    # the cone must contain rays pointing backward along every axis
    cam = Camera(theta=0.62, phi=0.62, radius=0.01)
    assert _frustum_crosses_sweep_plane(cam.get_view(), 100.0, 1.0)
    img_fast = rt.render(cam, 32, 32, 1.0, shadows=False, fast=True)
    img_exact = rt.render(cam, 32, 32, 1.0, shadows=False, fast=False)
    np.testing.assert_allclose(
        np.asarray(img_fast), np.asarray(img_exact), atol=1e-6)
    # the shell surrounds the eye: every ray must hit
    assert (np.asarray(img_fast)[..., :3].max(-1) > 0).all()

    # a narrow aligned cone does NOT trip the fallback
    cam2 = Camera(theta=0.0, phi=0.0, radius=0.01)
    assert not _frustum_crosses_sweep_plane(cam2.get_view(), 30.0, 1.0)


def test_render_image_bands_identical():
    """Row-band tracing (bands>1) returns the bands=1 image bit-for-bit."""
    from ray_tracing_octrees_tpu.core.octree import build_leaf_volume

    grid = make_sphere_grid(32)
    pyr = build_pyramid(grid.occ)
    lv = build_leaf_volume(pyr)
    cam = Camera(theta=0.3, phi=0.7, radius=2.0)
    args = (pyr, grid.origin, grid.voxel_size,
            jnp.asarray(cam.get_pos(), jnp.float32),
            jnp.asarray(cam.get_view(), jnp.float32),
            48, 36, jnp.float32(45.0), jnp.float32(48 / 36))
    a = render_octree_image(*args, shadows=True, leaf_vol=lv, ball_skip=True)
    b = render_octree_image(*args, shadows=True, leaf_vol=lv, ball_skip=True,
                            bands=5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("ball", [False, True])
def test_trace_fast_ladder_bit_matches(rng, ball):
    """The compaction ladder returns the no-ladder results bitwise."""
    from ray_tracing_octrees_tpu.core.octree import build_leaf_volume
    from ray_tracing_octrees_tpu.trace.octree_trace import trace_octree_fast

    occ = (rng.random((16, 16, 16)) < 0.08).astype(np.uint8)
    grid = VoxelGrid.create(occ, origin=(-0.4, -0.6, -0.2), voxel_size=0.17)
    pyr = build_pyramid(grid.occ)
    lv = build_leaf_volume(pyr)
    n = 512
    o = np.asarray(grid.origin)[None, :] + (
        rng.random((n, 3)) * 16 * 0.17 * 1.5 - 0.4)
    d = random_dirs(rng, n)
    oj = jnp.asarray(o, jnp.float32)
    dj = jnp.asarray(d, jnp.float32)
    ref = trace_octree_fast(lv, oj, dj, grid.origin, grid.voxel_size,
                            ball_skip=ball)
    # tiny caps force overflow through the cleanup loop too
    for ladder in (((4, 128), (6, 32)), ((2, 8),), ((1, 1), (1, 1)),
                   ((0, 256), (4, 64), (8, 16))):
        res = trace_octree_fast(lv, oj, dj, grid.origin, grid.voxel_size,
                                ball_skip=ball, ladder=ladder)
        for k in ("hit", "t", "normal", "steps"):
            np.testing.assert_array_equal(
                np.asarray(res[k]), np.asarray(ref[k]), err_msg=f"{ladder} {k}")


@pytest.mark.parametrize("pose", [(0.3, 0.7), (0.9, 0.8), (-0.4, 0.2),
                                  (0.05, 1.3)])
def test_seeded_trace_matches_plain(rng, pose):
    """Conservative sweep seeds: identical hits/depths, miss=>dead sound.

    Sparse isolated voxels are the adversarial case for the resampled
    sweep — the radius-3 dilation must make every 0.5-threshold bilinear
    test conservative."""
    from ray_tracing_octrees_tpu.core.octree import build_leaf_volume
    from ray_tracing_octrees_tpu.trace.octree_trace import trace_octree_fast
    from ray_tracing_octrees_tpu.trace.slab_sweep import (
        dilate_occupancy, sweep_seed,
    )

    occ = (rng.random((24, 24, 24)) < 0.03).astype(np.uint8)
    grid = VoxelGrid.create(occ, origin=(-0.5, -0.5, -0.5), voxel_size=1 / 24)
    pyr = build_pyramid(grid.occ)
    lv = build_leaf_volume(pyr)
    vol = (jnp.asarray(grid.occ) > 0).astype(jnp.float32)
    dil = dilate_occupancy(vol, 3)

    th, ph = pose
    cam = Camera(theta=th, phi=ph, radius=2.2)
    pos = jnp.asarray(cam.get_pos(), jnp.float32)
    view = jnp.asarray(cam.get_view(), jnp.float32)
    W = H = 64
    o, d = generate_rays(W, H, pos, view, 45.0, 1.0)

    live, t_seed, ext = sweep_seed(
        dil, grid.origin, grid.voxel_size, pos, view, 45.0, 1.0, W, H)
    assert ext

    ref = trace_octree_fast(lv, o, d, grid.origin, grid.voxel_size,
                            ball_skip=True)
    res = trace_octree_fast(lv, o, d, grid.origin, grid.voxel_size,
                            ball_skip=True, t_start=t_seed, live_mask=live)

    rhit = np.asarray(ref["hit"])
    # conservativeness invariants
    assert np.asarray(live)[rhit].all(), "a true hit was marked dead"
    assert (np.asarray(t_seed)[rhit]
            <= np.asarray(ref["t"])[rhit] + 1e-5).all(), "seed past the hit"
    # end-to-end equality
    np.testing.assert_array_equal(np.asarray(res["hit"]), rhit)
    np.testing.assert_array_equal(np.asarray(res["t"]), np.asarray(ref["t"]))
    np.testing.assert_array_equal(
        np.asarray(res["normal"]), np.asarray(ref["normal"]))


def test_model_exact_render_equals_plain_image():
    """OctreeRayTracer.render(fast=False) equals the plain pyramid
    render_octree_image: bitwise-class on the pinned DDA path, and up to
    the documented grazing-crossing pixels on the default (sweep-exact)
    routing (trace/sweep_exact.py resolves sub-nudge crossings the
    nudged DDA oracle itself skips)."""
    import dataclasses as _dc

    from ray_tracing_octrees_tpu.config import EngineConfig

    grid = make_sphere_grid(32)
    cam = Camera(theta=0.3, phi=0.7, radius=2.0)
    ref = np.asarray(render_octree_image(
        build_pyramid(grid.occ), grid.origin, grid.voxel_size,
        jnp.asarray(cam.get_pos(), jnp.float32),
        jnp.asarray(cam.get_view(), jnp.float32),
        64, 64, jnp.float32(45.0), jnp.float32(1.0), shadows=True))

    cfg = EngineConfig()
    cfg_dda = _dc.replace(
        cfg, raytrace=_dc.replace(cfg.raytrace, use_sweep_exact=False))
    tracer = OctreeRayTracer(config=cfg_dda)
    tracer.set_octree(grid)
    img = np.asarray(tracer.render(cam, 64, 64, aspect=1.0, shadows=True))
    # identical hits; colors to 1 ulp (FMA/fusion differs between the two
    # compiled programs, so exact bitwise equality is not guaranteed)
    np.testing.assert_array_equal(
        img[..., :3].max(-1) > 0, ref[..., :3].max(-1) > 0)
    np.testing.assert_allclose(img, ref, atol=1e-6)

    tracer2 = OctreeRayTracer(config=cfg)   # default: sweep-exact routing
    tracer2.set_octree(grid)
    img2 = np.asarray(tracer2.render(cam, 64, 64, aspect=1.0, shadows=True))
    diff = np.abs(img2 - ref).max(axis=-1)
    assert (diff > 1e-4).sum() <= 3, int((diff > 1e-4).sum())


def test_shadow_prune_volume_conservative(rng):
    """light_blocked_volume: a False flag proves the shadow ray misses;
    the pruned frame equals the unpruned frame."""
    from ray_tracing_octrees_tpu.core.octree import build_leaf_volume
    from ray_tracing_octrees_tpu.trace.octree_trace import trace_octree_fast
    from ray_tracing_octrees_tpu.trace.slab_sweep import (
        SEED_DILATION, dilate_occupancy, light_blocked_volume,
    )

    occ = np.zeros((48, 48, 48), np.uint8)
    occ[6:10, 6:30, 6:30] = (rng.random((4, 24, 24)) < 0.3)
    grid = VoxelGrid.create(occ, origin=(-0.5, -0.5, -0.5), voxel_size=1 / 48)
    pyr = build_pyramid(grid.occ)
    lv = build_leaf_volume(pyr)
    dil = dilate_occupancy((jnp.asarray(occ) > 0).astype(jnp.float32))
    to_light = (0.5, 0.9, 0.4)
    blk = light_blocked_volume(dil, to_light, doublings=7)

    # every empty padded voxel with flag False must have NO solid toward
    # the light: verify with the exact tracer from voxel centers
    blk_np = np.asarray(blk)
    origin_p = np.asarray(grid.origin) - SEED_DILATION * float(grid.voxel_size)
    free = np.argwhere(~blk_np)
    assert len(free) > 0, "over-dilation left no provably-free voxels"
    sel = free[:: max(1, len(free) // 512)]
    centers = origin_p[None, :] + (sel[:, ::-1] + 0.5) * float(grid.voxel_size)
    l = np.asarray(to_light, np.float64)
    d = np.broadcast_to(l / np.linalg.norm(l), centers.shape)
    res = trace_octree_fast(
        lv, jnp.asarray(centers, jnp.float32), jnp.asarray(d, jnp.float32),
        grid.origin, grid.voxel_size)
    assert not np.asarray(res["hit"]).any(), "flag=False voxel can be occluded"

    # end-to-end: pruned == unpruned frame
    cam = Camera(theta=0.5, phi=0.8, radius=2.3)
    args = (pyr, grid.origin, grid.voxel_size,
            jnp.asarray(cam.get_pos(), jnp.float32),
            jnp.asarray(cam.get_view(), jnp.float32),
            64, 64, jnp.float32(45.0), jnp.float32(1.0))
    a = render_octree_image(*args, shadows=True, leaf_vol=lv,
                            light_dir=tuple(-c for c in to_light))
    b = render_octree_image(*args, shadows=True, leaf_vol=lv,
                            light_dir=tuple(-c for c in to_light),
                            shadow_live_vol=blk)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
