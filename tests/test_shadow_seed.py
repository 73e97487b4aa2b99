"""Orthographic shadow seed (slab_sweep.build_shadow_seed/query_shadow_seed)
and the exact-tracer ladder's const-bundle/safety-cap options.

The seed's contract (conservativeness): for any shadow origin and the
fixed light direction, live=False implies the exact trace misses, and
t_start never exceeds the exact first-hit t. The frame-level test asserts
the full seeded/compacted shadow path is image-identical to the plain one.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ray_tracing_octrees_tpu.core.grid import VoxelGrid, make_sphere_grid
from ray_tracing_octrees_tpu.core.octree import build_leaf_volume, build_pyramid
from ray_tracing_octrees_tpu.render.camera import Camera, generate_rays
from ray_tracing_octrees_tpu.trace.octree_trace import trace_octree_fast
from ray_tracing_octrees_tpu.trace.slab_sweep import (
    build_shadow_seed,
    dilate_occupancy,
    query_shadow_seed,
)

LIGHTS = [(0.5, 0.9, 0.4), (-0.3, 0.2, 0.9), (1.0, 0.1, -0.2)]


def _random_grid(rng, dims=(12, 14, 10)):
    occ = (rng.random(dims) < 0.08).astype(np.uint8)
    return VoxelGrid(
        occ=jnp.asarray(occ),
        origin=jnp.asarray([-0.5, -0.4, -0.3], jnp.float32),
        voxel_size=jnp.float32(0.11),
    )


@pytest.mark.parametrize("light", LIGHTS)
def test_shadow_seed_conservative_random(rng, light):
    g = _random_grid(rng)
    pyr = build_pyramid(g.occ)
    lv = build_leaf_volume(pyr)
    dil = dilate_occupancy((jnp.asarray(g.occ) > 0).astype(jnp.float32))
    seed = build_shadow_seed(dil, light)

    n = 512
    l = np.asarray(light, np.float64)
    l /= np.linalg.norm(l)
    # random origins straddling the volume (inside + outside)
    lo = np.asarray(g.origin) - 0.3
    hi = np.asarray(g.origin) + np.asarray(g.occ.shape)[::-1] * float(
        g.voxel_size) + 0.3
    o = (lo + (hi - lo) * rng.random((n, 3))).astype(np.float32)
    d = np.broadcast_to(l.astype(np.float32), (n, 3))

    res = trace_octree_fast(lv, jnp.asarray(o), jnp.asarray(d),
                            g.origin, g.voxel_size)
    live, ts = query_shadow_seed(seed, jnp.asarray(o), g.origin,
                                 g.voxel_size)
    hit = np.asarray(res["hit"])
    t = np.asarray(res["t"])
    live = np.asarray(live)
    ts = np.asarray(ts)
    # live=False must PROVE miss
    assert not (hit & ~live).any(), "seed killed a hitting shadow ray"
    # t_start must lower-bound the true hit t (small fp slack)
    bad = hit & live & (ts > t + 1e-5)
    assert not bad.any(), f"seed start overshoots hit t on {bad.sum()} rays"


@pytest.mark.parametrize("light", LIGHTS[:2])
def test_shadow_seeded_trace_matches_plain(rng, light):
    """Seed + t_start changes no output of the exact shadow trace."""
    g = _random_grid(rng, dims=(10, 16, 12))
    pyr = build_pyramid(g.occ)
    lv = build_leaf_volume(pyr)
    dil = dilate_occupancy((jnp.asarray(g.occ) > 0).astype(jnp.float32))
    seed = build_shadow_seed(dil, light)

    n = 256
    l = np.asarray(light, np.float64)
    l /= np.linalg.norm(l)
    lo = np.asarray(g.origin)
    hi = lo + np.asarray(g.occ.shape)[::-1] * float(g.voxel_size)
    o = (lo + (hi - lo) * rng.random((n, 3))).astype(np.float32)
    d = np.broadcast_to(l.astype(np.float32), (n, 3)).copy()

    plain = trace_octree_fast(lv, jnp.asarray(o), jnp.asarray(d),
                              g.origin, g.voxel_size)
    live, ts = query_shadow_seed(seed, jnp.asarray(o), g.origin,
                                 g.voxel_size)
    seeded = trace_octree_fast(
        lv, jnp.asarray(o), jnp.asarray(d), g.origin, g.voxel_size,
        ball_skip=True, const_dir=True, t_start=ts, live_mask=live,
        ladder=((0, n // 2), (4, n // 4)), safety_cap=n // 4)
    np.testing.assert_array_equal(np.asarray(plain["hit"]),
                                  np.asarray(seeded["hit"]))
    ph = np.asarray(plain["hit"])
    np.testing.assert_allclose(np.asarray(plain["t"])[ph],
                               np.asarray(seeded["t"])[ph], rtol=0, atol=0)


def test_const_bundle_ladder_bit_matches(rng):
    """const_origin / const_dir / safety_cap change NO output bits."""
    g = make_sphere_grid(32)
    pyr = build_pyramid(g.occ)
    lv = build_leaf_volume(pyr)
    cam = Camera(theta=0.4, phi=0.8, radius=2.2)
    o, d = generate_rays(64, 48, jnp.asarray(cam.get_pos(), jnp.float32),
                         jnp.asarray(cam.get_view(), jnp.float32), 45.0,
                         64 / 48)
    n = 64 * 48
    base = trace_octree_fast(lv, o, d, g.origin, g.voxel_size,
                             ball_skip=True)
    lad = ((0, n // 2), (2, n // 8), (6, n // 32))
    for kw in (
        dict(ladder=lad, const_origin=True),
        dict(ladder=lad, const_origin=True, safety_cap=n // 8),
        # deliberately tiny caps: overflow rays must be retired by the
        # safety stage / cleanup loop with identical results
        dict(ladder=((0, 64), (2, 32)), const_origin=True,
             safety_cap=n // 4),
        dict(ladder=((0, 64), (2, 32)), const_origin=True),
    ):
        out = trace_octree_fast(lv, o, d, g.origin, g.voxel_size,
                                ball_skip=True, **kw)
        for k in ("hit", "t", "point", "normal"):
            np.testing.assert_array_equal(
                np.asarray(base[k]), np.asarray(out[k]),
                err_msg=f"{k} differs for {kw}")


def test_frame_shadow_seed_image_identical(rng):
    """render_octree_image with shadow_seed/shadow_ladder/safety_cap ==
    the plain shadowed frame."""
    from ray_tracing_octrees_tpu.models.octree_raytracer import (
        render_octree_image,
    )

    g = make_sphere_grid(32)
    pyr = build_pyramid(g.occ)
    lv = build_leaf_volume(pyr)
    dil = dilate_occupancy((jnp.asarray(g.occ) > 0).astype(jnp.float32))
    light = (-0.5, -0.9, -0.4)  # light_dir (away-from-light vector)
    seed = build_shadow_seed(dil, tuple(-c for c in light))
    cam = Camera(theta=0.3, phi=0.7, radius=2.0)
    W, H = 64, 48
    n = W * H
    args = (pyr, g.origin, g.voxel_size,
            jnp.asarray(cam.get_pos(), jnp.float32),
            jnp.asarray(cam.get_view(), jnp.float32), W, H,
            jnp.float32(45.0), jnp.float32(W / H))
    a = render_octree_image(*args, shadows=True, leaf_vol=lv,
                            ball_skip=True, light_dir=light)
    b = render_octree_image(
        *args, shadows=True, leaf_vol=lv, ball_skip=True, light_dir=light,
        ladder=((0, n // 2), (4, n // 8)),
        shadow_ladder=((0, n // 2), (4, n // 8)),
        safety_cap=n // 8, shadow_seed=seed)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
