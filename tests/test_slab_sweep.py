"""Slab-sweep tracer vs the exact octree tracer; shadow sweep."""

import numpy as np
import pytest
import jax.numpy as jnp

from ray_tracing_octrees_tpu.core.grid import make_sphere_grid, VoxelGrid
from ray_tracing_octrees_tpu.core.octree import build_pyramid
from ray_tracing_octrees_tpu.trace.octree_trace import trace_octree
from ray_tracing_octrees_tpu.trace.slab_sweep import sweep_first_hit, shadow_volume
from ray_tracing_octrees_tpu.render.camera import Camera, generate_rays


@pytest.mark.parametrize("pose", [(0.4, 0.8), (0.0, 0.0), (1.2, 2.5), (-0.9, 4.0)])
def test_sweep_agrees_with_octree_tracer(pose):
    g = make_sphere_grid(32)
    cam = Camera(theta=pose[0], phi=pose[1], radius=2.0)
    W = H = 48
    hit, t, point, dirs = sweep_first_hit(
        (np.asarray(g.occ) > 0).astype(np.float32), g.origin, g.voxel_size,
        cam.get_pos(), cam.get_view(), 45.0, 1.0, W, H,
        inter_h=256, inter_w=256,
    )
    hit = np.asarray(hit)
    t = np.asarray(t)
    pyr = build_pyramid(g.occ)
    o, d = generate_rays(
        W, H, jnp.asarray(cam.get_pos(), jnp.float32),
        jnp.asarray(cam.get_view(), jnp.float32), 45.0, 1.0,
    )
    ref = trace_octree(pyr, o, d, g.origin, g.voxel_size)
    rh = np.asarray(ref["hit"])
    rt = np.asarray(ref["t"])
    assert (hit == rh).mean() > 0.97  # boundary pixels may differ
    both = hit & rh
    # slice-center quantization: most rays within ~1.5 voxels of the exact
    # tracer; silhouette-grazing rays can land several voxels off
    diff = np.abs(t[both] - rt[both])
    assert np.percentile(diff, 95) < 2.5 / 32
    assert diff.max() < 8.0 / 32


def test_fast_frame_packed_shadow_matches_volume():
    """The shadow bit carried through the sweep (packed +2048 channel) must
    agree with looking the shadow volume up at each hit voxel."""
    from ray_tracing_octrees_tpu.trace.slab_sweep import render_fast_frame

    g = make_sphere_grid(32)
    vol = (np.asarray(g.occ) > 0).astype(np.float32)
    to_light = (0.5, 0.9, 0.4)
    light_dir = tuple(-c for c in to_light)
    sv = shadow_volume(vol, to_light)
    cam = Camera(theta=0.7, phi=1.1, radius=2.0)
    W = H = 64
    img = np.asarray(render_fast_frame(
        vol, sv, g.origin, g.voxel_size, cam.get_pos(), cam.get_view(),
        45.0, 1.0, W, H, light_dir=light_dir, inter_h=256, inter_w=256,
    ))
    img_nosh = np.asarray(render_fast_frame(
        vol, None, g.origin, g.voxel_size, cam.get_pos(), cam.get_view(),
        45.0, 1.0, W, H, light_dir=light_dir, inter_h=256, inter_w=256,
    ))
    hit = img[..., 3] > 0
    assert hit.any()
    # same visibility with and without the shadow channel
    assert np.array_equal(img[..., :3].max(-1) > 0, img_nosh[..., :3].max(-1) > 0)
    # shadowed pixels are exactly the ones whose color dropped to ambient
    shadowed = (np.abs(img[..., :3] - 0.1) < 1e-5).all(-1) & (
        np.abs(img_nosh[..., :3] - 0.1) >= 1e-5
    ).any(-1)
    lit = ~shadowed
    # cross-check against the shadow volume at the hit voxels via the
    # independent exact tracer geometry
    pyr = build_pyramid(g.occ)
    o, d = generate_rays(
        W, H, jnp.asarray(cam.get_pos(), jnp.float32),
        jnp.asarray(cam.get_view(), jnp.float32), 45.0, 1.0,
    )
    ref = trace_octree(pyr, o, d, g.origin, g.voxel_size)
    rh = np.asarray(ref["hit"]).reshape(H, W)
    dn = np.asarray(d / jnp.linalg.norm(d, axis=-1, keepdims=True))
    # same inward nudge as the fast path's voxel lookup
    p = (np.asarray(ref["point"]) + dn * 0.25 * float(g.voxel_size)).reshape(H, W, 3)
    v = np.floor((p - np.asarray(g.origin)) / float(g.voxel_size)).astype(int)
    svn = np.asarray(sv)
    both = rh & (img[..., :3].max(-1) > 0)
    zi = np.clip(v[..., 2], 0, svn.shape[0] - 1)
    yi = np.clip(v[..., 1], 0, svn.shape[1] - 1)
    xi = np.clip(v[..., 0], 0, svn.shape[2] - 1)
    sval = svn[zi, yi, xi]
    # compare only clear-cut voxels: near the shadow terminator the fast
    # path thresholds a bilinearly interpolated value while this check
    # thresholds the voxel's own value, so they legitimately differ there
    clear = both & ((sval < 0.2) | (sval > 0.8))
    assert clear.sum() > 100
    # residual disagreements come from the two paths resolving slightly
    # different hit voxels on grazing rays (slice-quantized vs exact); a
    # broken bit encoding would score ~0.5 or systematically invert
    agree = ((sval > 0.5) == shadowed)[clear]
    assert agree.mean() > 0.9


def test_shadow_volume_directional():
    occ = np.zeros((16, 16, 16), np.uint8)
    occ[8, 8, 8] = 1  # single blocker
    vol = occ.astype(np.float32)
    # light straight down +y: voxels below (smaller y) are occluded
    sv = np.asarray(shadow_volume(vol, (0.0, 1.0, 0.0)))
    assert sv.shape == (16, 16, 16)
    assert sv[8, 4, 8] > 0.5   # below the blocker -> shadowed
    assert sv[8, 12, 8] < 0.5  # above -> lit
    assert sv[8, 4, 12] < 0.5  # offset column -> lit
    # light from +x
    sv = np.asarray(shadow_volume(vol, (1.0, 0.0, 0.0)))
    assert sv[8, 8, 4] > 0.5
    assert sv[8, 8, 12] < 0.5
    # diagonal light
    sv = np.asarray(shadow_volume(vol, (1.0, 1.0, 0.0)))
    assert sv[8, 4, 4] > 0.25  # along -x,-y from the blocker


def test_interior_camera_forward_halfvolume():
    """Fly-through: eye INSIDE the volume bounds sweeps the forward
    half-volume instead of raising / falling back; forward rays match the
    exact tracer."""
    import jax.numpy as jnp
    from ray_tracing_octrees_tpu.core.grid import make_sphere_grid
    from ray_tracing_octrees_tpu.core.octree import build_pyramid
    from ray_tracing_octrees_tpu.render.camera import Camera, generate_rays
    from ray_tracing_octrees_tpu.trace.octree_trace import trace_octree
    from ray_tracing_octrees_tpu.trace.slab_sweep import (
        _sweep_geometry, sweep_first_hit,
    )

    g = make_sphere_grid(64)
    vol = (jnp.asarray(g.occ) > 0).astype(jnp.float32)
    # eye in the empty core (world center ~0, volume spans [-0.5, 0.5])
    # looking +z-ish toward the inner shell
    cam = Camera(theta=0.05, phi=0.1, radius=0.05,
                 target=np.array([0.0, 0.0, 0.3], np.float32))
    pos = cam.get_pos()
    assert (np.abs(pos) < 0.4).all(), pos   # genuinely interior

    geo = _sweep_geometry(vol, np.asarray(g.origin), float(g.voxel_size),
                          pos, cam.get_view())
    crop_lo = geo[5]
    assert crop_lo > 0 or geo[2][0] < vol.shape[0]  # half-volume engaged

    W = H = 96
    hit, t, point, dirs = sweep_first_hit(
        vol, g.origin, g.voxel_size, pos, cam.get_view(), 45.0, 1.0, W, H,
        inter_h=256, inter_w=256,
    )
    hit = np.asarray(hit)
    assert hit.mean() > 0.5   # the shell surrounds the eye ahead

    pyr = build_pyramid(g.occ)
    o, d = generate_rays(W, H, jnp.asarray(pos, jnp.float32),
                         jnp.asarray(cam.get_view(), jnp.float32), 45.0, 1.0)
    ref = trace_octree(pyr, o, d, g.origin, g.voxel_size)
    r_hit = np.asarray(ref["hit"])
    r_t = np.asarray(ref["t"])

    # compare only rays going forward along the chosen sweep axis — the
    # documented approximation drops backward rays and the eye's own slab
    axis = geo[0]
    d_np = np.asarray(d)
    sel_axis = {0: 0, 1: 1, 2: 2}[axis]
    fwd = np.abs(d_np[:, sel_axis]) > 0.35 * np.abs(d_np).max(axis=1)
    mism = (hit != r_hit) & fwd
    assert mism.mean() < 0.03, mism.mean()
    both = hit & r_hit & fwd
    terr = np.abs(np.asarray(t)[both] - r_t[both])
    # voxel-granularity agreement (nearest-cell sweep sampling)
    vs = float(np.asarray(g.voxel_size))
    assert np.quantile(terr, 0.95) < 2.5 * vs


def test_layout_cache_never_serves_stale_on_id_reuse():
    """Regression (VERDICT r2 weak #7): `_LAYOUT_CACHE` is keyed by
    ``id(volume)``; if a volume were GC'd and a new array reused the same
    id, the old layout must NOT be served. The entry pins the source and a
    hit requires identity — simulate the id collision by planting a stale
    entry under the new volume's key with a different source object."""
    from ray_tracing_octrees_tpu.trace import slab_sweep as ss

    g = make_sphere_grid(16)
    vol = (np.asarray(g.occ) > 0).astype(np.float32)
    S, A, B = 16, 16, 16
    key = (id(vol), 0, False, 0, S)
    stale_src = np.zeros_like(vol)
    poison = jnp.full((16, 16, 16), 7.0, jnp.bfloat16)
    ss._LAYOUT_CACHE[key] = (stale_src, poison)
    try:
        out = ss._layout_volume(vol, 0, False, S, A, B)
        assert not np.allclose(np.asarray(out, np.float32), 7.0), \
            "stale layout served for a different source object with same id"
        # and the refreshed entry now pins the real volume
        src, cached = ss._LAYOUT_CACHE[key]
        assert src is vol
        np.testing.assert_array_equal(np.asarray(cached), np.asarray(out))
        # second call: served from cache, identical object
        out2 = ss._layout_volume(vol, 0, False, S, A, B)
        assert out2 is cached
    finally:
        ss._LAYOUT_CACHE.pop(key, None)

    # same guard on the shadow layout entries
    lkey = (id(vol), "shadow", 2)
    ss._LAYOUT_CACHE[lkey] = (stale_src, poison)
    try:
        sh = ss.shadow_volume(vol, (0.1, 0.2, 1.0))
        assert np.asarray(sh).min() >= 0.0
        src, _ = ss._LAYOUT_CACHE[lkey]
        assert src is vol
    finally:
        ss._LAYOUT_CACHE.pop(lkey, None)
