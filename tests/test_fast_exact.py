"""Exact fast frame (trace/fast_exact.py) vs the gather-DDA oracle.

The cube-carrying fast frame must reproduce trace_octree's hit/t per
PIXEL ray (the reference's intersectOctreeIterative first-solid-leaf
semantics, RayTracerBVH.cpp:239-327), with the same grazing-crossing
tolerance discipline as tests/test_sweep_exact.py: the nudged DDA oracle
may skip sub-nudge corner crossings the exact interval test reports;
every observed mismatch must be such a crossing.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ray_tracing_octrees_tpu.core.octree import build_pyramid
from ray_tracing_octrees_tpu.render.camera import Camera, generate_rays
from ray_tracing_octrees_tpu.trace.octree_trace import trace_octree
from ray_tracing_octrees_tpu.trace.fast_exact import (
    fast_exact_first_hit,
    render_fast_exact_frame,
)
from ray_tracing_octrees_tpu.trace.slab_sweep import shadow_volume

ORIGIN = np.array([-20.0, -16.0, -12.0], np.float32)
VS = 1.0
W, H = 96, 72
LIGHT = (-0.5, -0.9, -0.4)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    occ = (rng.random((24, 32, 40)) < 0.08).astype(np.uint8)
    vol = (jnp.asarray(occ) > 0).astype(jnp.float32)
    pyr = build_pyramid(jnp.asarray(occ))
    return occ, vol, pyr


@pytest.fixture(scope="module")
def dense_scene():
    """Solid-ish blocks: exercises consecutive-candidate runs and the
    cube's first-slab ordering (random sparse scenes rarely stack)."""
    rng = np.random.default_rng(3)
    occ = np.zeros((24, 32, 40), np.uint8)
    for _ in range(12):
        z, y, x = rng.integers(0, 16, 3)
        dz, dy, dx = rng.integers(2, 8, 3)
        occ[z:z + dz, y:y + dy, x:x + dx] = 1
    vol = (jnp.asarray(occ) > 0).astype(jnp.float32)
    pyr = build_pyramid(jnp.asarray(occ))
    return occ, vol, pyr


def _cam(theta, phi, radius):
    cam = Camera(theta=theta, phi=phi, radius=radius)
    cam.target = np.zeros(3, np.float32)
    return cam


def _assert_grazing(mism_idx, o, d, t_a, t_b, occ):
    o64 = np.asarray(o, np.float64)
    d64 = np.asarray(d, np.float64)
    dz, dy, dx = occ.shape
    for i in mism_idx:
        found = False
        t_hi = float(max(t_a[i], t_b[i]))
        for t in np.arange(0.0, t_hi + 1.0, 2.5e-4):
            p = o64[i] + d64[i] * t
            v = np.floor((p - ORIGIN) / VS).astype(int)
            if (v < 0).any() or v[2] >= dz or v[1] >= dy or v[0] >= dx:
                continue
            if occ[v[2], v[1], v[0]]:
                lo = ORIGIN + v
                t0 = (lo - o64[i]) / d64[i]
                t1 = (lo + 1.0 - o64[i]) / d64[i]
                tin = np.minimum(t0, t1).max()
                tout = np.maximum(t0, t1).min()
                assert tout - tin < 2e-3, (
                    f"ray {i}: mismatch not grazing (width {tout - tin})")
                found = True
                break
        assert found, f"ray {i}: mismatch with no solid crossing"


@pytest.mark.parametrize("fixture_name,pose", [
    ("scene", (0.7, 0.5, 120.0)),
    ("scene", (1.1, 1.0, 70.0)),
    ("scene", (2.4, 0.3, 100.0)),
    ("dense_scene", (0.7, 0.5, 120.0)),
    ("dense_scene", (1.9, 1.2, 80.0)),
])
def test_first_hit_matches_dda_oracle(request, fixture_name, pose):
    occ, vol, pyr = request.getfixturevalue(fixture_name)
    cam = _cam(*pose)
    out = fast_exact_first_hit(vol, ORIGIN, VS, cam.get_pos(),
                               cam.get_view(), 45.0, W / H, W, H)
    assert out is not None, "exterior pose must be supported"
    hit, t, point, dirs = out
    o, d = generate_rays(W, H, jnp.asarray(cam.get_pos(), jnp.float32),
                         jnp.asarray(cam.get_view(), jnp.float32),
                         45.0, W / H)
    ref = trace_octree(pyr, o, d, jnp.asarray(ORIGIN), jnp.float32(VS))
    h1 = np.asarray(hit)
    h2 = np.asarray(ref["hit"])
    mism = np.nonzero(h1 != h2)[0]
    assert len(mism) <= 3, f"{len(mism)} mismatches"
    assert not (h2 & ~h1).any(), "fast-exact must never miss an oracle hit"
    _assert_grazing(mism, o, d, np.asarray(t), np.asarray(ref["t"]), occ)
    both = h1 & h2
    np.testing.assert_allclose(np.asarray(t)[both],
                               np.asarray(ref["t"])[both],
                               rtol=0, atol=2e-3)


def test_frame_image_runs_and_shadow_sane(scene):
    occ, vol, pyr = scene
    shadow = shadow_volume(vol, tuple(-c for c in LIGHT))
    cam = _cam(0.7, 0.5, 120.0)
    out = render_fast_exact_frame(
        vol, shadow, ORIGIN, VS, cam.get_pos(), cam.get_view(),
        45.0, W / H, W, H, light_dir=LIGHT, with_stats=True)
    assert out is not None
    img, stats = out
    img = np.asarray(img)
    assert img.shape == (H, W, 4)
    assert np.isfinite(img).all()
    assert (img[..., :3] > 0).any()
    # hit mask from the image must match the oracle's (lit or ambient
    # pixels are exactly the hits)
    o, d = generate_rays(W, H, jnp.asarray(cam.get_pos(), jnp.float32),
                         jnp.asarray(cam.get_view(), jnp.float32),
                         45.0, W / H)
    ref = trace_octree(pyr, o, d, jnp.asarray(ORIGIN), jnp.float32(VS))
    h_img = (img[..., :3].max(axis=-1) > 0).reshape(-1)
    h2 = np.asarray(ref["hit"])
    assert (h_img != h2).sum() <= 3


def test_interior_pose_returns_none(scene):
    occ, vol, pyr = scene
    cam = _cam(0.7, 0.5, 5.0)     # inside the volume
    out = fast_exact_first_hit(vol, ORIGIN, VS, cam.get_pos(),
                               cam.get_view(), 45.0, W / H, W, H)
    assert out is None


def _wide_tap_setup():
    """A scene+pose that forces the 5-tap detection envelope (ta=5) —
    the configuration whose tap-word einsums silently corrupted under
    the round-3 exact_acc path (bf16 demotion of f32 partial sums;
    fixed in mesh_grid.exact_tap_words). Synthetic-scene coverage was
    previously 3-tap only, so the leak passed CI for two rounds while
    missing 0.086% of Calgary bench-pose pixels."""
    rng = np.random.default_rng(7)
    occ = np.zeros((16, 40, 160), np.uint8)          # (Z, Y, X): long x
    occ[2:14, 4:36, 8:152] = (rng.random((12, 32, 144)) < 0.05)
    vol = (jnp.asarray(occ) > 0).astype(jnp.float32)
    pyr = build_pyramid(jnp.asarray(occ))
    # high orbit over the long-x scene: sweep axis z (S=16) with lateral
    # a = x (160) gives corner-ray slopes > 1 voxel/slab => 5 a-taps
    cam = Camera(theta=0.3, phi=1.2, radius=100.0)
    cam.target = np.zeros(3, np.float32)
    return occ, vol, pyr, cam


def test_wide_tap_envelope_is_exact():
    from ray_tracing_octrees_tpu.trace import sweep_exact as se

    occ, vol, pyr, cam = _wide_tap_setup()
    ok, cfg = se.sweep_exact_setup(vol, ORIGIN, VS, cam.get_pos(),
                                   cam.get_view())
    assert ok
    assert max(cfg["ta"], cfg["tb"]) == 5, (
        f"pose must exercise the wide-tap envelope, got "
        f"({cfg['ta']},{cfg['tb']})")
    out = fast_exact_first_hit(vol, ORIGIN, VS, cam.get_pos(),
                               cam.get_view(), 45.0, W / H, W, H)
    assert out is not None
    hit, t, _, _ = out
    o, d = generate_rays(W, H, jnp.asarray(cam.get_pos(), jnp.float32),
                         jnp.asarray(cam.get_view(), jnp.float32),
                         45.0, W / H)
    ref = trace_octree(pyr, o, d, jnp.asarray(ORIGIN), jnp.float32(VS))
    h1 = np.asarray(hit)
    h2 = np.asarray(ref["hit"])
    mism = np.nonzero(h1 != h2)[0]
    assert len(mism) <= 3, f"{len(mism)} mismatches on the 5-tap envelope"
    assert not (h2 & ~h1).any(), "must never miss an oracle hit"
    _assert_grazing(mism, o, d, np.asarray(t), np.asarray(ref["t"]), occ)
    both = h1 & h2
    np.testing.assert_allclose(np.asarray(t)[both],
                               np.asarray(ref["t"])[both],
                               rtol=0, atol=2e-3)
