"""One-hot MXU warp kernel: exactness vs the direct gather (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ray_tracing_octrees_tpu.trace.warp_kernel import (
    CONFIG_FAST, CONFIG_WIDE, plan_warp, split_hi_lo, warp_lookup,
)

TH = TW = 1024


def _mk_table(rng):
    # the packed sweep encoding: k + 0.5, optionally +2048, or -1
    k = rng.integers(0, 512, (TH, TW)).astype(np.float32)
    sh = rng.integers(0, 2, (TH, TW)).astype(np.float32) * 2048.0
    miss = rng.random((TH, TW)) < 0.3
    return np.where(miss, -1.0, k + 0.5 + sh).astype(np.float32)


def test_split_hi_lo_exact():
    rng = np.random.default_rng(0)
    t = _mk_table(rng)
    hl = np.asarray(split_hi_lo(jnp.asarray(t)), np.float32)
    assert (hl[:TH] + hl[TH:] == t).all()


def test_split_hi_lo_exact_inside_jit():
    # regression: XLA's allow-excess-precision pass elides f32->bf16->f32
    # convert pairs inside jit, which zeroed the lo plane of a naive
    # astype-based split; the bitcast split must survive compilation
    rng = np.random.default_rng(3)
    t = _mk_table(rng)

    @jax.jit
    def f(x):
        return split_hi_lo(x * 1.0)   # force an in-program producer

    hl = np.asarray(f(jnp.asarray(t)), np.float32)
    assert (hl[:TH] + hl[TH:] == t).all()
    assert (np.abs(hl[TH:]) > 0).any()   # lo plane is genuinely nonzero


@pytest.mark.parametrize("ty,tx,win", [CONFIG_FAST, CONFIG_WIDE])
def test_warp_matches_gather(ty, tx, win):
    rng = np.random.default_rng(1)
    t = _mk_table(rng)
    H, W = 2 * ty, 2 * tx
    yy = np.arange(H)[:, None]
    xx = np.arange(W)[None, :]
    iu = np.clip((yy * 0.9 + xx * 0.05 + 37).astype(np.int32), 0, TH - 1)
    iv = np.clip((xx * 1.7 + yy * 0.2 + 101).astype(np.int32), 0, TW - 1)
    lin = (iu * TW + iv).astype(np.int32)
    lin[0, :5] = -1                       # invalid pixels
    out = np.asarray(warp_lookup(
        split_hi_lo(jnp.asarray(t)), jnp.asarray(lin), ty, tx, win))
    ref = np.where(lin < 0, -1.0, t.reshape(-1)[np.maximum(lin, 0)])
    np.testing.assert_array_equal(out, ref)


def test_warp_narrow_table_single_plane():
    # tw < 1024 tables with the fixed 10-bit lin packing (iu << 10 | iv)
    # and n_planes=1 (bf16-exact +-1 values) — the sweep-exact dead-test
    # warp configuration
    rng = np.random.default_rng(7)
    th, tw = 512, 768
    t = np.where(rng.random((th, tw)) < 0.5, 1.0, -1.0).astype(np.float32)
    ty, tx, win = CONFIG_FAST
    H, W = ty, 2 * tx
    yy = np.arange(H)[:, None]
    xx = np.arange(W)[None, :]
    iu = np.clip((yy * 0.8 + xx * 0.03 + 11).astype(np.int32), 0, th - 1)
    iv = np.clip((xx * 2.3 + yy * 0.4 + 5).astype(np.int32), 0, tw - 1)
    lin = ((iu << 10) | iv).astype(np.int32)
    lin[3, :7] = -1
    out = np.asarray(warp_lookup(
        jnp.asarray(t, jnp.bfloat16), jnp.asarray(lin), ty, tx, win,
        n_planes=1))
    ref = np.where(lin < 0, -1.0, t[iu, iv])
    np.testing.assert_array_equal(out, ref)


def test_warp_window_spanning_groups():
    # iv values straddling several 128-lane groups within one tile
    rng = np.random.default_rng(2)
    t = _mk_table(rng)
    ty, tx, win = CONFIG_WIDE
    H, W = ty, tx
    iu = rng.integers(100, 100 + win - 8, (H, W)).astype(np.int32)
    iv = rng.integers(300, 800, (H, W)).astype(np.int32)
    lin = (iu * TW + iv).astype(np.int32)
    out = np.asarray(warp_lookup(
        split_hi_lo(jnp.asarray(t)), jnp.asarray(lin), ty, tx, win))
    ref = t.reshape(-1)[lin]
    np.testing.assert_array_equal(out, ref)


def test_plan_warp_typical_pose():
    # straight-on view far from the volume: tiny per-tile ranges -> FAST
    from ray_tracing_octrees_tpu.trace.slab_sweep import (
        _AXIS_SELECTORS, _frame_scalars_np, _sweep_geometry,
    )
    from ray_tracing_octrees_tpu.core.grid import make_sphere_grid
    from ray_tracing_octrees_tpu.render.camera import Camera

    grid = make_sphere_grid(64)
    vol = (np.asarray(grid.occ) > 0).astype(np.float32)
    cam = Camera(theta=0.4, phi=0.7, radius=3.0)
    aw, flip, (S, A, B), eyes, window, _crop = _sweep_geometry(
        vol, grid.origin, grid.voxel_size, cam.get_pos(), cam.get_view())
    scal = _frame_scalars_np(
        *eyes[:3], eyes[3], *window, 45.0, 1.0, float(grid.voxel_size), S,
        np.asarray(grid.origin, np.float32),
        np.asarray(cam.get_pos(), np.float32), cam.get_view())
    cfg = plan_warp(scal, _AXIS_SELECTORS, aw, 1024, 1024, 1920, 1088)
    assert cfg in (CONFIG_FAST, CONFIG_WIDE)
    # small frames against a 1024-wide table have steeper per-tile index
    # gradients; the plan must reject rather than clamp
    cfg_small = plan_warp(scal, _AXIS_SELECTORS, aw, 1024, 1024, 256, 256)
    assert cfg_small in (CONFIG_FAST, CONFIG_WIDE, None)


def test_fused_frame_kernel_matches_fallback():
    """warp_frame (ray gen + lookup + shade in one Pallas kernel) must agree
    with the split XLA path (_warp_setup -> gather -> _finish_shade) up to
    8-bit color quantization, everywhere except ulp-boundary texel flips."""
    from ray_tracing_octrees_tpu.core.grid import make_sphere_grid
    from ray_tracing_octrees_tpu.render.camera import Camera
    from ray_tracing_octrees_tpu.trace import slab_sweep as ss

    grid = make_sphere_grid(32)
    vol = (np.asarray(grid.occ) > 0).astype(np.float32)
    to_light = (0.5, 0.9, 0.4)
    sv = ss.shadow_volume(vol, to_light)
    cam = Camera(theta=0.5, phi=0.8, radius=2.2)
    W, H = 256, 64
    ih = iw = 256

    axis_world, flip, (S, A, B), eyes, window, crop = ss._sweep_geometry(
        vol, grid.origin, grid.voxel_size, cam.get_pos(), cam.get_view())
    vol_bf = ss._layout_volume(vol, axis_world, flip, S, A, B, crop)
    scal = ss._frame_scalars(
        *eyes[:3], eyes[3], *window, 45.0, W / H, float(grid.voxel_size), S,
        np.asarray(grid.origin, np.float32),
        np.asarray(cam.get_pos(), np.float32), cam.get_view(),
        tuple(-c for c in to_light), (1.0, 0.8, 0.6), (0.1, 0.1, 0.1))

    common = (vol_bf, sv, scal, vol_bf.shape[0] // 32, S, A, B, ih, iw,
              bool(flip), axis_world, W, H, True)
    ref = np.asarray(ss._frame_fused(*common, warp_cfg=None))
    # win == table height: no u-window clipping regardless of pose, so
    # the only differences left are quantization + ulp texel boundaries
    out = np.asarray(ss._frame_fused(*common, warp_cfg=(32, 128, 256)))
    assert out.shape == ref.shape == (H, W, 4)

    # fallback colors are unquantized and may exceed 1; clamp + quantize
    refq = np.round(np.clip(ref, 0.0, 1.0) * 255.0) / 255.0
    close = np.abs(out - refq).max(axis=-1) <= (1.5 / 255.0)
    assert close.mean() > 0.995, f"pixel agreement {close.mean():.4f}"
    # the frame must actually contain lit, shadowed, and background pixels
    assert (out[..., :3].max(-1) > 0.5).any()
    assert (out[..., :3].max(-1) == 0).any()
