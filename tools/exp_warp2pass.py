"""Two-pass scanline warp (Pallas) vs the XLA warp gather.

out[y, x] = T[iu(y,x), iv(y,x)] decomposed a la Catmull-Smith:
  pass 1: M[y, v] = T[u*(y, v), v]   (sublane-window reduction, lanes aligned)
  pass 2: out[y, x] = M[y, iv(y,x)]  (on M^T, sublane-window reduction)
with u*(y, v) from the closed-form inverse of the row homography. NEAREST
weights throughout (the packed value mixes depth/shadow-bit/miss sentinel
and must not be blended). No lane gathers anywhere — the only Mosaic
gather primitive is a within-128-lane permute, which this design avoids.

Validates element agreement against the direct gather on the bench pose
and times both (pipelined + forced readback).
"""

from __future__ import annotations

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

WIN1 = 64    # pass-1 window over table rows u per (8, 128) block
WIN2 = 256   # pass-2 window over table cols v per (8, 128) block


def _pass1_kernel(t_ref, ius_ref, o_ref):
    ius = ius_ref[:, :]
    umin = jnp.clip(jnp.min(ius), 0, t_ref.shape[0] - WIN1)
    rel = ius - umin

    def body(r, acc):
        row = t_ref[pl.ds(umin + r, 1), :]                   # [1, 128]
        rowb = jnp.broadcast_to(row, acc.shape)
        return acc + jnp.where(rel == r, rowb, 0.0)

    o_ref[:, :] = jax.lax.fori_loop(
        0, WIN1, body, jnp.zeros(ius.shape, jnp.float32))


def _pass2_kernel(mt_ref, ivt_ref, o_ref):
    # outT[x, y] = M[y, iv(y,x)]: y rides the LANES, so the window row
    # mt_ref[v, 128 y-lanes] broadcasts straight across sublanes (x).
    iv = ivt_ref[:, :]                                       # [8 x, 128 y]
    vmin = jnp.clip(jnp.min(iv), 0, mt_ref.shape[0] - WIN2)
    rel = iv - vmin

    def body(r, acc):
        row = mt_ref[pl.ds(vmin + r, 1), :]                  # [1, 128 y]
        rowb = jnp.broadcast_to(row, acc.shape)
        return acc + jnp.where(rel == r, rowb, 0.0)

    o_ref[:, :] = jax.lax.fori_loop(
        0, WIN2, body, jnp.zeros(iv.shape, jnp.float32))


def warp_two_pass(T2, iustar, iv, interpret=False):
    """T2 f32[U, V], iustar int32[H, V], iv int32[H, W] -> f32[H, W]."""
    U, V = T2.shape
    H, W = iv.shape
    assert iustar.shape == (H, V)
    M = pl.pallas_call(
        _pass1_kernel,
        grid=(H // 8, V // 128),
        in_specs=[
            pl.BlockSpec((U, 128), lambda i, j: (0, j)),
            pl.BlockSpec((8, 128), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((H, V), jnp.float32),
        interpret=interpret,
    )(T2, iustar)
    hp = (-H) % 128                                          # y on lanes
    Hp = H + hp
    MT = jnp.transpose(M)                                    # [V, H]
    if hp:
        MT = jnp.pad(MT, ((0, 0), (0, hp)))
    ivT = jnp.transpose(iv)                                  # [W, H]
    if hp:
        ivT = jnp.pad(ivT, ((0, 0), (0, hp)))
    outT = pl.pallas_call(
        _pass2_kernel,
        grid=(W // 8, Hp // 128),
        in_specs=[
            pl.BlockSpec((V, 128), lambda i, j: (0, j)),
            pl.BlockSpec((8, 128), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((W, Hp), jnp.float32),
        interpret=interpret,
    )(MT, ivT)
    return jnp.transpose(outT[:, :H])


def inverse_row_homography(scal_np, axis_world, inter_h, inter_w,
                           width, height):
    """u*(y, v): table row hit by image row y in table column v (closed form).

    For fixed image row y (fixed ny), every sweep-space quantity is a ratio
    of affines in nx; solving vv = v + 0.5 for nx and substituting into uu
    gives u* exactly. Pure elementwise numpy math (also jittable)."""
    from ray_tracing_octrees_tpu.trace.slab_sweep import _AXIS_SELECTORS

    eye_s, eye_a, eye_b, z0 = scal_np[0], scal_np[1], scal_np[2], scal_np[3]
    a_min, a_max, b_min, b_max = scal_np[4:8]
    fov_deg, aspect = scal_np[8], scal_np[9]
    view = scal_np[18:34].reshape(4, 4)
    R = np.linalg.inv(view)[:3, :3].astype(np.float64)
    sel = _AXIS_SELECTORS[axis_world]
    s0, s1, s2 = (np.asarray(s, np.float64) for s in sel)
    G = float(z0 - eye_s)

    tan_half = math.tan(math.radians(float(fov_deg)) / 2.0)
    ny = (1.0 - (np.arange(height, dtype=np.float64) + 0.5) / height * 2.0) \
        * tan_half                                             # [H]
    # nx coefficients: d = nx*R[:,0] + ny*R[:,1] - R[:,2]
    P = R[:, 0] @ s0
    Pa = R[:, 0] @ s1
    Pb = R[:, 0] @ s2
    gam = ny * (R[:, 1] @ s0) - (R[:, 2] @ s0)                 # [H]
    alp = ny * (R[:, 1] @ s1) - (R[:, 2] @ s1)
    bet = ny * (R[:, 1] @ s2) - (R[:, 2] @ s2)

    v = np.arange(inter_w, dtype=np.float64)
    Bv = b_min + (v + 0.5) * (b_max - b_min) / inter_w         # [V]
    num = G * bet[:, None] - (Bv[None, :] - eye_b) * gam[:, None]
    den = (Bv[None, :] - eye_b) * P - G * Pb
    den = np.where(np.abs(den) < 1e-30, 1e-30, den)
    nx = num / den                                             # [H, V]
    d_s = gam[:, None] + P * nx
    d_s = np.where(np.abs(d_s) < 1e-30, 1e-30, d_s)
    d_a = alp[:, None] + Pa * nx
    a_ref = eye_a + G * d_a / d_s
    uu = (a_ref - a_min) / (a_max - a_min) * inter_h
    uu = np.where(np.isfinite(uu), uu, 0.0)
    return np.clip(np.floor(uu), 0, inter_h - 1).astype(np.int32)


def force(x):
    return np.asarray(x[:1, :4])


def main():
    from ray_tracing_octrees_tpu.core.cache import load_voxel_grid
    from ray_tracing_octrees_tpu.core.grid import (
        recenter_filled_voxels, building_center, make_sphere_grid,
    )
    from ray_tracing_octrees_tpu.trace import slab_sweep as ss
    from ray_tracing_octrees_tpu.render.camera import Camera

    p = "/root/reference/sceneCache.bin"
    grid = recenter_filled_voxels(load_voxel_grid(p)) if os.path.exists(p) \
        else make_sphere_grid(256)
    vol = (jnp.asarray(grid.occ) > 0).astype(jnp.float32)
    W, H = 1920, 1088
    extent = float(np.max(np.asarray(grid.world_max) - np.asarray(grid.world_min)))
    cam = Camera(theta=0.9, phi=0.8, radius=0.75 * extent)
    cam.set_target(np.asarray(building_center(grid)))
    aw, flip, (S, A, B), eyes, window, _crop = ss._sweep_geometry(
        vol, grid.origin, grid.voxel_size, cam.get_pos(), cam.get_view())
    vol_bf = ss._layout_volume(vol, aw, flip, S, A, B)
    sp = vol_bf.shape[0]
    scal_np = np.asarray(ss._frame_scalars(
        *eyes[:3], eyes[3], *window, 45.0, W / H, float(grid.voxel_size), S,
        np.asarray(grid.origin, np.float32),
        np.asarray(cam.get_pos(), np.float32), cam.get_view()))
    scal = jax.block_until_ready(jnp.asarray(scal_np))
    packed = jax.block_until_ready(ss._sweep_all(
        vol_bf, scal, sp // 32, S, A, B, 1024, 1024, bool(flip)))
    lin, behind, dirs, dsn = ss._warp_setup(scal, aw, 1024, 1024, W, H)
    lin2 = np.asarray(lin).reshape(H, W)
    iu_np = (lin2 // 1024).astype(np.int32)
    iv_np = (lin2 % 1024).astype(np.int32)
    T2 = jax.block_until_ready(jnp.reshape(packed, (1024, 1024)))

    ius_np = inverse_row_homography(scal_np, aw, 1024, 1024, W, H)
    # consistency of the inversion: u*(y, iv(y,x)) should equal iu(y,x)
    pred = ius_np[np.arange(H)[:, None], iv_np]
    print(f"inverse-homography agreement: {(pred == iu_np).mean():.5f} "
          f"(|diff|>1: {(np.abs(pred - iu_np) > 1).mean():.6f})", flush=True)

    # window bounds (pass 2 runs transposed: tiles are (8 x, 128 y))
    bl = ius_np.reshape(H // 8, 8, 1024 // 128, 128)
    r1 = (bl.max(axis=(1, 3)) - bl.min(axis=(1, 3))).max()
    ivT_np = iv_np.T  # [W, H]
    hp = (-H) % 128
    ivT_pad = np.pad(ivT_np, ((0, 0), (0, hp)), mode="edge")
    bv = ivT_pad.reshape(W // 8, 8, (H + hp) // 128, 128)
    r2 = (bv.max(axis=(1, 3)) - bv.min(axis=(1, 3))).max()
    print(f"pass1 u-window needed {r1} (have {WIN1}); "
          f"pass2 v-window needed {r2} (have {WIN2})", flush=True)

    iustar = jax.block_until_ready(jnp.asarray(ius_np))
    iv = jax.block_until_ready(jnp.asarray(iv_np))
    iu = jax.block_until_ready(jnp.asarray(iu_np))

    ref = np.asarray(T2)[iu_np, iv_np]
    out = np.asarray(warp_two_pass(T2, iustar, iv))
    mm = float((out != ref).mean())
    print(f"two-pass vs direct gather mismatch: {mm:.5f}", flush=True)

    lin_flat = jnp.asarray((iu_np.astype(np.int64) * 1024
                            + iv_np).reshape(-1).astype(np.int32))
    for name, fn in [
        ("xla take", lambda: ss._take(packed, lin_flat)),
        ("two-pass pallas", lambda: warp_two_pass(T2, iustar, iv)),
    ]:
        out = fn()
        force(out.reshape(H, W) if out.ndim == 1 else out)
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        force(out.reshape(H, W) if out.ndim == 1 else out)
        print(f"{name:18s} {(time.perf_counter()-t0)/n*1e3:7.2f} ms", flush=True)
    print("backend:", jax.default_backend(), flush=True)


if __name__ == "__main__":
    main()
