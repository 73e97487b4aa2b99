"""One-hot MXU warp kernel experiment (exact replacement for the XLA gather).

out[y, x] = T[iu(y,x), iv(y,x)] computed per (128 x, 8 y) tile of the
TRANSPOSED image as

    A[p, r']   = sum_c onehot_v[p, c] * Tw[r', c]     (one bf16 MXU matmul)
    out[p]     = sum_r (A[p, r] + A[p, WIN + r]) * (rel_u[p] == r)

with Tw = the per-tile u-window of the hi/lo-split table stacked along
sublanes ([2*WIN, 1024]). One-hot weights are exact in bf16 and each
pixel receives exactly one product, so the result is bit-identical to
jnp.take on the f32 table (hi + lo reconstructs the f32 value exactly
for the packed depth/shadow encoding, all values <= 2560.5 with 0.5
granularity).

Validates exactness against jnp.take on the bench pose and times both
(pipelined, varied inputs, forced readback).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 1024  # table rows (u)
TW = 1024  # table cols (v)


def _kernel(win: int, t_ref, lin_ref, o_ref):
    lin = lin_ref[:, :]                         # [8 y, 128 x] int32, -1 invalid
    invalid = lin < 0
    iu = jnp.where(invalid, TH - 1, lin >> 10)
    iv = jnp.where(invalid, 0, lin & (TW - 1))
    # sublane slice starts must be 8-aligned for Mosaic
    umin = (jnp.clip(jnp.min(iu), 0, TH - win) >> 3) << 3
    umin = pl.multiple_of(umin, 8)
    rel_u = jnp.clip(iu - umin, 0, win - 1)

    tw_hi = t_ref[pl.ds(umin, win), :]          # [win, 1024] bf16
    tw_lo = t_ref[pl.ds(TH + umin, win), :]
    tw = jnp.concatenate([tw_hi, tw_lo], axis=0)   # [2*win, 1024]

    civ = jax.lax.broadcasted_iota(jnp.int32, (8, 128, TW), 2)
    V = (civ == iv[:, :, None]).astype(jnp.bfloat16)
    V2 = V.reshape(8 * 128, TW)
    A = jax.lax.dot_general(
        V2, tw, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                            # [1024 p, 2*win]
    A3 = A.reshape(8, 128, 2 * win)
    riota = jax.lax.broadcasted_iota(jnp.int32, (8, 128, win), 2)
    mask = (riota == rel_u[:, :, None]).astype(jnp.float32)
    val = ((A3[:, :, :win] + A3[:, :, win:]) * mask).sum(axis=2)
    o_ref[:, :] = jnp.where(invalid, -1.0, val)


@functools.partial(jax.jit, static_argnames=("win",))
def onehot_warp(t_hl, lin2d, win: int):
    """t_hl bf16[2*TH, TW] (hi rows then lo rows), lin2d int32[H, W] -> f32[H, W]."""
    Hp, Wp = lin2d.shape
    return pl.pallas_call(
        functools.partial(_kernel, win),
        grid=(Hp // 8, Wp // 128),
        in_specs=[
            pl.BlockSpec((2 * TH, TW), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
    )(t_hl, lin2d)


def _kernel_grouped(win: int, t_ref, lin_ref, o_ref, a_scr):
    """Variant: contraction over c split into 128-lane groups; groups
    outside the tile's v-range are skipped with pl.when (2-3 of 8 active)."""
    lin = lin_ref[:, :]
    invalid = lin < 0
    iu = jnp.where(invalid, TH - 1, lin >> 10)
    # invalid pixels must not inflate the group range: park them on the
    # valid minimum
    iv0 = jnp.where(invalid, TW - 1, lin & (TW - 1))
    iv = jnp.where(invalid, jnp.min(iv0), iv0)
    umin = (jnp.clip(jnp.min(iu), 0, TH - win) >> 3) << 3
    umin = pl.multiple_of(umin, 8)
    rel_u = jnp.clip(iu - umin, 0, win - 1)

    tw_hi = t_ref[pl.ds(umin, win), :]
    tw_lo = t_ref[pl.ds(TH + umin, win), :]
    tw = jnp.concatenate([tw_hi, tw_lo], axis=0)   # [2*win, 1024]

    gmin = jnp.min(iv) >> 7
    gmax = jnp.max(iv) >> 7
    a_scr[:, :] = jnp.zeros((8 * 128, 2 * win), jnp.float32)
    for g in range(TW // 128):                     # static unroll
        @pl.when((g >= gmin) & (g <= gmax))
        def _():
            civ = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 2) + g * 128
            Vg = (civ == iv[:, :, None]).astype(jnp.bfloat16).reshape(8 * 128, 128)
            twg = tw[:, g * 128:(g + 1) * 128]     # [2*win, 128] static slice
            a_scr[:, :] += jax.lax.dot_general(
                Vg, twg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    A3 = a_scr[:, :].reshape(8, 128, 2 * win)
    riota = jax.lax.broadcasted_iota(jnp.int32, (8, 128, win), 2)
    mask = (riota == rel_u[:, :, None]).astype(jnp.float32)
    val = ((A3[:, :, :win] + A3[:, :, win:]) * mask).sum(axis=2)
    o_ref[:, :] = jnp.where(invalid, -1.0, val)


@functools.partial(jax.jit, static_argnames=("win",))
def onehot_warp_grouped(t_hl, lin2d, win: int):
    Hp, Wp = lin2d.shape
    return pl.pallas_call(
        functools.partial(_kernel_grouped, win),
        grid=(Hp // 8, Wp // 128),
        in_specs=[
            pl.BlockSpec((2 * TH, TW), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8 * 128, 2 * win), jnp.float32)],
    )(t_hl, lin2d)


def split_hi_lo(packed2d):
    hi = packed2d.astype(jnp.bfloat16)
    lo = (packed2d - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo], axis=0)


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
    tgt = np.asarray(building_center(grid))

    # ---- build per-pose inputs on the bench pose + 3 orbit neighbours
    tables, lins, refs = [], [], []
    for i in range(4):
        cam = Camera(theta=0.9 + 0.02 * i, phi=0.8, radius=0.75 * extent)
        cam.set_target(tgt)
        aw, flip, (S, A, B), eyes, window, _crop = ss._sweep_geometry(
            vol, grid.origin, grid.voxel_size, cam.get_pos(), cam.get_view())
        vol_bf = ss._layout_volume(vol, aw, flip, S, A, B)
        sp = vol_bf.shape[0]
        scal = ss._frame_scalars(
            *eyes[:3], eyes[3], *window, 45.0, W / H, float(grid.voxel_size), S,
            np.asarray(grid.origin, np.float32),
            np.asarray(cam.get_pos(), np.float32), cam.get_view())
        packed = jax.block_until_ready(ss._sweep_all(
            vol_bf, scal, sp // 32, S, A, B, TH, TW, bool(flip)))
        lin, behind, dirs, dsn = ss._warp_setup(scal, aw, TH, TW, W, H)
        lin_np = np.asarray(lin).reshape(H, W)
        behind_np = np.asarray(behind).reshape(H, W)
        lin_np = np.where(behind_np, -1, lin_np)
        T2 = jnp.reshape(packed, (TH, TW))
        t_hl = jax.block_until_ready(split_hi_lo(T2))
        tables.append(t_hl)
        lins.append(jax.block_until_ready(jnp.asarray(lin_np)))
        refs.append((np.asarray(T2), lin_np))

    # hi/lo split exactness on host
    T2np, lin_np = refs[0]
    hl = np.asarray(tables[0], np.float32)
    recon = hl[:TH] + hl[TH:]
    print("hi/lo split exact:", bool((recon == T2np).all()), flush=True)

    # ---- correctness vs direct gather (valid pixels)
    for name, fn, win in (("plain", onehot_warp, 64), ("plain", onehot_warp, 128),
                          ("grouped", onehot_warp_grouped, 64)):
        out = np.asarray(fn(tables[0], lins[0], win))              # [H, W]
        valid = lin_np >= 0
        ref = T2np.reshape(-1)[np.where(valid, lin_np, 0)]
        mm = float((out != ref)[valid].mean())
        print(f"{name} win={win}: mismatch on valid pixels = {mm:.7f}", flush=True)

    # ---- timing: pipelined loop, varied inputs, forced readback first
    lin_flat = jnp.asarray(np.where(lin_np < 0, 0, lin_np).reshape(-1))
    packed_flat = jnp.reshape(jnp.asarray(T2np), (-1,))
    take = jax.jit(lambda t, i: jnp.take(t, i))
    force(np.asarray(onehot_warp(tables[0], lins[0], 64))[None, :4])
    for name, fn in [
        ("xla take", lambda k: take(packed_flat, lin_flat)),
        ("onehot warp w64", lambda k: onehot_warp(tables[k % 4], lins[k % 4], 64)),
        ("onehot warp w128", lambda k: onehot_warp(tables[k % 4], lins[k % 4], 128)),
        ("grouped warp w64", lambda k: onehot_warp_grouped(tables[k % 4], lins[k % 4], 64)),
        ("grouped warp w128", lambda k: onehot_warp_grouped(tables[k % 4], lins[k % 4], 128)),
    ]:
        out = fn(0)
        jax.block_until_ready(out)
        force(out.reshape(-1)[:8].reshape(1, -1))
        n = 20
        t0 = time.perf_counter()
        outs = [fn(k) for k in range(n)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / n * 1e3
        force(outs[-1].reshape(-1)[:8].reshape(1, -1))
        print(f"{name:18s} {dt:7.2f} ms", flush=True)
    print("backend:", jax.default_backend(), flush=True)


if __name__ == "__main__":
    main()
