"""Experimental Pallas warp kernel: replace the 16 ms final-warp gather.

out[y, x] = T[iu(y,x), iv(y,x)] via per-(8,128)-block windowed row select
(iu spans <64 rows per block for real cameras — measured <=52 across 4
poses) + lane-wise take_along_axis for the column gather. Host checks the
window bound and falls back to jnp.take.

Validates against the XLA gather on the bench pose, then times both with
pipelined loops + forced tiny readback (block_until_ready lies for
pallas_call on this tunnel).
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

WIN = 64


def _warp_kernel(t_ref, iu_ref, iv_ref, o_ref):
    f32 = jnp.float32
    iu = iu_ref[:, :]
    iv = iv_ref[:, :]
    umin = jnp.clip(jnp.min(iu), 0, t_ref.shape[0] - WIN)
    rel = iu - umin

    def body(r, acc):
        row = t_ref[pl.ds(umin + r, 1), :]                     # [1, C]
        rowb = jnp.broadcast_to(row, (iu.shape[0], row.shape[1]))
        g = jnp.take_along_axis(rowb, iv, axis=1)              # [8, 128]
        return acc + jnp.where(rel == r, g, f32(0.0))

    o_ref[:, :] = jax.lax.fori_loop(
        0, WIN, body, jnp.zeros(iu.shape, f32))


def warp_pallas(T2, iu, iv, interpret=False):
    H, W = iu.shape
    assert H % 8 == 0 and W % 128 == 0
    grid = (H // 8, W // 128)
    return pl.pallas_call(
        _warp_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(T2.shape, lambda i, j: (0, 0)),
            pl.BlockSpec((8, 128), lambda i, j: (i, j)),
            pl.BlockSpec((8, 128), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        interpret=interpret,
    )(T2, iu, iv)


def force(x):
    """Honest completion: device-slice then tiny host transfer."""
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
    W, H = 1920, 1088  # pad rows to 8
    extent = float(np.max(np.asarray(grid.world_max) - np.asarray(grid.world_min)))
    cam = Camera(theta=0.9, phi=0.8, radius=0.75 * extent)
    cam.set_target(np.asarray(building_center(grid)))
    aw, flip, (S, A, B), eyes, window, _crop = ss._sweep_geometry(
        vol, grid.origin, grid.voxel_size, cam.get_pos(), cam.get_view())
    vol_bf = ss._layout_volume(vol, aw, flip, S, A, B)
    sp = vol_bf.shape[0]
    scal = jax.block_until_ready(jnp.asarray(np.asarray(ss._frame_scalars(
        *eyes[:3], eyes[3], *window, 45.0, W / H, float(grid.voxel_size), S,
        np.asarray(grid.origin, np.float32),
        np.asarray(cam.get_pos(), np.float32), cam.get_view()))))
    packed = jax.block_until_ready(ss._sweep_all(
        vol_bf, scal, sp // 32, S, A, B, 1024, 1024, bool(flip)))
    lin, behind, dirs, dsn = ss._warp_setup(scal, aw, 1024, 1024, W, H)
    lin2 = jnp.reshape(lin, (H, W))
    iu = jax.block_until_ready((lin2 // 1024).astype(jnp.int32))
    iv = jax.block_until_ready((lin2 % 1024).astype(jnp.int32))
    T2 = jax.block_until_ready(jnp.reshape(packed, (1024, 1024)))

    # host-side window check (the production wiring would fall back)
    iun = np.asarray(iu)
    blk = iun.reshape(H // 8, 8, W // 128, 128)
    rng = (blk.max(axis=(1, 3)) - blk.min(axis=(1, 3))).max()
    print(f"max iu block range: {rng} (window {WIN})", flush=True)

    ref = np.asarray(ss._take(packed, jnp.reshape(iu * 1024 + iv, (-1,)))).reshape(H, W)

    out = warp_pallas(T2, iu, iv)
    got = np.asarray(out)
    ok = np.array_equal(got, ref)
    print(f"pallas warp exact match: {ok}"
          + ("" if ok else f"  (mismatch {np.mean(got != ref):.4f})"), flush=True)

    # timing: pipelined + forced readback
    for name, fn in [
        ("xla take", lambda: ss._take(packed, jnp.reshape(iu, (-1,)) * 1024 + jnp.reshape(iv, (-1,)))),
        ("pallas warp", lambda: warp_pallas(T2, iu, iv)),
    ]:
        out = fn(); force(out.reshape(H, W) if out.ndim == 1 else out)
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        force(out.reshape(H, W) if out.ndim == 1 else out)
        print(f"{name:14s} {(time.perf_counter()-t0)/n*1e3:7.2f} ms "
              f"(pipelined, forced readback)", flush=True)
    print("backend:", jax.default_backend(), flush=True)


if __name__ == "__main__":
    main()
