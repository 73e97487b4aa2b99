"""Measure per-tile iu/iv ranges for the one-hot MXU warp kernel.

The warp kernel loads a [WIN, 1024] u-window of the packed table per
output tile (tile = 128 x-sublanes x 8 y-lanes of the TRANSPOSED image);
WIN must cover the tile's iu range. This probe computes the range
statistics across a sweep of camera poses on the Calgary scene.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from ray_tracing_octrees_tpu.core.cache import load_voxel_grid
from ray_tracing_octrees_tpu.core.grid import (
    recenter_filled_voxels, building_center, make_sphere_grid,
)
from ray_tracing_octrees_tpu.trace import slab_sweep as ss
from ray_tracing_octrees_tpu.render.camera import Camera


def tile_ranges(field, tw, th):
    """field [H, W] -> per-(th y, tw x) tile (max-min)."""
    H, W = field.shape
    Hp, Wp = -(-H // th) * th, -(-W // tw) * tw
    f = np.pad(field, ((0, Hp - H), (0, Wp - W)), mode="edge")
    b = f.reshape(Hp // th, th, Wp // tw, tw)
    return (b.max(axis=(1, 3)) - b.min(axis=(1, 3)))


def tile_ranges_mm(f_for_min, f_for_max, tw, th):
    """Masked range: min over f_for_min, max over f_for_max, clip empty to 0."""
    H, W = f_for_min.shape
    Hp, Wp = -(-H // th) * th, -(-W // tw) * tw
    fm = np.pad(f_for_min, ((0, Hp - H), (0, Wp - W)), mode="edge")
    fM = np.pad(f_for_max, ((0, Hp - H), (0, Wp - W)), mode="edge")
    bm = fm.reshape(Hp // th, th, Wp // tw, tw).min(axis=(1, 3))
    bM = fM.reshape(Hp // th, th, Wp // tw, tw).max(axis=(1, 3))
    return np.maximum(0, bM - bm)


def main():
    p = "/root/reference/sceneCache.bin"
    grid = recenter_filled_voxels(load_voxel_grid(p)) if os.path.exists(p) \
        else make_sphere_grid(256)
    vol = (np.asarray(grid.occ) > 0).astype(np.float32)
    W, H = 1920, 1088
    extent = float(np.max(np.asarray(grid.world_max) - np.asarray(grid.world_min)))
    tgt = np.asarray(building_center(grid))

    poses = []
    for i in range(10):
        poses.append(dict(theta=0.9 + 0.25 * i, phi=0.8, radius=0.75 * extent))
    for ph in (0.15, 0.4, 1.2, 1.45):
        poses.append(dict(theta=0.9, phi=ph, radius=0.75 * extent))
    for r in (0.3, 0.5, 1.5, 3.0):
        poses.append(dict(theta=2.1, phi=0.7, radius=r * extent))

    worst_u = worst_v = 0
    for pz in poses:
        cam = Camera(**pz)
        cam.set_target(tgt)
        try:
            aw, flip, (S, A, B), eyes, window, _crop = ss._sweep_geometry(
                vol, grid.origin, grid.voxel_size, cam.get_pos(), cam.get_view())
        except ValueError:
            print(f"pose {pz}: interior camera, skipped")
            continue
        scal = ss._frame_scalars(
            *eyes[:3], eyes[3], *window, 45.0, W / H, float(grid.voxel_size), S,
            np.asarray(grid.origin, np.float32),
            np.asarray(cam.get_pos(), np.float32), cam.get_view())
        lin, behind, dirs, dsn = ss._warp_setup(scal, aw, 1024, 1024, W, H)
        lin2 = np.asarray(lin).reshape(H, W)
        iu = (lin2 // 1024).astype(np.int32)
        iv = (lin2 % 1024).astype(np.int32)
        # valid = not behind and in-window BEFORE clipping (out-of-window
        # rays cannot hit the volume: the window contains its projection)
        eye_s, eye_a, eye_b, z0 = (float(scal[i]) for i in range(4))
        a_min, a_max, b_min, b_max = (float(scal[i]) for i in range(4, 8))
        import math as _m
        view = np.asarray(cam.get_view(), np.float64)
        R = np.linalg.inv(view)[:3, :3]
        tan_half = _m.tan(_m.radians(45.0) / 2.0)
        px = ((np.arange(W) + 0.5) / W * 2.0 - 1.0) * (W / H) * tan_half
        py = (1.0 - (np.arange(H) + 0.5) / H * 2.0) * tan_half
        nxg, nyg = np.meshgrid(px, py, indexing="xy")
        d = (nxg[..., None] * R[:, 0] + nyg[..., None] * R[:, 1] - R[:, 2])
        sel = ss._AXIS_SELECTORS[aw]
        d_s = d @ sel[0]
        d_a = d @ sel[1]
        d_b = d @ sel[2]
        vsz = float(grid.voxel_size)
        t_ref = (z0 - eye_s) / np.where(np.abs(d_s / vsz) < 1e-12, 1e-12, d_s / vsz)
        a_ref = eye_a + d_a / vsz * t_ref
        b_ref = eye_b + d_b / vsz * t_ref
        uu = (a_ref - a_min) / (a_max - a_min) * 1024
        vv = (b_ref - b_min) / (b_max - b_min) * 1024
        valid = (t_ref > 0) & (uu >= 0) & (uu < 1024) & (vv >= 0) & (vv < 1024)
        iu_m = np.where(valid, iu, 10**6)   # masked-min trick
        iu_M = np.where(valid, iu, -(10**6))
        ru = tile_ranges_mm(iu_m, iu_M, 128, 8)
        iv_m = np.where(valid, iv, 10**6)
        iv_M = np.where(valid, iv, -(10**6))
        rv = np.maximum(0, tile_ranges_mm(iv_m, iv_M, 128, 8))
        vfrac = valid.mean()
        worst_u = max(worst_u, int(ru.max()))
        worst_v = max(worst_v, int(rv.max()))
        print(f"theta={pz['theta']:.2f} phi={pz['phi']:.2f} r={pz['radius']:.0f} "
              f"axis={aw} valid={vfrac:.2f} "
              f"| iu range max={ru.max():4d} p99={np.percentile(ru, 99):6.1f} "
              f"| iv range max={rv.max():4d} p99={np.percentile(rv, 99):6.1f}")
    print(f"\nWORST: u-window needed {worst_u + 1}, v-window needed {worst_v + 1}")


if __name__ == "__main__":
    main()
