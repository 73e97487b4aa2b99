"""Dual-threshold suspicious-pixel classifier design for the parity fix.

Per pixel, emulate the sweep's per-slab bilinear mass along the PIXEL ray
(the real sweep uses the nearest texel's ray; this bounds the classifier
from the design side), then measure:
  - s_lo: first slab with mass >= eps_lo  (low channel)
  - s_hi: first slab with mass > 0.5      (the shipped detection)
  - recall: do exact-only (false-miss) pixels have an s_lo at all, and
    how far is the exact hit slab from s_lo (consume rounds needed)?
  - flagged fraction: pixels needing an exact re-test under the rule
      suspicious = s_lo exists & (no s_hi | s_lo < s_hi - 0 | bad cell)
CPU, Calgary, parity resolution.
"""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from ray_tracing_octrees_tpu.core.cache import load_voxel_grid
from ray_tracing_octrees_tpu.core.grid import (
    building_center, recenter_filled_voxels)
from ray_tracing_octrees_tpu.core.octree import build_pyramid
from ray_tracing_octrees_tpu.render.camera import Camera, generate_rays
from ray_tracing_octrees_tpu.trace.octree_trace import trace_octree
from ray_tracing_octrees_tpu.trace import slab_sweep as ss

PW, PH = 240, 136
ASPECT = 1920 / 1080

grid = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
vol = (jnp.asarray(grid.occ) > 0).astype(jnp.float32)
occ_np = (np.asarray(grid.occ) > 0).astype(np.float32)   # (Z, Y, X)
pyr = build_pyramid(grid.occ)
extent = float(np.max(np.asarray(grid.world_max) - np.asarray(grid.world_min)))
tgt = np.asarray(building_center(grid))
vs = float(np.asarray(grid.voxel_size))
org = np.asarray(grid.origin, np.float64)


def run(theta, phi, radius_f, label, eps_lo=0.05):
    cam = Camera(theta=theta, phi=phi, radius=radius_f * extent)
    cam.set_target(tgt)
    o, d = generate_rays(PW, PH, jnp.asarray(cam.get_pos(), jnp.float32),
                         jnp.asarray(cam.get_view(), jnp.float32), 45.0,
                         ASPECT)
    ref = trace_octree(pyr, o, d, grid.origin, grid.voxel_size)
    rh = np.asarray(ref["hit"])
    rt = np.asarray(ref["t"])
    rp = np.asarray(ref["point"])
    dn = np.asarray(d)
    n = rh.size

    axis_world, flip, (S, A, B), eyes, window, crop_lo = ss._sweep_geometry(
        vol, grid.origin, grid.voxel_size, cam.get_pos(), cam.get_view())
    eye_s, eye_a, eye_b, z0 = eyes
    sel = ss._AXIS_SELECTORS[axis_world]
    d_s = dn @ sel[0]
    d_a = dn @ sel[1]
    d_b = dn @ sel[2]

    # sweep-order volume [S, A, B]
    perm = {0: (2, 1, 0), 1: (1, 2, 0), 2: (0, 2, 1)}[axis_world]
    vsw = np.transpose(occ_np, perm)
    if flip:
        vsw = vsw[::-1]

    # per-pixel per-slab bilinear mass (vectorized over slabs)
    # slab o (sweep order) <-> world k
    forward = (d_s < 0) if flip else (d_s > 0)
    mass = np.zeros((S, n), np.float32)
    for o_ in range(S):
        k = (S - 1 - o_) if flip else o_
        with np.errstate(divide="ignore", invalid="ignore"):
            t_c = (k + 0.5 - eye_s) * vs / d_s
        pa = eye_a + t_c / vs * d_a - 0.5
        pb = eye_b + t_c / vs * d_b - 0.5
        ia = np.floor(pa).astype(np.int64)
        ib = np.floor(pb).astype(np.int64)
        fa = (pa - ia).astype(np.float32)
        fb = (pb - ib).astype(np.float32)
        m = np.zeros(n, np.float32)
        for da_, wa_ in ((0, 1 - fa), (1, fa)):
            for db_, wb_ in ((0, 1 - fb), (1, fb)):
                aa = ia + da_
                bb = ib + db_
                inb = (aa >= 0) & (aa < A) & (bb >= 0) & (bb < B)
                v = np.zeros(n, np.float32)
                v[inb] = vsw[o_, aa[inb], bb[inb]]
                m += wa_ * wb_ * v
        mass[o_] = np.where(forward & (t_c > 0), m, 0.0)

    hi = mass > 0.5
    lo = mass >= eps_lo
    has_hi = hi.any(0)
    has_lo = lo.any(0)
    s_hi = np.argmax(hi, 0)
    s_lo = np.argmax(lo, 0)

    # exact hit slab (sweep order o)
    p_in = rp + 0.25 * vs * dn
    v_xyz = np.floor((p_in - org[None, :]) / vs)
    k_ex = (v_xyz @ sel[0])
    o_ex = (S - 1 - k_ex) if flip else k_ex

    fm = rh & ~has_hi                      # false misses (vs emulated hi)
    print(f"--- {label} axis={axis_world} S={S}")
    print(f"  emulated-hi hit {has_hi.mean():.4f} vs exact {rh.mean():.4f}; "
          f"false-miss {fm.sum()} ({fm.mean()*100:.2f}%)  "
          f"false-hit {(has_hi & ~rh).sum()}")
    cov = fm & has_lo & (s_lo <= o_ex + 0.5)
    print(f"  low-channel(eps={eps_lo}) covers {cov.sum()}/{fm.sum()} "
          f"false-misses (s_lo<=o_exact)")
    if cov.any():
        gap = (o_ex - s_lo)[cov]
        print(f"  slabs from s_lo to exact hit: mean {gap.mean():.1f} "
              f"p50 {np.percentile(gap,50):.0f} p90 {np.percentile(gap,90):.0f}"
              f" p99 {np.percentile(gap,99):.0f} max {gap.max():.0f}")
    # suspicious set size under the candidate rule
    early_lo = has_hi & has_lo & (s_lo < s_hi)
    susp = (has_lo & ~has_hi) | early_lo
    print(f"  flagged: lo-only {(has_lo & ~has_hi).sum()} "
          f"({(has_lo & ~has_hi).mean()*100:.2f}%)  early-lo {early_lo.sum()} "
          f"({early_lo.mean()*100:.2f}%)  total {susp.mean()*100:.2f}%")
    if early_lo.any():
        gap2 = (s_hi - s_lo)[early_lo]
        print(f"  early-lo slab gap: p50 {np.percentile(gap2,50):.0f} "
              f"p90 {np.percentile(gap2,90):.0f} max {gap2.max():.0f}")
    # do false misses beyond the low channel exist? (irreducible w/o dilation)
    irr = fm & ~cov
    print(f"  irreducible false-misses at eps={eps_lo}: {irr.sum()} "
          f"({irr.sum()/n*100:.3f}% of pixels)")
    return susp.mean(), irr.sum() / n


for eps in (0.05, 0.15):
    print(f"================ eps_lo = {eps}")
    tot_susp, tot_irr = 0.0, 0.0
    for th, ph, rf, lb in [(0.9, 0.8, 0.75, "bench"),
                           (0.3, 0.8, 0.75, "low-theta"),
                           (0.9, 0.2, 0.75, "graze-phi"),
                           (0.9, 0.8, 0.35, "zoom-in")]:
        s_, i_ = run(th, ph, rf, lb, eps)
        tot_susp += s_ / 4
        tot_irr = max(tot_irr, i_)
    print(f"  => avg flagged {tot_susp*100:.2f}%  worst irreducible "
          f"{tot_irr*100:.3f}%")
