"""Detection-threshold trade-off for the fast sweep's parity.

For thresholds thr in a ladder, emulate per-pixel detection (first slab
with bilinear mass > thr), and measure vs the exact tracer: hit-mask
mismatch (split), same-slab/cell rate on agreed hits, and depth RMS after
closed-form entry-t refinement into the detected cell (with an optional
pure-geometry validity fallback: if the ray misses the floor-cell, try the
8 lateral neighbors closed-form and take the earliest valid candidate
whose cell is solid -- solidity read here from numpy; the production
version would need the nb9-style carry or accept no-solidity-check).
CPU, Calgary.
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
occ_np = (np.asarray(grid.occ) > 0).astype(np.float32)
pyr = build_pyramid(grid.occ)
extent = float(np.max(np.asarray(grid.world_max) - np.asarray(grid.world_min)))
tgt = np.asarray(building_center(grid))
vs = float(np.asarray(grid.voxel_size))
org = np.asarray(grid.origin, np.float64)


def pose_mass(theta, phi, radius_f):
    cam = Camera(theta=theta, phi=phi, radius=radius_f * extent)
    cam.set_target(tgt)
    o, d = generate_rays(PW, PH, jnp.asarray(cam.get_pos(), jnp.float32),
                         jnp.asarray(cam.get_view(), jnp.float32), 45.0,
                         ASPECT)
    ref = trace_octree(pyr, o, d, grid.origin, grid.voxel_size)
    dn = np.asarray(d)
    n = dn.shape[0]
    axis_world, flip, (S, A, B), eyes, window, crop_lo = ss._sweep_geometry(
        vol, grid.origin, grid.voxel_size, cam.get_pos(), cam.get_view())
    eye_s, eye_a, eye_b, z0 = eyes
    sel = ss._AXIS_SELECTORS[axis_world]
    d_s = dn @ sel[0]
    d_a = dn @ sel[1]
    d_b = dn @ sel[2]
    perm = {0: (2, 1, 0), 1: (1, 2, 0), 2: (0, 2, 1)}[axis_world]
    vsw = np.transpose(occ_np, perm)
    if flip:
        vsw = vsw[::-1]
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
    geo = dict(axis_world=axis_world, flip=flip, S=S, A=A, B=B,
               eye=(eye_s, eye_a, eye_b), d=(d_s, d_a, d_b), sel=sel,
               vsw=vsw, n=n)
    return mass, ref, geo


def eval_thr(mass, ref, geo, thr, neighbors=True):
    n = geo["n"]
    S, A, B = geo["S"], geo["A"], geo["B"]
    eye_s, eye_a, eye_b = geo["eye"]
    d_s, d_a, d_b = geo["d"]
    flip = geo["flip"]
    vsw = geo["vsw"]
    rh = np.asarray(ref["hit"])
    rt = np.asarray(ref["t"])
    rp = np.asarray(ref["point"])

    hi = mass > thr
    has = hi.any(0)
    o_hit = np.argmax(hi, 0)
    k_hit = (S - 1.0 - o_hit) if flip else o_hit.astype(np.float64)

    with np.errstate(divide="ignore", invalid="ignore"):
        t_c = (k_hit + 0.5 - eye_s) * vs / d_s
    pa = eye_a + t_c / vs * d_a
    pb = eye_b + t_c / vs * d_b
    ca0 = np.floor(pa)
    cb0 = np.floor(pb)

    def cell_entry(kk, aa, bb):
        t0 = np.full(n, -np.inf)
        t1 = np.full(n, np.inf)
        for ro_c, rd_c, lo in ((eye_s, d_s, kk), (eye_a, d_a, aa),
                               (eye_b, d_b, bb)):
            rd_v = rd_c / vs
            with np.errstate(divide="ignore", invalid="ignore"):
                x0 = (lo - ro_c) / rd_v
                x1 = (lo + 1.0 - ro_c) / rd_v
            lo_t = np.minimum(x0, x1)
            hi_t = np.maximum(x0, x1)
            deg = np.abs(rd_v) < 1e-12
            inside = (ro_c >= lo) & (ro_c < lo + 1.0)
            lo_t = np.where(deg, np.where(inside, -np.inf, np.inf), lo_t)
            hi_t = np.where(deg, np.where(inside, np.inf, -np.inf), hi_t)
            t0 = np.maximum(t0, lo_t)
            t1 = np.minimum(t1, hi_t)
        return t0, t1

    def solid(kk, aa, bb):
        o_ = (S - 1 - kk) if flip else kk
        oi = o_.astype(np.int64)
        ai = aa.astype(np.int64)
        bi = bb.astype(np.int64)
        inb = ((oi >= 0) & (oi < S) & (ai >= 0) & (ai < A)
               & (bi >= 0) & (bi < B))
        out = np.zeros(n, bool)
        out[inb] = vsw[oi[inb], ai[inb], bi[inb]] > 0
        return out

    # candidate cells: floor cell + (optionally) 8 lateral neighbors in the
    # hit slab; earliest positive-interval SOLID candidate wins
    best_t = np.full(n, np.inf)
    cand = [(0, 0)] if not neighbors else [
        (0, 0), (-1, 0), (1, 0), (0, -1), (0, 1),
        (-1, -1), (-1, 1), (1, -1), (1, 1)]
    for da_, db_ in cand:
        aa, bb = ca0 + da_, cb0 + db_
        te, tx = cell_entry(k_hit, aa, bb)
        ok = (te <= tx) & (tx > 0) & solid(k_hit, aa, bb)
        t_cand = np.where(ok, np.maximum(te, 0.0), np.inf)
        best_t = np.minimum(best_t, t_cand)
    valid = np.isfinite(best_t)
    hit2 = has & valid         # refined: drop hits with no solid candidate
    t2 = np.where(hit2, best_t, 0.0)

    mism = (hit2 != rh).mean()
    so = (hit2 & ~rh).mean()
    eo = (~hit2 & rh).mean()
    both = hit2 & rh
    rms = (np.sqrt(np.mean(((t2 - rt)[both] / vs) ** 2)) if both.any()
           else 0.0)
    p99 = (np.percentile(np.abs((t2 - rt)[both] / vs), 99) if both.any()
           else 0.0)
    drop = (has & ~valid).mean()
    return dict(mism=mism, so=so, eo=eo, rms=rms, p99=p99, drop=drop)


POSES = [(0.9, 0.8, 0.75, "bench"), (0.3, 0.8, 0.75, "low-theta"),
         (0.9, 0.2, 0.75, "graze-phi"), (0.9, 0.8, 0.35, "zoom-in")]

data = [(lb,) + pose_mass(th, ph, rf) for th, ph, rf, lb in POSES]
for thr in (0.5, 0.35, 0.25, 0.15, 0.08, 0.04):
    print(f"=== thr {thr}")
    for lb, mass, ref, geo in data:
        r = eval_thr(mass, ref, geo, thr)
        print(f"  {lb:10s} mism {r['mism']*100:6.3f}%  "
              f"(sweep-only {r['so']*100:5.3f}% exact-only {r['eo']*100:5.3f}%) "
              f"RMS {r['rms']:6.3f} p99 {r['p99']:6.2f}  "
              f"no-solid-drop {r['drop']*100:5.3f}%")
