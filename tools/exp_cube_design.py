"""Validate the carry-the-cube exact fast-frame design (round 5).

Design: the chunk loop computes per-(texel, slab) conservative candidate
bits (widened-footprint tap bits & footprint mask — sweep_exact's
detection), carries per texel:
    o_base  = first candidate slab,
    bits[j] = tap-bit words at slabs o_base + j (j = 0..D-1),
    o_next  = first candidate slab >= o_base + D,
and the per-pixel epilogue resolves the exact first hit closed-form from
the cube (texel-center floor cells are recomputable closed-form).
Unresolved pixels (cube miss with o_next, or lateral overflow) go to a
compacted consume fallback.

This probe uses the REAL detection field (sweep_exact internals) plus a
numpy emulation of the carried bits + pixel cube DDA, and measures:
  - parity vs trace_octree (expected ~0 mismatches)
  - cube resolution rate by depth D, suspicious fraction, fallback steps
CPU, Calgary, parity resolution + 960x540.
"""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ray_tracing_octrees_tpu.core.cache import load_voxel_grid
from ray_tracing_octrees_tpu.core.grid import (
    building_center, recenter_filled_voxels)
from ray_tracing_octrees_tpu.core.octree import build_pyramid
from ray_tracing_octrees_tpu.render.camera import Camera, generate_rays
from ray_tracing_octrees_tpu.trace.octree_trace import trace_octree
from ray_tracing_octrees_tpu.trace import slab_sweep as ss
from ray_tracing_octrees_tpu.trace import sweep_exact as se
from ray_tracing_octrees_tpu.trace.mesh_grid import _sweep_candidates

PW, PH = 240, 136
ASPECT = 1920 / 1080
D = 3   # cube depth in slabs

grid = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
vol = (jnp.asarray(grid.occ) > 0).astype(jnp.float32)
occ_np = (np.asarray(grid.occ) > 0).astype(np.float32)
pyr = build_pyramid(grid.occ)
extent = float(np.max(np.asarray(grid.world_max) - np.asarray(grid.world_min)))
tgt = np.asarray(building_center(grid))
vs = float(np.asarray(grid.voxel_size))


def run(theta, phi, radius_f, label, pw=PW, ph=PH):
    cam = Camera(theta=theta, phi=phi, radius=radius_f * extent)
    cam.set_target(tgt)
    ok, cfg = se.sweep_exact_setup(vol, grid.origin, grid.voxel_size,
                                   cam.get_pos(), cam.get_view())
    if not ok:
        print(f"--- {label}: outside sweep-exact envelope, skipped")
        return
    axis_world = cfg["axis_world"]
    flip = cfg["flip"]
    S, A, B = cfg["S"], cfg["A"], cfg["B"]
    IH, IW = cfg["IH"], cfg["IW"]
    ta, tb = cfg["ta"], cfg["tb"]
    occ_sw = cfg["occ_sw"]
    sp = occ_sw.shape[0]
    scal = cfg["scal_np"].copy()
    scal[8], scal[9] = 45.0, ASPECT
    scal_j = jnp.asarray(scal)
    eye_s, eye_a, eye_b, z0 = (float(scal[0]), float(scal[1]),
                               float(scal[2]), float(scal[3]))
    a_min, a_max, b_min, b_max = (float(scal[4]), float(scal[5]),
                                  float(scal[6]), float(scal[7]))

    hats = se._widened_perspective_hats(scal_j, sp, S, A, B, IH, IW,
                                        flip, ta, tb)
    bits_tex = np.asarray(_sweep_candidates(
        (occ_sw > 0).astype(jnp.bfloat16), hats, sp // 32, S, A, B,
        IH, IW, flip, exact_acc=(ta > 3 or tb > 3)))   # [IH*IW, C]
    C = bits_tex.shape[1]

    # expand words -> per-slab candidate bool [T, sp]
    wshift = np.arange(32, dtype=np.int64)
    slabbits = ((bits_tex[:, :, None].astype(np.int64) >> wshift[None, None])
                & 1).reshape(-1, C * 32)[:, :sp].astype(bool)  # [T, sp]

    # exact reference
    o, d = generate_rays(pw, ph, jnp.asarray(cam.get_pos(), jnp.float32),
                         jnp.asarray(cam.get_view(), jnp.float32), 45.0,
                         ASPECT)
    ref = trace_octree(pyr, o, d, grid.origin, grid.voxel_size)
    rh = np.asarray(ref["hit"])
    rt = np.asarray(ref["t"])
    dn = np.asarray(d)
    n = dn.shape[0]

    sel = ss._AXIS_SELECTORS[axis_world]
    d_s = dn @ sel[0]
    d_a = dn @ sel[1]
    d_b = dn @ sel[2]
    rds, rda, rdb = d_s / vs, d_a / vs, d_b / vs   # voxel-units per world t

    forward = (rds < 0) if flip else (rds > 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        safe = np.where(np.abs(rds) < 1e-12, 1e-12, rds)
        ua = eye_a + (z0 - eye_s) * rda / safe
        ub = eye_b + (z0 - eye_s) * rdb / safe
    in_win = (ua >= a_min) & (ua <= a_max) & (ub >= b_min) & (ub <= b_max)
    ti = np.clip(np.floor((ua - a_min) / (a_max - a_min) * IH).astype(np.int64),
                 0, IH - 1)
    tj = np.clip(np.floor((ub - b_min) / (b_max - b_min) * IW).astype(np.int64),
                 0, IW - 1)
    texrow = ti * IW + tj
    live0 = forward & in_win

    # texel-center window coords (for closed-form texel floor cells)
    ua0 = a_min + (a_max - a_min) * (ti + 0.5) / IH
    ub0 = b_min + (b_max - b_min) * (tj + 0.5) / IW

    # sweep-order occupancy numpy
    vsw = np.asarray(occ_sw, np.float32) > 0    # [sp, A, B] (padded)

    ra, rb = (ta - 1) // 2, (tb - 1) // 2

    def texel_floor(o_slab):
        k = (S - 1.0 - o_slab) if flip else o_slab.astype(np.float64)
        inv_s = (k + 0.5 - eye_s) / (z0 - eye_s)
        pa0 = eye_a + (ua0 - eye_a) * inv_s
        pb0 = eye_b + (ub0 - eye_b) * inv_s
        return np.floor(pa0), np.floor(pb0), k

    def cube_bits(o_slab, ca0, cb0):
        """Emulated carried tap-bit word at slab o for each row: bit
        tb*(da+ra)+(db+rb) = occ at (o, ca0+da-ra.., )."""
        w = np.zeros(n, np.int64)
        oi = o_slab.astype(np.int64)
        val = (oi >= 0) & (oi < sp)
        for i_a in range(ta):
            for i_b in range(tb):
                aa = (ca0 + i_a - ra).astype(np.int64)
                bb = (cb0 + i_b - rb).astype(np.int64)
                inb = val & (aa >= 0) & (aa < A) & (bb >= 0) & (bb < B)
                v = np.zeros(n, bool)
                v[inb] = vsw[oi[inb], aa[inb], bb[inb]]
                w |= v.astype(np.int64) << (i_a * tb + i_b)
        return w

    def cube_test(o_slab, active):
        """Exact test of slab o for each active row. Returns (hitmask,
        t_entry, overflow_mask: candidate cell outside tap window)."""
        ca0, cb0, k = texel_floor(o_slab)
        bits = cube_bits(o_slab, ca0, cb0)
        t0s = np.full(n, -np.inf)
        t1s = np.full(n, np.inf)
        for ro_c, rd_c, lo in ((eye_s, rds, k),):
            with np.errstate(divide="ignore", invalid="ignore"):
                x0 = (lo - ro_c) / rd_c
                x1 = (lo + 1.0 - ro_c) / rd_c
            t0s = np.minimum(x0, x1)
            t1s = np.maximum(x0, x1)
        best = np.full(n, np.inf)
        over = np.zeros(n, bool)
        # candidate lateral cells: all cells the ray crosses within the
        # slab's s-interval; enumerate the tap window and also detect
        # whether the ray's lateral range exceeds it
        for da_ in range(-ra, ra + 1):
            for db_ in range(-rb, rb + 1):
                aa = ca0 + da_
                bb = cb0 + db_
                t0 = np.maximum(t0s, -np.inf)
                t1 = np.minimum(t1s, np.inf)
                for ro_c, rd_c, lo in ((eye_a, rda, aa), (eye_b, rdb, bb)):
                    with np.errstate(divide="ignore", invalid="ignore"):
                        x0 = (lo - ro_c) / rd_c
                        x1 = (lo + 1.0 - ro_c) / rd_c
                    lo_t = np.minimum(x0, x1)
                    hi_t = np.maximum(x0, x1)
                    deg = np.abs(rd_c) < 1e-12
                    inside = (ro_c >= lo) & (ro_c < lo + 1.0)
                    lo_t = np.where(deg, np.where(inside, -np.inf, np.inf),
                                    lo_t)
                    hi_t = np.where(deg, np.where(inside, np.inf, -np.inf),
                                    hi_t)
                    t0 = np.maximum(t0, lo_t)
                    t1 = np.minimum(t1, hi_t)
                bit = (cube_bits_cache[0] >> ((da_ + ra) * tb + (db_ + rb))) & 1
                ok_ = active & (bit != 0) & (t0 <= t1) & (t1 > 0)
                best = np.where(ok_, np.minimum(best, np.maximum(t0, 0.0)),
                                best)
        # lateral overflow check: ray's lateral position at slab entry/exit
        # outside the tap window around (ca0, cb0)
        tin = np.maximum(t0s, 0.0)
        tout = t1s
        for tt in (tin, tout):
            paa = eye_a + rda * tt
            pbb = eye_b + rdb * tt
            over |= active & ((np.floor(paa) < ca0 - ra)
                              | (np.floor(paa) > ca0 + ra)
                              | (np.floor(pbb) < cb0 - rb)
                              | (np.floor(pbb) > cb0 + rb))
        return best, over

    cube_bits_cache = [None]

    def cube_test_at(o_slab, active):
        ca0, cb0, k = texel_floor(o_slab)
        cube_bits_cache[0] = cube_bits(o_slab, ca0, cb0)
        return cube_test(o_slab, active)

    # first candidate per row from the texel bit field
    sb = slabbits[texrow]                    # [n, sp]
    anyc = sb.any(1)
    o1 = np.argmax(sb, 1)
    live = live0 & anyc

    hit = np.zeros(n, bool)
    t_hit = np.zeros(n, np.float64)
    resolved = ~live
    o_cur = np.where(live, o1, 0)
    rounds_hist = []
    overflow_any = np.zeros(n, bool)
    it = 0
    while (~resolved).any() and it < sp:
        act = ~resolved
        best, over = cube_test_at(o_cur.astype(np.float64), act)
        got = act & np.isfinite(best)
        hit |= got
        t_hit = np.where(got, best, t_hit)
        overflow_any |= over
        resolved |= got
        # advance to next candidate slab > o_cur
        nxt_mask = act & ~got
        if nxt_mask.any():
            idx = np.where(nxt_mask)[0]
            sbn = sb[idx]
            pos = o_cur[idx]
            # next set bit strictly after pos
            arange = np.arange(sp)[None, :]
            m = sbn & (arange > pos[:, None])
            has2 = m.any(1)
            nxt = np.argmax(m, 1)
            o_cur[idx] = np.where(has2, nxt, 0)
            done = idx[~has2]
            resolved[done] = True
        rounds_hist.append(int((~resolved).sum()))
        it += 1

    # per-row rounds spent: count via history
    mism = (hit != rh).mean()
    so = (hit & ~rh).sum()
    eo = (~hit & rh).sum()
    both = hit & rh
    rms = (np.sqrt(np.mean(((t_hit - rt)[both] / vs) ** 2)) if both.any()
           else 0.0)
    mx = (np.max(np.abs((t_hit - rt)[both] / vs)) if both.any() else 0.0)
    # cube-depth stats: rounds needed
    surv = np.array([live.sum()] + rounds_hist)
    print(f"--- {label} taps=({ta},{tb}) S={S} IH={IW}x{IW} "
          f"live0 {live.mean()*100:.1f}%")
    print(f"  parity: mismatch {mism*100:.4f}% (sweep-only {so} "
          f"exact-only {eo})  RMS {rms:.5f} vox  max {mx:.5f} vox")
    print(f"  survivors after rounds: {surv[:8].tolist()} ... "
          f"depth-{D} unresolved {surv[min(D, len(surv)-1)]/n*100:.2f}%")
    print(f"  lateral-overflow rows: {overflow_any.sum()} "
          f"({overflow_any.mean()*100:.3f}%)")


for th, ph_, rf, lb in [(0.9, 0.8, 0.75, "bench"),
                        (0.3, 0.8, 0.75, "low-theta"),
                        (0.9, 0.2, 0.75, "graze-phi"),
                        (0.9, 0.8, 0.35, "zoom-in")]:
    run(th, ph_, rf, lb)
