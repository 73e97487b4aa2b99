"""Composition of the fast-sweep-vs-exact parity gap (VERDICT r4 task 2).

For the bench pose (+ a pose ensemble) at the bench's parity resolution,
split the hit mismatch into sweep-only (false hit) vs exact-only (false
miss), measure cell agreement on agreed hits, and prototype the
closed-form refinements:
  R1: exact entry-t into the detected cell (pure per-pixel math, no gather)
  R2: cell-solidity + ray/AABB re-test classification (what a compacted
      re-test pass needs to fix, and how large the suspicious set is)
Run on CPU (exact math identical; rates don't matter here).
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

PW, PH = 240, 136
ASPECT = 1920 / 1080

grid = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
vol = (jnp.asarray(grid.occ) > 0).astype(jnp.float32)
occ_np = np.asarray(grid.occ) > 0            # (Z, Y, X)
pyr = build_pyramid(grid.occ)
extent = float(np.max(np.asarray(grid.world_max) - np.asarray(grid.world_min)))
tgt = np.asarray(building_center(grid))
vs = float(np.asarray(grid.voxel_size))
org = np.asarray(grid.origin, np.float64)


def pose_stats(theta, phi, radius_f, label):
    cam = Camera(theta=theta, phi=phi, radius=radius_f * extent)
    cam.set_target(tgt)
    hit_f, t_f, _, _ = ss.sweep_first_hit(
        vol, grid.origin, grid.voxel_size, cam.get_pos(), cam.get_view(),
        45.0, ASPECT, PW, PH)
    o, d = generate_rays(PW, PH, jnp.asarray(cam.get_pos(), jnp.float32),
                         jnp.asarray(cam.get_view(), jnp.float32), 45.0,
                         ASPECT)
    ref = trace_octree(pyr, o, d, grid.origin, grid.voxel_size)
    hf = np.asarray(hit_f)
    tf = np.asarray(t_f)
    rh = np.asarray(ref["hit"])
    rt = np.asarray(ref["t"])
    rp = np.asarray(ref["point"])
    dn = np.asarray(d)

    n = hf.size
    sweep_only = hf & ~rh
    exact_only = ~hf & rh
    both = hf & rh
    mism = (hf != rh).mean()

    # --- reconstruct the sweep's detected cell per pixel (closed forms) ---
    axis_world, flip, (S, A, B), eyes, window, crop_lo = ss._sweep_geometry(
        vol, grid.origin, grid.voxel_size, cam.get_pos(), cam.get_view())
    eye_s, eye_a, eye_b, z0 = eyes
    sel = ss._AXIS_SELECTORS[axis_world]
    d_s = dn @ sel[0]
    d_a = dn @ sel[1]
    d_b = dn @ sel[2]
    # world t of a sweep-coordinate step: p_sweep(t) = eye + t/vs * d
    # t_f is world t at slab center: k + 0.5 = eye_s + t_f/vs*d_s
    with np.errstate(divide="ignore", invalid="ignore"):
        k_center = eye_s + tf / vs * d_s
    k = np.round(k_center - 0.5)
    pa = eye_a + tf / vs * d_a
    pb = eye_b + tf / vs * d_b
    ca = np.floor(pa)
    cb = np.floor(pb)

    # exact tracer's hit voxel (sweep coords)
    p_in = rp + 0.25 * vs * dn
    v_xyz = np.floor((p_in - org[None, :]) / vs)
    v_s = v_xyz @ sel[0]
    v_a = v_xyz @ sel[1]
    v_b = v_xyz @ sel[2]

    same_cell = both & (k == v_s) & (ca == v_a) & (cb == v_b)
    same_slab = both & (k == v_s)

    # R1: closed-form entry-t into the detected cell
    def entry_t(kk, aa, bb):
        t0 = np.full(n, -np.inf)
        t1 = np.full(n, np.inf)
        for ro_c, rd_c, lo in ((eye_s, d_s, kk), (eye_a, d_a, aa),
                               (eye_b, d_b, bb)):
            rd_v = rd_c / vs
            with np.errstate(divide="ignore", invalid="ignore"):
                ta_ = (lo - ro_c) / rd_v
                tb_ = (lo + 1.0 - ro_c) / rd_v
            lo_t = np.minimum(ta_, tb_)
            hi_t = np.maximum(ta_, tb_)
            deg = np.abs(rd_v) < 1e-12
            inside = (ro_c >= lo) & (ro_c < lo + 1.0)
            lo_t = np.where(deg, np.where(inside, -np.inf, np.inf), lo_t)
            hi_t = np.where(deg, np.where(inside, np.inf, -np.inf), hi_t)
            t0 = np.maximum(t0, lo_t)
            t1 = np.minimum(t1, hi_t)
        return t0, t1

    te, tx = entry_t(k, ca, cb)
    t_ref = np.maximum(te, 0.0)
    valid_int = (te <= tx) & (tx > 0)

    # is the detected cell actually solid? (sweep coords -> zyx)
    def solid_at(ss_, aa, bb):
        # sweep->world xyz permutation (per _AXIS_SELECTORS layout)
        perm = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}[axis_world]
        sab = (ss_, aa, bb)
        x = sab[perm.index(0)].astype(np.int64)
        y = sab[perm.index(1)].astype(np.int64)
        z = sab[perm.index(2)].astype(np.int64)
        Zd, Yd, Xd = occ_np.shape
        inb = (x >= 0) & (x < Xd) & (y >= 0) & (y < Yd) & (z >= 0) & (z < Zd)
        out = np.zeros(n, bool)
        out[inb] = occ_np[z[inb], y[inb], x[inb]]
        return out

    det_solid = solid_at(k, ca, cb)

    rms_before = np.sqrt(np.mean(((tf - rt)[both] / vs) ** 2)) if both.any() else 0
    # refined t where the detected cell is solid AND intersected; else keep
    use = hf & det_solid & valid_int
    tf2 = np.where(use, t_ref, tf)
    rms_after = np.sqrt(np.mean(((tf2 - rt)[both] / vs) ** 2)) if both.any() else 0
    rms_samecell = (np.sqrt(np.mean(((tf2 - rt)[same_cell] / vs) ** 2))
                    if same_cell.any() else 0)

    # suspicious-set candidates: sweep hits whose detected cell fails the
    # exact test (not solid, or no positive interval)
    bad_hit = hf & ~(det_solid & valid_int)

    print(f"--- {label}  (theta={theta} phi={phi} rf={radius_f}) "
          f"axis={axis_world} flip={flip} S={S} A={A} B={B}")
    print(f"  hits: sweep {hf.mean():.4f} exact {rh.mean():.4f} | "
          f"mismatch {mism*100:.3f}%  sweep-only {sweep_only.sum()} "
          f"({sweep_only.mean()*100:.3f}%)  exact-only {exact_only.sum()} "
          f"({exact_only.mean()*100:.3f}%)")
    if both.any():
        print(f"  agreed hits {both.sum()}: same-cell {same_cell.sum()/both.sum()*100:.2f}%"
              f"  same-slab {same_slab.sum()/both.sum()*100:.2f}%")
        print(f"  depth RMS vox: before {rms_before:.3f}  after-R1 {rms_after:.3f}"
              f"  (same-cell subset after-R1 {rms_samecell:.5f})")
    print(f"  detected-cell not solid/no-interval among sweep hits: "
          f"{bad_hit.sum()} ({bad_hit.sum()/max(hf.sum(),1)*100:.2f}% of hits)")
    # where do exact-only misses sit relative to the sweep's table?
    return dict(mism=mism, sweep_only=int(sweep_only.sum()),
                exact_only=int(exact_only.sum()), n=n)


poses = [
    (0.9, 0.8, 0.75, "bench"),
    (0.3, 0.8, 0.75, "low-theta"),
    (1.4, 0.8, 0.75, "high-theta"),
    (0.9, 0.2, 0.75, "graze-phi"),
    (0.9, 1.4, 0.75, "top-down"),
    (0.9, 0.8, 0.35, "zoom-in"),
    (0.9, 0.8, 1.6, "zoom-out"),
    (2.2, 0.5, 0.9, "far-orbit"),
]
tot = dict(mism=0.0, sweep_only=0, exact_only=0, n=0)
worst = 0.0
for th, ph, rf, lb in poses:
    s = pose_stats(th, ph, rf, lb)
    worst = max(worst, s["mism"])
    for k_ in ("sweep_only", "exact_only", "n"):
        tot[k_] += s[k_]
print(f"\nensemble: worst mismatch {worst*100:.3f}%  "
      f"sweep-only {tot['sweep_only']}  exact-only {tot['exact_only']} "
      f"of {tot['n']}")
