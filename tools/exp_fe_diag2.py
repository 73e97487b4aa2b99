"""Deep-dive one detection-field leak on Calgary (float64 ground truth)."""
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
from ray_tracing_octrees_tpu.trace import fast_exact as fe
from ray_tracing_octrees_tpu.trace import sweep_exact as se
from ray_tracing_octrees_tpu.trace import slab_sweep as ss
from ray_tracing_octrees_tpu.trace.mesh_grid import _sweep_candidates

PW, PH = 240, 136
ASPECT = 1920 / 1080

grid = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
vol = (jnp.asarray(grid.occ) > 0).astype(jnp.float32)
pyr = build_pyramid(grid.occ)
extent = float(np.max(np.asarray(grid.world_max) - np.asarray(grid.world_min)))
tgt = np.asarray(building_center(grid))
vs = float(np.asarray(grid.voxel_size))
org = np.asarray(grid.origin, np.float64)

cam = Camera(theta=0.9, phi=0.8, radius=0.75 * extent)
cam.set_target(tgt)
ok, cfg = fe.fast_exact_setup(vol, grid.origin, grid.voxel_size,
                              cam.get_pos(), cam.get_view())
scal = cfg["scal_np"].copy()
scal[8], scal[9] = 45.0, ASPECT
occ_sw = cfg["occ_sw"]
S, A, B = cfg["S"], cfg["A"], cfg["B"]
IH, IW = cfg["IH"], cfg["IW"]
ta, tb = cfg["ta"], cfg["tb"]
flip = cfg["flip"]
axis_world = cfg["axis_world"]
sp = occ_sw.shape[0]
vsw = np.asarray(occ_sw, np.float32) > 0

# exact reference + sweep_exact result
from ray_tracing_octrees_tpu.core.octree import build_leaf_volume
lv = build_leaf_volume(pyr)
res = se.trace_pixels_sweep_exact(vol, lv, grid.origin, grid.voxel_size,
                                  cam.get_pos(), cam.get_view(), PW, PH,
                                  45.0, ASPECT)
o, d = generate_rays(PW, PH, jnp.asarray(cam.get_pos(), jnp.float32),
                     jnp.asarray(cam.get_view(), jnp.float32), 45.0, ASPECT)
ref = trace_octree(pyr, o, d, grid.origin, grid.voxel_size)
h1 = np.asarray(res["hit"])
h2 = np.asarray(ref["hit"])
eo = np.nonzero(~h1 & h2)[0]
print("sweep_exact exact-only:", len(eo))

# float64 scene-side truth for the first few
dn = np.asarray(d, np.float64)
on = np.asarray(o, np.float64)
sel = ss._AXIS_SELECTORS[axis_world]
eye = (np.asarray(cam.get_pos(), np.float64) - org) / vs
eye_s = float(eye @ sel[0])
eye_a = float(eye @ sel[1])
eye_b = float(eye @ sel[2])
a_min, a_max, b_min, b_max = (float(scal[4]), float(scal[5]),
                              float(scal[6]), float(scal[7]))
z0 = float(scal[3])

# detection bits (as the tracer builds them)
hats = se._widened_perspective_hats(jnp.asarray(scal), sp, S, A, B, IH, IW,
                                    flip, ta, tb)
bits_tex = np.asarray(_sweep_candidates(
    (occ_sw > 0).astype(jnp.bfloat16), hats, sp // 32, S, A, B,
    IH, IW, flip, exact_acc=(ta > 3 or tb > 3)))
wshift = np.arange(32, dtype=np.int64)

for i in eo[:5]:
    d_s = float(dn[i] @ sel[0]) / vs
    d_a = float(dn[i] @ sel[1]) / vs
    d_b = float(dn[i] @ sel[2]) / vs
    # ray in voxel sweep coords: p(t) = eye + t * (d/vs)
    rt = float(np.asarray(ref["t"])[i])
    # crossing cells at the oracle's hit: sample just inside
    p_hit = (np.array([eye_s, eye_a, eye_b])
             + np.array([d_s, d_a, d_b]) * (rt + 1e-6))
    k_hit = int(np.floor(p_hit[0]))
    o_hit = (S - 1 - k_hit) if flip else k_hit
    ua = eye_a + (z0 - eye_s) * d_a / d_s
    ub = eye_b + (z0 - eye_s) * d_b / d_s
    ti = int(np.clip(np.floor((ua - a_min) / (a_max - a_min) * IH), 0, IH - 1))
    tj = int(np.clip(np.floor((ub - b_min) / (b_max - b_min) * IW), 0, IW - 1))
    w = bits_tex[ti * IW + tj].astype(np.int64)
    slabs = ((w[:, None] >> wshift[None]) & 1).reshape(-1)[:sp]
    # slab-center texel position at the hit slab + footprint interval
    ua0 = a_min + (a_max - a_min) * (ti + 0.5) / IH
    ub0 = b_min + (b_max - b_min) * (tj + 0.5) / IW
    inv_s = (k_hit + 0.5 - eye_s) / (z0 - eye_s)
    pa0 = eye_a + (ua0 - eye_a) * inv_s
    pb0 = eye_b + (ub0 - eye_b) * inv_s
    # pixel ray's lateral interval within the hit slab
    tin = (k_hit - eye_s) / d_s
    tout = (k_hit + 1 - eye_s) / d_s
    pa_in, pa_out = eye_a + d_a * tin, eye_a + d_a * tout
    pb_in, pb_out = eye_b + d_b * tin, eye_b + d_b * tout
    half_a = 0.5 * abs((ua - eye_a) / (z0 - eye_s))
    ha = 0.5 * (a_max - a_min) / IH
    wa = ha * (abs(inv_s) + 0.5 / abs(z0 - eye_s))
    # hit voxel lateral coords
    va = int(np.floor(p_hit[1]))
    vb = int(np.floor(p_hit[2]))
    print(f"\npixel {i}: hit slab o={o_hit} (k={k_hit}) cell a={va} b={vb} "
          f"solid={bool(vsw[o_hit, va, vb]) if 0<=o_hit<sp else '??'}")
    print(f"  bit at o_hit: {slabs[o_hit] if 0 <= o_hit < sp else '??'}; "
          f"window bits o_hit-2..+2: {slabs[max(0,o_hit-2):o_hit+3]}")
    print(f"  texel ({ti},{tj}) pa0 {pa0:.4f} pb0 {pb0:.4f} "
          f"floor ({np.floor(pa0):.0f},{np.floor(pb0):.0f})")
    print(f"  pixel pa in-slab [{min(pa_in,pa_out):.4f},{max(pa_in,pa_out):.4f}] "
          f" pb [{min(pb_in,pb_out):.4f},{max(pb_in,pb_out):.4f}]")
    print(f"  footprint half_a {half_a:.4f} wa {wa:.4f} "
          f"cover_a [{pa0 - half_a - wa:.4f},{pa0 + half_a + wa:.4f}]")
    hb = 0.5 * (b_max - b_min) / IW
    wb = hb * (abs(inv_s) + 0.5 / abs(z0 - eye_s))
    half_b = 0.5 * abs((ub - eye_b) / (z0 - eye_s))
    print(f"  footprint half_b {half_b:.4f} wb {wb:.4f} "
          f"cover_b [{pb0 - half_b - wb:.4f},{pb0 + half_b + wb:.4f}]")

# direct hat inspection at a failing (slab, texel)
print("\n=== hat inspection, pixel 7806 case ===")
ma_w, mb_w, am, bm = (np.asarray(h) for h in hats)
# failing: o=39, texel (596, 268)
o_f, ti_f, tj_f = 39, 596, 268
print("ma_w[o,ti,:] nonzero:", {a: float(ma_w[o_f, ti_f, a])
                                for a in np.nonzero(ma_w[o_f, ti_f])[0]})
print("mb_w[o,tj,:] nonzero:", {b: float(mb_w[o_f, tj_f, b])
                                for b in np.nonzero(mb_w[o_f, tj_f])[0]})
print("am:", am[o_f, ti_f], " bm:", bm[o_f, tj_f])
occ_np2 = np.asarray(occ_sw) > 0
print("occ around (o=39, a=213..217, b=2..4):")
print(occ_np2[o_f, 213:218, 2:5].astype(int))

print("\n=== stage-by-stage det evaluation ===")
sl = (np.asarray(occ_sw) > 0).astype(np.float64)[o_f]     # [A, B]
ma_r = ma_w[o_f, ti_f].astype(np.float64)                 # [A]
mb_r = mb_w[o_f, tj_f].astype(np.float64)                 # [B]
det_np = float((sl * ma_r[:, None] * mb_r[None, :]).sum())
print("det (float64 from hats):", det_np, " fm:",
      float(am[o_f, ti_f] * bm[o_f, tj_f]),
      " and:", int(det_np) & int(am[o_f, ti_f] * bm[o_f, tj_f]))

# now the actual jnp einsum chain on this single chunk
import jax
ci = o_f // 32
sl_c = (occ_sw > 0).astype(jnp.bfloat16)[ci*32:(ci+1)*32]
ma_c = jnp.asarray(ma_w[ci*32:(ci+1)*32])
mb_c = jnp.asarray(mb_w[ci*32:(ci+1)*32])
hb_j = jnp.einsum("cab,cha->cbh", sl_c, ma_c.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
det_j = jnp.einsum("cbh,cwb->chw", hb_j, mb_c.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
print("det (jnp einsum):", float(det_j[o_f-ci*32, ti_f, tj_f]))
print("hb (jnp) at b=2..5:", np.asarray(hb_j[o_f-ci*32, 2:6, ti_f]))
hb_np = (sl * ma_r[:, None]).sum(axis=0)
print("hb (float64) at b=2..5:", hb_np[2:6])
