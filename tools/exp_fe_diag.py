"""Diagnose fast_exact residual mismatches on Calgary (CPU)."""
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
from ray_tracing_octrees_tpu.trace import fast_exact as fe
from ray_tracing_octrees_tpu.trace import sweep_exact as se
from ray_tracing_octrees_tpu.trace import slab_sweep as ss

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
assert ok
scal = cfg["scal_np"].copy()
scal[8], scal[9] = 45.0, ASPECT
occ_sw = cfg["occ_sw"]
S, A, B = cfg["S"], cfg["A"], cfg["B"]
IH, IW = cfg["IH"], cfg["IW"]
ta, tb = cfg["ta"], cfg["tb"]
flip = cfg["flip"]
axis_world = cfg["axis_world"]
sp = occ_sw.shape[0]
print(f"taps ({ta},{tb}) S={S} A={A} B={B} IH={IH} IW={IW} flip={flip} "
      f"axis={axis_world} sp={sp}")

scal_j = jnp.asarray(scal)
planes, words = fe._cube_sweep(occ_sw, occ_sw[:1], scal_j, sp // 32,
                               S, A, B, IH, IW, flip, ta, tb, False)
planes = np.asarray(planes)
words_np = np.asarray(words)

pv0, pv1, pv2 = fe._warp_planes(
    jnp.asarray(planes), jnp.full((PH, PW), 0, jnp.int32), IH, IW, PW, PH,
    None)  # placeholder; recompute lin below properly

# recompute lin exactly as the jit does
rd3 = tuple(c / scal_j[10] for c in se._pixel_rays_sab(scal_j, axis_world,
                                                       PW, PH))
rd_s = rd3[0]
forward = (rd_s < 0) if flip else (rd_s > 0)
safe = jnp.where(jnp.abs(rd_s) < se._DEG, 1.0, rd_s)
eye_s, eye_a, eye_b, z0 = scal_j[0], scal_j[1], scal_j[2], scal_j[3]
a_min, a_max, b_min, b_max = scal_j[4], scal_j[5], scal_j[6], scal_j[7]
ua = eye_a + (z0 - eye_s) * rd3[1] / safe
ub = eye_b + (z0 - eye_s) * rd3[2] / safe
in_win = (ua >= a_min) & (ua <= a_max) & (ub >= b_min) & (ub <= b_max)
ti = jnp.clip(jnp.floor((ua - a_min) / (a_max - a_min) * IH).astype(jnp.int32),
              0, IH - 1)
tj = jnp.clip(jnp.floor((ub - b_min) / (b_max - b_min) * IW).astype(jnp.int32),
              0, IW - 1)
lin = jnp.where(forward & in_win, (ti << 10) | tj, -1)
pv0, pv1, pv2 = fe._warp_planes(jnp.asarray(planes), lin.reshape(PH, PW),
                                IH, IW, PW, PH, None)

res = fe._pixel_cube_resolve(pv0, pv1, pv2, scal_j, axis_world, flip,
                             S, A, B, IH, IW, PW, PH, ta, tb)
st1, map1, rounds, overflow = fe._run_fallback(
    res, words, cfg["nb9"], scal_j, axis_world, flip, S, A, B, IH, IW,
    PW, PH, ta, tb)
print("suspicious:", int(res["suspicious"].sum()), " overflow:",
      int(overflow), " rounds:", int(rounds))

# full-width merged hit/t
N = PW * PH
hit = np.asarray(res["hit"]).copy()
t = np.asarray(res["t"]).copy()
pix = np.asarray(map1["pix"])
rv = np.asarray(map1["row_valid"])
h1f = np.asarray(st1["hit"])
t1f = np.asarray(st1["t"])
res1 = np.asarray(st1["resolved"])
hit[pix[rv]] = h1f[rv]
t[pix[rv]] = np.where(h1f[rv], t1f[rv], 0.0)

o, d = generate_rays(PW, PH, jnp.asarray(cam.get_pos(), jnp.float32),
                     jnp.asarray(cam.get_view(), jnp.float32), 45.0, ASPECT)
ref = trace_octree(pyr, o, d, grid.origin, grid.voxel_size)
rh = np.asarray(ref["hit"])
rt = np.asarray(ref["t"])
rp = np.asarray(ref["point"])
dn = np.asarray(d)

eo = np.nonzero(~hit & rh)[0]
so = np.nonzero(hit & ~rh)[0]
print(f"exact-only {len(eo)}  sweep-only {len(so)}")

# classify exact-only pixels
sel = ss._AXIS_SELECTORS[axis_world]
p_in = rp + 0.25 * vs * dn
v_xyz = np.floor((p_in - org[None, :]) / vs)
v_s = v_xyz @ sel[0]
v_a = v_xyz @ sel[1]
v_b = v_xyz @ sel[2]
o_ex = (S - 1 - v_s) if flip else v_s

texrow = np.asarray(res["texrow"])
susp = np.asarray(res["suspicious"])
found = np.asarray(res["found"])
o1 = np.asarray(res["o1"])
wshift = np.arange(32, dtype=np.int64)

cls = {"not_found": 0, "cand_missing_at_exact_slab": 0,
       "cube_should_have": 0, "fallback_lost": 0, "other": 0}
examples = []
for i in eo[:200]:
    w = words_np[texrow[i]].astype(np.int64)
    slabs = ((w[:, None] >> wshift[None]) & 1).reshape(-1)[:sp]
    oe = int(o_ex[i])
    if not found[i]:
        cls["not_found"] += 1
        if len(examples) < 3:
            examples.append((i, "not_found", oe, slabs[max(0,oe-2):oe+3]))
    elif oe < len(slabs) and not slabs[oe]:
        cls["cand_missing_at_exact_slab"] += 1
        if len(examples) < 6:
            examples.append((i, "cand_missing", oe, o1[i],
                             slabs[max(0, oe - 2):oe + 3]))
    elif o1[i] <= oe <= o1[i] + 2:
        cls["cube_should_have"] += 1
        if len(examples) < 9:
            examples.append((i, "cube_should", oe, o1[i]))
    elif susp[i]:
        cls["fallback_lost"] += 1
        if len(examples) < 12:
            examples.append((i, "fallback_lost", oe, o1[i]))
    else:
        cls["other"] += 1
        if len(examples) < 15:
            examples.append((i, "other", oe, o1[i], susp[i], hit[i]))
print(cls)
for e in examples:
    print(e)
