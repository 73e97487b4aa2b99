"""Shadow-path probe for the exact tracer (round 3, after the slim ladder).

Measures, on Calgary at the bench pose (960x540):
  1. shadow-seed statistics (pruned fraction, start-t distribution),
  2. shadow alive counts per step WITH the seed (to size the shadow ladder),
  3. full render_octree_image frames across ladder/seed configurations.

Usage: python tools/exp_exact_probe4.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ray_tracing_octrees_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from ray_tracing_octrees_tpu.core.cache import load_voxel_grid
from ray_tracing_octrees_tpu.core.grid import building_center, recenter_filled_voxels
from ray_tracing_octrees_tpu.core.octree import build_leaf_volume, build_pyramid
from ray_tracing_octrees_tpu.models.octree_raytracer import render_octree_image
from ray_tracing_octrees_tpu.render.camera import Camera, generate_rays
from ray_tracing_octrees_tpu.trace.octree_trace import trace_octree_fast
from ray_tracing_octrees_tpu.trace.slab_sweep import (
    build_shadow_seed,
    dilate_occupancy,
    query_shadow_seed,
    sweep_seed,
)

W, H = 960, 540
N = W * H
ASPECT = W / H
TO_LIGHT = (0.5, 0.9, 0.4)
LIGHT_DIR = tuple(-c for c in TO_LIGHT)

g = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
pyr = build_pyramid(g.occ)
lv = jax.block_until_ready(build_leaf_volume(pyr))
vol = (jnp.asarray(g.occ) > 0).astype(jnp.float32)
dil = jax.block_until_ready(dilate_occupancy(vol))
t0 = time.perf_counter()
sseed = build_shadow_seed(dil, TO_LIGHT)
print(f"shadow seed built {time.perf_counter()-t0:.2f}s "
      f"bits2d {sseed.bits2d.shape}", flush=True)

extent = float(np.max(np.asarray(g.world_max) - np.asarray(g.world_min)))
center = np.asarray(building_center(g))


def pose(i):
    cam = Camera(theta=0.9 + 1e-4 * i, phi=0.8, radius=0.75 * extent)
    cam.set_target(center)
    return cam


def pv(i):
    cam = pose(i)
    return (jnp.asarray(cam.get_pos(), jnp.float32),
            jnp.asarray(cam.get_view(), jnp.float32))


def bench(label, fn, iters=6):
    out = fn(0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(1 + i) for i in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:52s} {dt*1e3:9.3f} ms  ({2*N/dt/1e6:7.2f} Mrays/s x2)",
          flush=True)
    return dt


# --- 1+2: shadow seed stats and seeded shadow step curve --------------------
cam = pose(0)
o, d = generate_rays(W, H, *pv(0), 45.0, ASPECT)
live, ts_, ext = sweep_seed(dil, g.origin, g.voxel_size, cam.get_pos(),
                            cam.get_view(), 45.0, ASPECT, W, H)
out = trace_octree_fast(lv, o, d, g.origin, g.voxel_size, ball_skip=True,
                        t_start=ts_, live_mask=live, const_origin=True)
hit = np.asarray(out["hit"])
l = jnp.asarray(LIGHT_DIR, jnp.float32)
l = l / jnp.linalg.norm(l)
so = out["point"] + out["normal"] * (g.voxel_size * 2.0)
sd = jnp.broadcast_to(-l[None, :], so.shape)
so = jnp.where(out["hit"][:, None], so, sd * jnp.float32(3e7))
ss_live, s_ts = query_shadow_seed(sseed, so, jnp.asarray(g.origin, jnp.float32),
                                  jnp.asarray(g.voxel_size, jnp.float32))
s_live = np.asarray(ss_live) & hit
print(f"hit {hit.mean():.4f}; shadow live after seed "
      f"{s_live.mean():.4f} (of hits: {s_live[hit].mean():.4f}); "
      f"seed t>0 frac {float((np.asarray(s_ts) > 0).mean()):.4f} "
      f"mean-t {float(np.asarray(s_ts)[s_live].mean()):.1f}", flush=True)

sout = trace_octree_fast(lv, so, sd, g.origin, g.voxel_size, ball_skip=True,
                         live_mask=jnp.asarray(s_live), t_start=s_ts,
                         const_dir=True)
ssteps = np.asarray(sout["steps"])
print("seeded shadow alive after k steps:",
      {k: int((ssteps > k).sum()) for k in (0, 1, 2, 4, 6, 8, 12, 16, 24, 32)},
      f"max={ssteps.max()}", flush=True)
occl = np.asarray(sout["hit"]) & hit
print(f"occluded frac of hits: {occl[hit].mean():.4f}", flush=True)

# sanity: occlusion must match the unseeded shadow trace exactly on hits
sout0 = trace_octree_fast(lv, so, sd, g.origin, g.voxel_size, ball_skip=True,
                          live_mask=jnp.asarray(hit))
occl0 = np.asarray(sout0["hit"]) & hit
mism = (occl != occl0).sum()
print(f"seeded-vs-unseeded shadow occl mismatches: {mism}", flush=True)

# --- 3: full-frame configurations -------------------------------------------
CONFIGS = {
    "r2 ladder, no shadow extras": dict(
        ladder=((0, N // 2), (4, N // 8), (8, N // 32)),
        shadow_ladder=None, safety_cap=0, use_sseed=False),
    "tuned ladder + safety": dict(
        ladder=((0, N // 2), (3, N // 4), (8, N // 16)),
        shadow_ladder=None, safety_cap=N // 16, use_sseed=False),
    "tuned + shadow ladder + safety": dict(
        ladder=((0, N // 2), (3, N // 4), (8, N // 16)),
        shadow_ladder=((0, N // 2), (4, N // 4), (12, N // 8)),
        safety_cap=N // 16, use_sseed=False),
    "tuned + shadow ladder + sseed": dict(
        ladder=((0, N // 2), (3, N // 4), (8, N // 16)),
        shadow_ladder=((0, N // 2), (4, N // 4), (12, N // 8)),
        safety_cap=N // 16, use_sseed=True),
    "tuned + tight shadow ladder + sseed": dict(
        ladder=((0, N // 2), (3, N // 4), (8, N // 16)),
        shadow_ladder=((0, N // 4), (4, N // 8), (12, N // 16)),
        safety_cap=N // 16, use_sseed=True),
}

for name, cfg in CONFIGS.items():
    @jax.jit
    def _frame(pos, view, live, ts, _cfg=cfg):
        return render_octree_image(
            pyr, g.origin, g.voxel_size, pos, view,
            W, H, jnp.float32(45.0), jnp.float32(ASPECT), shadows=True,
            leaf_vol=lv, ball_skip=True, ladder=_cfg["ladder"],
            light_dir=LIGHT_DIR, seed_live=live, seed_t=ts,
            shadow_ladder=_cfg["shadow_ladder"],
            safety_cap=_cfg["safety_cap"],
            shadow_seed=sseed if _cfg["use_sseed"] else None,
        )

    def full(i, _f=_frame):
        cam = pose(i)
        live, ts2, _ = sweep_seed(dil, g.origin, g.voxel_size, cam.get_pos(),
                                  cam.get_view(), 45.0, ASPECT, W, H)
        return _f(*pv(i), live, ts2)

    bench(f"frame {name}", full)
