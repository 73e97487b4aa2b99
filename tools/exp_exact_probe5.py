"""Step curves + frame timings with log-scale skip radii (round 3).

Usage: python tools/exp_exact_probe5.py [stats|frames]
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
from ray_tracing_octrees_tpu.trace.slab_sweep import dilate_occupancy, sweep_seed

W, H = 960, 540
N = W * H
ASPECT = W / H
TO_LIGHT = (0.5, 0.9, 0.4)
LIGHT_DIR = tuple(-c for c in TO_LIGHT)

g = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
pyr = build_pyramid(g.occ)
t0 = time.perf_counter()
lv = jax.block_until_ready(build_leaf_volume(pyr))
print(f"leaf_vol built {time.perf_counter()-t0:.2f}s; radius-code hist "
      f"{np.bincount(np.asarray(lv >> 5).ravel(), minlength=8).tolist()}",
      flush=True)
vol = (jnp.asarray(g.occ) > 0).astype(jnp.float32)
dil = jax.block_until_ready(dilate_occupancy(vol))

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


def curves():
    cam = pose(0)
    o, d = generate_rays(W, H, *pv(0), 45.0, ASPECT)
    live, ts_, ext = sweep_seed(dil, g.origin, g.voxel_size, cam.get_pos(),
                                cam.get_view(), 45.0, ASPECT, W, H)
    out = trace_octree_fast(lv, o, d, g.origin, g.voxel_size, ball_skip=True,
                            t_start=ts_, live_mask=live, const_origin=True)
    steps = np.asarray(out["steps"])
    hit = np.asarray(out["hit"])
    ks = (0, 1, 2, 3, 4, 6, 8, 10, 12, 16, 20, 24, 32, 48)
    print("primary alive after k steps:",
          {k: int((steps > k).sum()) for k in ks},
          f"max={steps.max()} hit={hit.mean():.4f}", flush=True)

    l = jnp.asarray(LIGHT_DIR, jnp.float32)
    l = l / jnp.linalg.norm(l)
    so = out["point"] + out["normal"] * (g.voxel_size * 2.0)
    sd = jnp.broadcast_to(-l[None, :], so.shape)
    so = jnp.where(out["hit"][:, None], so, sd * jnp.float32(3e7))
    sout = trace_octree_fast(lv, so, sd, g.origin, g.voxel_size,
                             ball_skip=True, live_mask=jnp.asarray(hit),
                             const_dir=True)
    ssteps = np.asarray(sout["steps"])
    print("shadow alive after k steps:",
          {k: int((ssteps > k).sum()) for k in ks},
          f"max={ssteps.max()}", flush=True)


def bench(label, fn, iters=6):
    out = fn(0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(1 + i) for i in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:56s} {dt*1e3:9.3f} ms  ({2*N/dt/1e6:7.2f} Mrays/s x2)",
          flush=True)
    return dt


def frames(configs):
    for name, cfg in configs.items():
        @jax.jit
        def _frame(pos, view, live, ts, _cfg=cfg):
            return render_octree_image(
                pyr, g.origin, g.voxel_size, pos, view,
                W, H, jnp.float32(45.0), jnp.float32(ASPECT), shadows=True,
                leaf_vol=lv, ball_skip=True, ladder=_cfg["ladder"],
                light_dir=LIGHT_DIR, seed_live=live, seed_t=ts,
                shadow_ladder=_cfg["shadow_ladder"],
                safety_cap=_cfg["safety_cap"],
            )

        def full(i, _f=_frame):
            cam = pose(i)
            live, ts2, _ = sweep_seed(dil, g.origin, g.voxel_size,
                                      cam.get_pos(), cam.get_view(), 45.0,
                                      ASPECT, W, H)
            return _f(*pv(i), live, ts2)

        bench(f"frame {name}", full)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "stats"
    if mode == "stats":
        curves()
    else:
        # filled in after the stats run
        import json
        configs = json.loads(sys.argv[2])
        configs = {k: dict(ladder=tuple(map(tuple, v["ladder"])),
                           shadow_ladder=tuple(map(tuple, v["shadow_ladder"]))
                           if v.get("shadow_ladder") else None,
                           safety_cap=v.get("safety_cap", 0))
                   for k, v in configs.items()}
        frames(configs)
