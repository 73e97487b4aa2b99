"""Focused exact-tracer probes (round 3): narrow-width step costs, flat vs
3D gather rate, seeded step statistics, shadow-ray cost split.

Usage: python tools/exp_exact_probe2.py
"""

import functools
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
from ray_tracing_octrees_tpu.render.camera import Camera, generate_rays
from ray_tracing_octrees_tpu.trace.octree_trace import trace_octree_fast
from ray_tracing_octrees_tpu.trace.slab_sweep import dilate_occupancy, sweep_seed

W, H = 960, 540
N = W * H
ASPECT = W / H

g = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
pyr = build_pyramid(g.occ)
lv = jax.block_until_ready(build_leaf_volume(pyr))
vol = (jnp.asarray(g.occ) > 0).astype(jnp.float32)
dil = jax.block_until_ready(dilate_occupancy(vol))
S = lv.shape[0]
lv_flat = jax.block_until_ready(lv.reshape(-1))

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
    print(f"{label:44s} {dt*1e3:9.3f} ms", flush=True)
    return dt


# --- 1. pure gather rate: K chained gathers at width w ---------------------
@functools.partial(jax.jit, static_argnames=("k", "w", "flat"))
def chained_gather(pos, view, k, w, flat):
    o, d = generate_rays(W, H, pos, view, 45.0, ASPECT)
    # voxel indices derived from ray points, then k DEPENDENT gathers
    p = (o[:w] - jnp.asarray(g.origin, jnp.float32)) / g.voxel_size + d[:w] * 100.0
    v = jnp.clip(jnp.floor(p).astype(jnp.int32), 0, S - 1)
    acc = jnp.zeros(w, jnp.int32)

    def body(i, carry):
        acc, vx, vy, vz = carry
        if flat:
            idx = (vz * S + vy) * S + vx
            val = lv_flat[idx].astype(jnp.int32)
        else:
            val = lv[vz, vy, vx].astype(jnp.int32)
        acc = acc + val
        # dependent next index (forces serialization like the DDA)
        vx = jnp.clip(vx + (val & 3) - 1, 0, S - 1)
        return acc, vx, vy, vz

    acc, _, _, _ = jax.lax.fori_loop(
        0, k, body, (acc, v[:, 0], v[:, 1], v[:, 2]))
    return acc


for w in (N, N // 8, N // 32, N // 128):
    t4 = bench(f"gather3d k=4 w={w}",
               lambda i, w=w: chained_gather(*pv(i), k=4, w=w, flat=False))
    t16 = bench(f"gather3d k=16 w={w}",
                lambda i, w=w: chained_gather(*pv(i), k=16, w=w, flat=False))
    print(f"  => per-gather {1e3*(t16-t4)/12:.3f} ms "
          f"({1e9*(t16-t4)/12/w:.2f} ns/row)", flush=True)

t4 = bench("gatherflat k=4 w=N",
           lambda i: chained_gather(*pv(i), k=4, w=N, flat=True))
t16 = bench("gatherflat k=16 w=N",
            lambda i: chained_gather(*pv(i), k=16, w=N, flat=True))
print(f"  => per-gather {1e3*(t16-t4)/12:.3f} ms "
      f"({1e9*(t16-t4)/12/N:.2f} ns/row)", flush=True)

# --- 2. full DDA step cost at narrow widths --------------------------------
@functools.partial(jax.jit, static_argnames=("k", "w"))
def ksteps(pos, view, k, w):
    o, d = generate_rays(W, H, pos, view, 45.0, ASPECT)
    return trace_octree_fast(lv, o[:w], d[:w], g.origin, g.voxel_size,
                             ball_skip=True, max_steps=k)["t"]


for w in (N // 8, N // 32, N // 128):
    t2 = bench(f"dda k=2 w={w}", lambda i, w=w: ksteps(*pv(i), k=2, w=w))
    t16 = bench(f"dda k=16 w={w}", lambda i, w=w: ksteps(*pv(i), k=16, w=w))
    print(f"  => per-step {1e3*(t16-t2)/14:.3f} ms "
          f"({1e9*(t16-t2)/14/w:.2f} ns/row)", flush=True)

# --- 3. seeded step statistics ---------------------------------------------
cam = pose(0)
o, d = generate_rays(W, H, *pv(0), 45.0, ASPECT)
live, ts_, ext = sweep_seed(dil, g.origin, g.voxel_size, cam.get_pos(),
                            cam.get_view(), 45.0, ASPECT, W, H)
out = trace_octree_fast(lv, o, d, g.origin, g.voxel_size, ball_skip=True,
                        t_start=ts_, live_mask=live)
steps = np.asarray(out["steps"])
hit = np.asarray(out["hit"])
print(f"seeded: live0 {float(np.asarray(live).mean()):.3f} "
      f"steps p50={np.percentile(steps,50):.0f} p90={np.percentile(steps,90):.0f} "
      f"p99={np.percentile(steps,99):.0f} max={steps.max()}", flush=True)
print("live frac after k steps:",
      {k: round(float((steps > k).mean()), 4) for k in (0, 1, 2, 4, 8, 16, 32)},
      flush=True)

# --- 4. shadow-ray step statistics (from hits toward light) ----------------
l = jnp.asarray([-0.5, -0.9, -0.4], jnp.float32)
l = l / jnp.linalg.norm(l)
so = out["point"] + out["normal"] * (g.voxel_size * 2.0)
sd = jnp.broadcast_to(-l[None, :], so.shape)
so = jnp.where(out["hit"][:, None], so, sd * jnp.float32(3e7))
sout = trace_octree_fast(lv, so, sd, g.origin, g.voxel_size, ball_skip=True)
ssteps = np.asarray(sout["steps"])
print(f"shadow: hit_frac {hit.mean():.3f} steps p50={np.percentile(ssteps,50):.0f} "
      f"p90={np.percentile(ssteps,90):.0f} p99={np.percentile(ssteps,99):.0f} "
      f"max={ssteps.max()} occluded={float(np.asarray(sout['hit'])[hit].mean()):.3f}",
      flush=True)
print("shadow live frac after k steps:",
      {k: round(float((ssteps > k).mean()), 4) for k in (0, 1, 2, 4, 8, 16, 32)},
      flush=True)
