"""Diagnostics for the mesh tracer on Calgary: resolution curve, kcells,
alphabet size, and sweep-vs-MT cost split."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ray_tracing_octrees_tpu.core.cache import load_voxel_grid
from ray_tracing_octrees_tpu.core.grid import recenter_filled_voxels, building_center
from ray_tracing_octrees_tpu.render.camera import Camera
from ray_tracing_octrees_tpu.trace import mesh_grid as mg

g = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
to_light = (0.5, 0.9, 0.4)
scene = mg.prepare_mc_scene(g.occ, g.origin, g.voxel_size, to_light=to_light)
case_np = np.asarray(scene.case_vol).astype(np.int32)
distinct = np.unique(case_np[case_np > 0])
print(f"case grid {case_np.shape}: surface cells {(case_np>0).sum()} "
      f"distinct cases {len(distinct)}", flush=True)

extent = float(np.max(np.asarray(g.world_max) - np.asarray(g.world_min)))
center = np.asarray(building_center(g))
cam = Camera(theta=0.9, phi=0.8, radius=0.75 * extent)
cam.set_target(center)

setup = mg._scene_sweep_setup(scene, cam.get_pos(), cam.get_view(), 45.0,
                              1920 / 1088, 1024, 1024)
axis_world, flip, (S, A, B), case_sw, shadow_sw, scal_np, kcells = setup
print(f"axis={axis_world} flip={flip} SAB=({S},{A},{B}) sweep shape "
      f"{case_sw.shape} kcells={kcells}", flush=True)

res = mg.trace_mc_mesh_texels(
    scene, cam.get_pos(), cam.get_view(), fov_deg=45.0, aspect=1920 / 1088,
    inter_h=1024, inter_w=1024, max_rounds=12, tol_texels=0,
)
hist = np.asarray(res["hist"])
print("unresolved after each round:", hist.tolist(), flush=True)
print("hit frac", float(np.asarray(res["hit"]).mean()))

# cost split: time the sweep alone vs one slab MT pass alone via the
# public entry with max_rounds=1 (sweep + 4 slot passes) — and a
# sweep-only jit.
scal = jnp.asarray(scal_np)
sp = case_sw.shape[0]
hats_fn = jax.jit(lambda sc: mg._build_mesh_hats(sc, sp, S, A, B, 1024, 1024,
                                                 bool(flip)))
hats = jax.block_until_ready(hats_fn(scal))

prev = jnp.full((1024, 1024), -1.0)
sweep_fn = jax.jit(lambda p: mg._sweep_slots(
    case_sw, shadow_sw, hats, p, sp // 32, S, A, B, 1024, 1024, bool(flip)))
out = jax.block_until_ready(sweep_fn(prev))
N = 20
t0 = time.perf_counter()
outs = [sweep_fn(prev + i * 0.0001) for i in range(N)]
jax.block_until_ready(outs)
dt_sweep = (time.perf_counter() - t0) / N
print(f"sweep_slots: {dt_sweep*1e3:.1f} ms", flush=True)

t0 = time.perf_counter()
h2 = [hats_fn(scal + 1e-6 * i) for i in range(N)]
jax.block_until_ready(h2)
print(f"build_hats: {(time.perf_counter()-t0)/N*1e3:.1f} ms", flush=True)

r1 = jax.jit(lambda: mg._trace_texels(
    case_sw, shadow_sw, scal, sp // 32, S, A, B,
    1024, 1024, bool(flip), axis_world, 1, 0, shadow_sw is not None,
    kcells=kcells))
out = jax.block_until_ready(r1())
t0 = time.perf_counter()
outs = [r1() for _ in range(8)]
jax.block_until_ready([o["t"] for o in outs])
dt1 = (time.perf_counter() - t0) / 8
print(f"one full round (sweep + {mg._SLOTS} slab passes): {dt1*1e3:.1f} ms "
      f"-> slab_pass ~{(dt1 - dt_sweep)/mg._SLOTS*1e3:.1f} ms each", flush=True)
