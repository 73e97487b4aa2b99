"""Time the grid-wavefront MC-mesh tracer on Calgary at 1080p (real TPU)."""
import os
import time
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ray_tracing_octrees_tpu.core.cache import load_voxel_grid
from ray_tracing_octrees_tpu.core.grid import recenter_filled_voxels, building_center
from ray_tracing_octrees_tpu.render.camera import Camera
from ray_tracing_octrees_tpu.trace.mesh_grid import (
    prepare_mc_scene, render_mc_mesh_frame, trace_mc_mesh_texels,
)

g = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
to_light = (0.5, 0.9, 0.4)
scene = prepare_mc_scene(g.occ, g.origin, g.voxel_size, to_light=to_light)
print("scene ready", scene.case_vol.shape, flush=True)

extent = float(np.max(np.asarray(g.world_max) - np.asarray(g.world_min)))
W, H = 1920, 1088
center = np.asarray(building_center(g))

ih = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
mr = int(sys.argv[2]) if len(sys.argv) > 2 else 8

def frame(i):
    cam = Camera(theta=0.9 + 0.013 * i, phi=0.8 - 0.007 * i, radius=0.75 * extent)
    cam.set_target(center)
    return render_mc_mesh_frame(
        scene, cam.get_pos(), cam.get_view(), 45.0, W / H, W, H,
        light_dir=tuple(-c for c in to_light),
        inter_h=ih, inter_w=ih, max_rounds=mr, tol_texels=512,
        with_stats=True,
    )

t0 = time.perf_counter()
img, stats = frame(0)
img = np.asarray(img)
print(f"compile+run {time.perf_counter()-t0:.1f}s rounds={int(stats['rounds'])} "
      f"unresolved={int(stats['unresolved'])} hitfrac={(img[...,:3].max(-1)>0).mean():.3f}",
      flush=True)

N = 20
t0 = time.perf_counter()
outs = [frame(1 + i) for i in range(N)]
jax.block_until_ready([o[0] for o in outs])
dt = (time.perf_counter() - t0) / N
print(f"inter={ih} rounds<= {mr}: {dt*1e3:.2f} ms/frame  "
      f"{W*H*2/dt/1e6:.1f} Mrays/s (primary+shadow)  "
      f"{W*H/dt/1e6:.1f} Mrays/s primary", flush=True)
for o in outs[:3]:
    print("  rounds", int(o[1]["rounds"]), "unresolved", int(o[1]["unresolved"]))

from ray_tracing_octrees_tpu.render.image import write_png
write_png("/tmp/mesh_trace_calgary.png", np.asarray(outs[0][0]))
print("saved /tmp/mesh_trace_calgary.png")
