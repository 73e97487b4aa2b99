"""Debug hit-mask disagreement between raymarch_sweep and the raymarch oracle."""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax.numpy as jnp

from ray_tracing_octrees_tpu.core.grid import make_sphere_grid
from ray_tracing_octrees_tpu.models.volume_raycaster import VolumeRaycastRenderer
from ray_tracing_octrees_tpu.render.camera import Camera, perspective
from ray_tracing_octrees_tpu.trace.raymarch import raymarch_volume
from ray_tracing_octrees_tpu.trace.raymarch_sweep import (
    prepare_volume_scene, render_volume_frame)

W = H = 96
grid = make_sphere_grid(32)
r = VolumeRaycastRenderer().init(grid)
scene = prepare_volume_scene(r.textures, float(grid.voxel_size))
cam = Camera(theta=0.5, phi=0.8, radius=2.2)
out = render_volume_frame(
    scene, grid.origin, cam.get_pos(), cam.get_view(), 45.0, W / H, W, H)
view = jnp.asarray(cam.get_view(), jnp.float32)
proj = jnp.asarray(perspective(45.0, W / H, 0.1, 1000.0), jnp.float32)
ref = raymarch_volume(
    r.textures, jnp.asarray(cam.get_pos(), jnp.float32),
    jnp.linalg.inv(view), jnp.linalg.inv(proj), W, H, max_steps=400)

hs = np.asarray(out["alpha"]) >= 0.1
hr = np.asarray(ref["alpha"]) >= 0.1
print("sweep hits:", hs.sum(), " oracle hits:", hr.sum(),
      " both:", (hs & hr).sum(), " sweep-only:", (hs & ~hr).sum(),
      " oracle-only:", (~hs & hr).sum(), " agree:", (hs == hr).mean())

def ascii_mask(m, title):
    print(title)
    for y in range(0, H, 3):
        print("".join(".#"[int(v)] for v in m[y, ::2]))

ascii_mask(hr, "--- oracle hits ---")
ascii_mask(hs, "--- sweep hits ---")
d = np.where(hs & ~hr, "S", np.where(~hs & hr, "O", "."))
print("--- disagreement (S=sweep-only, O=oracle-only) ---")
for y in range(0, H, 3):
    print("".join(d[y, ::2]))

# depth stats where both hit
both = hs & hr & (np.asarray(ref["depth"]) > 0)
if both.any():
    dd = np.asarray(out["depth"])[both] - np.asarray(ref["depth"])[both]
    print("depth diff mean %.4f  p90(|.|) %.4f  voxel %.4f" % (
        dd.mean(), np.quantile(np.abs(dd), 0.9), float(grid.voxel_size)))
