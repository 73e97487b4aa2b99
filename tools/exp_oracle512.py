"""512^2 banded per-ray oracle on Calgary (chip) + sweep parity (r4 task 6)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), "xla_cache"))
import numpy as np, jax, jax.numpy as jnp
from ray_tracing_octrees_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
from ray_tracing_octrees_tpu.core.cache import load_voxel_grid
from ray_tracing_octrees_tpu.core.grid import building_center, recenter_filled_voxels
from ray_tracing_octrees_tpu.models.volume_raycaster import VolumeRaycastRenderer
from ray_tracing_octrees_tpu.render.camera import Camera, perspective
from ray_tracing_octrees_tpu.trace.raymarch import raymarch_volume_banded
from ray_tracing_octrees_tpu.trace.raymarch_sweep import (
    prepare_volume_scene, render_volume_frame)

W = H = 512
g = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
r = VolumeRaycastRenderer().init(g)
scene = prepare_volume_scene(r.textures, float(np.asarray(g.voxel_size)))
extent = float(np.max(np.asarray(g.world_max) - np.asarray(g.world_min)))
tgt = np.asarray(building_center(g))

for th, ph, rf, lb in ((0.9, 0.8, 0.75, "exterior"), (0.9, 0.55, 0.28, "close-up")):
    cam = Camera(theta=th, phi=ph, radius=rf * extent)
    cam.set_target(tgt)
    # float64 matrix inversion (tests/test_raymarch_sweep.py: an f32
    # inverse of the far/near=50000 projection corrupts the rays)
    inv_view = np.linalg.inv(np.asarray(cam.get_view(), np.float64))
    inv_proj = np.linalg.inv(np.asarray(cam.get_proj(1.0), np.float64))
    t0 = time.time()
    ref = raymarch_volume_banded(
        r.textures, jnp.asarray(cam.get_pos(), jnp.float32),
        jnp.asarray(inv_view, jnp.float32),
        jnp.asarray(inv_proj, jnp.float32), W, H, band_rows=32,
        max_steps=800)
    jax.block_until_ready(ref["alpha"])
    t_or = time.time() - t0
    out = render_volume_frame(
        scene, g.origin, cam.get_pos(), cam.get_view(), 45.0, 1.0, W, H)
    jax.block_until_ready(out["alpha"])
    hs = np.asarray(out["alpha"]) >= 0.1
    hr = np.asarray(ref["alpha"]) >= 0.1
    agree = (hs == hr).mean()
    both = hs & hr
    dd = np.abs(np.asarray(out["depth"]) - np.asarray(ref["depth"]))[
        both & (np.asarray(ref["depth"]) > 0)]
    print(f"{lb}: oracle {t_or:.1f}s; hit-agree {agree*100:.2f}%  "
          f"(sweep {hs.mean():.4f} oracle {hr.mean():.4f})  "
          f"depth p50 {np.percentile(dd,50):.3f} p90 {np.percentile(dd,90):.3f}",
          flush=True)
