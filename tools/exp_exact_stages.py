"""Stage attribution of the sweep-exact PRIMARY trace at 1080p (chip).

Times, as separate jitted programs (pipelined over perturbed scalars):
  1. widened hats + detection bit-field sweep (resolution-independent)
  2. ray gen + texel mapping (per-pixel closed forms)
  3. the full-width [N, C] bits row gather + dead0
  4. full _primary_core (stage1=True)
  5. full render_exact_frame (primary + shadow)

Usage: python tools/exp_exact_stages.py [WxH] [iters]
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

import functools

from ray_tracing_octrees_tpu.core.cache import load_voxel_grid
from ray_tracing_octrees_tpu.core.grid import (
    building_center,
    recenter_filled_voxels,
)
from ray_tracing_octrees_tpu.core.octree import build_leaf_volume, build_pyramid
from ray_tracing_octrees_tpu.render.camera import Camera, generate_rays
from ray_tracing_octrees_tpu.trace import sweep_exact as se
from ray_tracing_octrees_tpu.trace.mesh_grid import _sweep_candidates

TO_LIGHT = (0.5, 0.9, 0.4)
LIGHT_DIR = tuple(-c for c in TO_LIGHT)


def main():
    res = sys.argv[1] if len(sys.argv) > 1 else "1920x1088"
    W, H = (int(x) for x in res.split("x"))
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    aspect = W / H

    g = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
    pyr = build_pyramid(g.occ)
    lv = jax.block_until_ready(build_leaf_volume(pyr))
    vol = (jnp.asarray(g.occ) > 0).astype(jnp.float32)
    org = np.asarray(g.origin)
    vs = float(np.asarray(g.voxel_size))
    sfld = se.build_shadow_field(vol, LIGHT_DIR, vs)

    extent = float(np.max(np.asarray(g.world_max) - np.asarray(g.world_min)))
    center = np.asarray(building_center(g))
    cam = Camera(theta=0.9, phi=0.8, radius=0.75 * extent)
    cam.set_target(center)

    ok, cfg = se.sweep_exact_setup(vol, org, vs, cam.get_pos(), cam.get_view())
    assert ok
    IH, IW, ta, tb = cfg["IH"], cfg["IW"], cfg["ta"], cfg["tb"]
    S, A, B = cfg["S"], cfg["A"], cfg["B"]
    axis_world, flip = cfg["axis_world"], cfg["flip"]
    occ_sw, nb9 = cfg["occ_sw"], cfg["nb9"]
    sp = occ_sw.shape[0]
    scal_np = cfg["scal_np"].copy()
    scal_np[8], scal_np[9] = 45.0, aspect
    scal0 = jnp.asarray(scal_np)
    print(f"cfg: IH={IH} IW={IW} taps=({ta},{tb}) S={S} A={A} B={B} sp={sp}",
          flush=True)

    N = W * H
    C = -(-sp // 32)

    @functools.partial(jax.jit, static_argnames=())
    def stage_bits(scal):
        hats = se._widened_perspective_hats(scal, sp, S, A, B, IH, IW,
                                            flip, ta, tb)
        return _sweep_candidates(
            (occ_sw > 0).astype(jnp.bfloat16), hats, sp // 32, S, A, B,
            IH, IW, flip, exact_acc=(ta > 3 or tb > 3))

    @jax.jit
    def stage_raygen(scal):
        f32 = jnp.float32
        origins, dirs = generate_rays(W, H, scal[15:18],
                                      scal[18:34].reshape(4, 4),
                                      scal[8], scal[9])
        sel = se._AXIS_SELECTORS[axis_world]
        rd_sab = jnp.stack([dirs @ jnp.asarray(s, f32) for s in sel],
                           axis=1) / scal[10]
        eye_s, eye_a, eye_b, z0 = scal[0], scal[1], scal[2], scal[3]
        a_min, a_max, b_min, b_max = scal[4], scal[5], scal[6], scal[7]
        rd_s = rd_sab[:, 0]
        safe = jnp.where(jnp.abs(rd_s) < 1e-12, 1.0, rd_s)
        ua = eye_a + (z0 - eye_s) * rd_sab[:, 1] / safe
        ub = eye_b + (z0 - eye_s) * rd_sab[:, 2] / safe
        ti = jnp.clip(jnp.floor((ua - a_min) / (a_max - a_min) * IH
                                ).astype(jnp.int32), 0, IH - 1)
        tj = jnp.clip(jnp.floor((ub - b_min) / (b_max - b_min) * IW
                                ).astype(jnp.int32), 0, IW - 1)
        return rd_sab, ti * IW + tj

    bits0 = jax.block_until_ready(stage_bits(scal0))

    @jax.jit
    def stage_gather(bits, texrow):
        brow = bits[texrow]
        return brow, (brow != 0).any(axis=1)

    from ray_tracing_octrees_tpu.trace.warp_kernel import plan_warp
    wcfg = plan_warp(scal_np, se._AXIS_SELECTORS, axis_world, IH, IW, W, H) \
        if jax.default_backend() == "tpu" and IW % 128 == 0 else None
    print(f"dead-warp cfg: {wcfg}", flush=True)

    widths, caps = se._primary_ladder(N, sp)

    @functools.partial(jax.jit, static_argnames=("wc", "lad"))
    def stage_primary(scal, wc=None, lad=None):
        res, _, _ = se._primary_core(
            occ_sw, nb9, scal, axis_world, flip, S, A, B, IH, IW,
            W, H, ta, tb, stage1=True, warp_cfg=wc, ladder=lad)
        return res["t"], res["hit"]

    def frame(scal_npx):
        return se.render_exact_frame(
            vol, lv, org, vs, cam.get_pos(), cam.get_view(),
            W, H, 45.0, aspect, light_dir=LIGHT_DIR, shadows=True,
            shadow_field=sfld)

    def bench(label, fn):
        out = fn(0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [fn(1 + i) for i in range(iters)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:34s} {dt*1e3:9.2f} ms", flush=True)
        return dt

    def pscal(i):
        return scal0.at[1].add(jnp.float32(1e-5) * i)

    bench("detect sweep (hats+bits)", lambda i: stage_bits(pscal(i)))
    rd0, tex0 = jax.block_until_ready(stage_raygen(scal0))
    bench("raygen+texmap", lambda i: stage_raygen(pscal(i)))
    texs = [jax.block_until_ready(jnp.minimum(tex0 + i, IH * IW - 1))
            for i in range(iters + 1)]
    bench("bits row gather [N,C]+any", lambda i: stage_gather(bits0, texs[i]))
    norounds = (widths, tuple(0 for _ in caps))
    bench("primary SKELETON (0 rounds)",
          lambda i: stage_primary(pscal(i), wc=wcfg, lad=norounds))
    one_each = (widths, tuple(min(i, 3) for i in range(len(caps))))
    bench("primary rounds<=1,2,3",
          lambda i: stage_primary(pscal(i), wc=wcfg, lad=one_each))
    bench("FULL primary (dead-warp)",
          lambda i: stage_primary(pscal(i), wc=wcfg))
    bench("FULL primary (fallback)", lambda i: stage_primary(pscal(i)))

    def frs(i):
        cam.phi += 1e-5
        out = se.render_exact_frame(
            vol, lv, org, vs, cam.get_pos(), cam.get_view(),
            W, H, 45.0, aspect, light_dir=LIGHT_DIR, shadows=False)
        return out[0]
    bench("FULL frame NO shadow", frs)

    def fr(i):
        cam.phi += 1e-5
        return frame(None)[0]
    bench("FULL frame prim+shadow", fr)


if __name__ == "__main__":
    main()
