"""Component timing for one full-width mesh-tracer consume round.

Times, at the Calgary bench pose and m = IH*IW rows, the isolated parts
of mesh_grid.slab_pass: the candidate-bit find-first-set, the 3 packed
case gathers, the 9 one-hot MXU case fetches, and the 9 MT selector
matmul chains — so the round-1 ~62 ms can be attributed and attacked.

Also prints the INITIAL unresolved count (texels with any candidate)
so the ladder's entry width can be chosen to skip the full-width round.
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
from ray_tracing_octrees_tpu.render.camera import Camera
from ray_tracing_octrees_tpu.trace import mesh_grid as mgrid
from ray_tracing_octrees_tpu.trace.slab_sweep import first_set_from

IH = 1024
W, H = 1920, 1088
ITERS = 8


def bench(label, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:42s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    g = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
    scene = mgrid.prepare_mc_scene(g.occ, g.origin, g.voxel_size,
                                   to_light=(0.5, 0.9, 0.4))
    extent = float(np.max(np.asarray(g.world_max) - np.asarray(g.world_min)))
    center = np.asarray(building_center(g))
    cam = Camera(theta=0.9, phi=0.8, radius=0.75 * extent)
    cam.set_target(center)

    (axis_world, flip, (S, A, B), case_sw, shadow_sw, scal_np,
     kcells) = mgrid._scene_sweep_setup(
        scene, cam.get_pos(), cam.get_view(), 45.0, W / H, IH, IH)
    scal = jnp.asarray(scal_np)
    n_chunks = case_sw.shape[0] // 32
    N = IH * IH
    f32 = jnp.float32

    hats = jax.jit(mgrid._build_detect_hats, static_argnums=(1, 2, 3, 4, 5, 6, 7))(
        scal, case_sw.shape[0], S, A, B, IH, IH, bool(flip))
    detect_sw = mgrid._detect_volume(case_sw)

    @jax.jit
    def sweep():
        return mgrid._sweep_candidates(detect_sw, hats, n_chunks, S, A, B,
                                       IH, IH, bool(flip))

    bits = jax.block_until_ready(sweep())
    n_init = int((np.asarray(bits) != 0).any(axis=1).sum())
    print(f"initial texels with candidates: {n_init} / {N} "
          f"({100.0*n_init/N:.1f}%)", flush=True)

    # per-texel geometry at full width
    eye_s, eye_a, eye_b, z0 = (float(scal_np[i]) for i in range(4))
    a_min, a_max, b_min, b_max = (float(scal_np[i]) for i in range(4, 8))
    ua = a_min + (a_max - a_min) * (np.arange(IH) + 0.5) / IH
    ub = b_min + (b_max - b_min) * (np.arange(IH) + 0.5) / IH
    uag, ubg = np.meshgrid(ua, ub, indexing="ij")
    uaf = jnp.asarray(uag.reshape(-1), f32)
    ubf = jnp.asarray(ubg.reshape(-1), f32)
    slope_a = np.abs((uag.reshape(-1) - eye_a) / (z0 - eye_s))
    slope_b = np.abs((ubg.reshape(-1) - eye_b) / (z0 - eye_s))
    print(f"slope max a={slope_a.max():.3f} b={slope_b.max():.3f}; "
          f"frac>1: {( (slope_a>1)|(slope_b>1) ).mean():.4f}", flush=True)

    pk = jax.block_until_ready(jax.jit(mgrid._build_packed_cases)(case_sw))
    npk = pk.shape[0]
    ptr0 = jnp.zeros(N, jnp.int32)

    @jax.jit
    def ffs(bits, ptr):
        has, o_i = first_set_from(bits, ptr)
        return has, o_i

    has, o_i = jax.block_until_ready(ffs(bits, ptr0))
    bench("find-first-set (full width)", lambda: ffs(bits, ptr0))

    o_f = o_i.astype(f32)
    k = (f32(S) - 1.0 - o_f) if flip else o_f

    @jax.jit
    def cell_coords(o_f, uaf, ubf):
        kk = (f32(S) - 1.0 - o_f) if flip else o_f
        s_scale = (z0 - eye_s) / (kk + 0.5 - eye_s)
        pa = (uaf - eye_a) / s_scale + eye_a
        pb = (ubf - eye_b) / s_scale + eye_b
        ca = jnp.floor(pa)
        cb = jnp.floor(pb)
        fi = ((o_f * A + ca) * B + cb).astype(jnp.int32)
        return pa, pb, ca, cb, fi

    pa, pb, ca, cb, fi = jax.block_until_ready(cell_coords(o_f, uaf, ubf))

    @jax.jit
    def gathers3(fi, cb):
        out = []
        for off in (-1, 0, 1):
            v = jnp.take(pk, jnp.clip(fi + off, 0, npk - 1))
            ok = (cb + off >= 0) & (cb + off <= B - 1)
            out.append(jnp.where(ok, v, 0.0))
        return out

    bench("3x packed-case element gathers", lambda: gathers3(fi, cb))

    @jax.jit
    def gathers1(fi):
        return jnp.take(pk, jnp.clip(fi, 0, npk - 1))

    bench("1x packed-case element gather", lambda: gathers1(fi))

    # kcells=4 form: ONE u32 gather of the byte-packed 2x2 window + unpack
    pk4 = jax.block_until_ready(jax.jit(mgrid._build_packed_cases4)(case_sw))

    @jax.jit
    def gather4(pa, pb):
        fa0 = jnp.clip(jnp.floor(pa - 0.25), 0.0, f32(A - 2))
        fb0 = jnp.clip(jnp.floor(pb - 0.25), 0.0, f32(B - 2))
        fi4 = ((o_f * A + fa0) * B + fb0).astype(jnp.int32)
        p4 = jnp.take(pk4, jnp.clip(fi4, 0, npk - 1))
        return [((p4 >> (8 * j)) & jnp.uint32(0xFF)).astype(jnp.int32)
                for j in range(4)]

    bench("1x u32 2x2-window gather + unpack", lambda: gather4(pa, pb))

    # row-gather variant: [npk_rows, 4] f32 rows packing the b-triple
    pk3 = jnp.stack([jnp.zeros_like(pk), pk, jnp.zeros_like(pk),
                     jnp.zeros_like(pk)], axis=1)

    @jax.jit
    def rowgather(fi):
        return pk3[jnp.clip(fi, 0, npk - 1)]

    bench("1x packed-case ROW gather [npk,4]", lambda: rowgather(fi))

    # one-hot case fetch + MT, per slot
    mtc = jnp.asarray(mgrid._mt_const_np(axis_world))
    case_iota = jnp.arange(256, dtype=jnp.int32)
    cse = jnp.asarray(np.random.default_rng(0).integers(0, 255, N), jnp.int32)
    selR, selG, selR2, selG2, _, _ = (jnp.asarray(x)
                                      for x in mgrid._mt_selectors_np())
    hi = jax.lax.Precision.HIGHEST

    @jax.jit
    def onehot_fetch(cse):
        oh = (cse[:, None] == case_iota[None, :]).astype(jnp.bfloat16)
        return jnp.einsum("nc,cl->nl", oh, mtc, preferred_element_type=f32)

    fk = jax.block_until_ready(onehot_fetch(cse))
    bench("one-hot fetch x1 (full width)", lambda: onehot_fetch(cse))

    rd_s = jnp.broadcast_to(jnp.float32(z0 - eye_s), (N,))
    rd_a = uaf - eye_a
    rd_b = ubf - eye_b
    ro_s = jnp.broadcast_to(jnp.float32(eye_s), (N,)) - k
    ro_a = eye_a - ca
    ro_b = eye_b - cb

    @jax.jit
    def mt_chain(fk, ro_a, ro_b):
        w_s = ro_a * rd_b - ro_b * rd_a
        w_a = ro_b * rd_s - ro_s * rd_b
        w_b = ro_s * rd_a - ro_a * rd_s
        qa = jnp.stack([rd_s, rd_a, rd_b, w_s, w_a, w_b], 1)
        mt = jax.lax.dot(fk[:, :90] * jax.lax.dot(qa, selR, precision=hi),
                         selG, precision=hi)
        qb = jnp.stack([ro_s, ro_a, ro_b, jnp.ones_like(ro_s)], 1)
        td = jax.lax.dot(fk[:, 90:110] * jax.lax.dot(qb, selR2, precision=hi),
                         selG2, precision=hi)
        return mt, td

    jax.block_until_ready(mt_chain(fk, ro_a, ro_b))
    bench("MT selector-matmul chain x1", lambda: mt_chain(fk, ro_a, ro_b))

    @jax.jit
    def fused_slot(cse, ro_a, ro_b):
        fk = onehot_fetch(cse)
        return mt_chain(fk, ro_a, ro_b)

    jax.block_until_ready(fused_slot(cse, ro_a, ro_b))
    d1 = bench("fused slot (fetch+MT) x1", lambda: fused_slot(cse, ro_a, ro_b))
    print(f"  => x9 slots estimate {9*d1*1e3:.1f} ms", flush=True)

    # nonzero-footprint statistics: of the 9 footprint cells at the first
    # candidate slab, how many are surface?
    u3 = []
    pk_np = np.asarray(pk)
    fi_np = np.asarray(fi)
    cb_np = np.asarray(cb)
    has_np = np.asarray(has)
    cnt = np.zeros(N, np.int32)
    for off in (-1, 0, 1):
        v = pk_np[np.clip(fi_np + off, 0, npk - 1)]
        v = np.where((cb_np + off >= 0) & (cb_np + off <= B - 1), v, 0.0)
        ap1, r = np.divmod(v, 65536.0)
        c_a, c_am1 = np.divmod(r, 256.0)
        for c in (c_am1, c_a, ap1):
            cnt += (c != 0).astype(np.int32)
    cnt = cnt[has_np]
    print("nonzero footprint cells @first slab (of 9): "
          + " ".join(f"{k}:{(cnt==k).mean():.3f}" for k in range(10)),
          flush=True)


if __name__ == "__main__":
    main()
