"""Pallas slab-pass kernel for the grid-wavefront mesh tracer.

The XLA form of :func:`mesh_grid._trace_texels`'s ``slab_pass`` (fetch
the 3x3 footprint cells' MC cases, fetch their triangles, exact
Moller-Trumbore, keep the nearest hit) costs ~160 ms per million rows on
v5e: the 3 packed-case fetches run at the scalar gather rate (~9 ns/elem)
and the geometric MT materializes [m, k*5, 3, 3] HBM intermediates that
tile at ~40x their bytes. This kernel runs the whole pass per row tile in
VMEM/registers:

1. CASE FETCH rides the MXU exactly like the one-hot warp kernel
   (trace/warp_kernel.py): the case volume is laid out [A+2, sp*(B+2)]
   with zero guard rows/columns, a per-row 3-tap one-hot with weights
   {1, 256, 65536} (powers of two, bf16-exact) contracts the active
   128-lane column groups against the full A window, and three row
   selects at a-1/a/a+1 yield all 9 footprint cases as exact
   24-bit-packed f32.

2. MOLLER-TRUMBORE runs on precomputed per-case DOT CONSTANTS instead of
   triangle geometry: with the ray translated to cell-local coordinates
   (ro' = ro - cell, q = [rd, w = ro' x rd, ro', 1]) every MT quantity is
   a dot product with a per-(case, triangle) constant vector::

       det     = rd . (e2 x e1)
       u * det = e2 . w      - rd . (e2 x v0)
       v * det = -e1 . w     - rd . (v0 x e1)
       t * det = n . ro'     - n . v0          (n = e1 x e2)

   (standard triple-product identities; verified against the geometric
   form by tests). The constants are multiples of 1/8 bounded by ~3, all
   EXACT in bf16 (asserted at table build), so the one-hot fetch of the
   constants is exact and the dots run in f32 on the VPU — the same
   precision class as the XLA reference path, with zero HBM
   intermediates.

3. The winner (nearest tt over cells x triangles) and its unnormalized
   normal n (one extra one-hot fetch by winning case, lane-selected by
   winning triangle) leave as flat [rows] outputs.

Footprint cells: kcells == 4 tests the exact 2x2 corner set (complete
for |slope| <= 1, mesh_grid._footprint_slots); otherwise 6 slots cover
the corners plus the middle cells of whichever axis spans 3 — only rays
with BOTH lateral slopes > 1 (diagonal-diagonal silhouettes) can lose
cells vs the XLA path's full 3x3, bounded by the oracle tests.

Reference anchor: this is the triangle-exact realization of the
per-pixel traversal the reference runs in
453-skeleton/RayTracerBVH.cpp:239-327.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# F_a lane layout: 6 j-blocks (j = rd_s, rd_a, rd_b, w_s, w_a, w_b) of 16
# lanes each: [det x5, ud x5, vd x5, pad]. F_b lane layout: 4 j-blocks
# (j = ro'_s, ro'_a, ro'_b, one) of 8 lanes each: [td x5, pad]; lanes
# 32..46: n[tri*3 + comp]; rest pad.
_FA_LANES = 128
_FB_LANES = 128
_N_BASE = 32


@functools.lru_cache(maxsize=4)
def _mt_tables_np(axis_world: int) -> Tuple[np.ndarray, np.ndarray]:
    """(f_a f32[256, 128], f_b f32[256, 128]) MT dot-constant tables.

    Cell-local triangle vertices come from the same case table as the
    XLA path (mesh_grid._case_tables_np), permuted xyz -> (s, a, b) for
    ``axis_world`` exactly as mesh_grid permutes tri_sab. Every entry is
    asserted exact in bf16 (midpoint coordinates are multiples of 1/2,
    their crosses multiples of 1/4, triple products multiples of 1/8).
    """
    from ray_tracing_octrees_tpu.trace.mesh_grid import _case_tables_np

    verts, _ = _case_tables_np()                    # [256, 5, 3, 3] xyz
    perm = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}[axis_world]
    v = verts[..., perm].astype(np.float64)         # (s, a, b) coords
    v0, v1, v2 = v[:, :, 0], v[:, :, 1], v[:, :, 2]
    e1 = v1 - v0
    e2 = v2 - v0
    n = np.cross(e1, e2)
    k_det = np.cross(e2, e1)                        # rd-part of det
    k_u_rd = -np.cross(e2, v0)
    k_u_w = e2
    k_v_rd = -np.cross(v0, e1)
    k_v_w = -e1
    k_t_ro = n
    k_t_1 = -(n * v0).sum(-1)

    f_a = np.zeros((256, _FA_LANES), np.float64)
    for j in range(3):                              # rd blocks
        base = j * 16
        f_a[:, base + 0:base + 5] = k_det[..., j]
        f_a[:, base + 5:base + 10] = k_u_rd[..., j]
        f_a[:, base + 10:base + 15] = k_v_rd[..., j]
    for j in range(3):                              # w blocks
        base = (3 + j) * 16
        f_a[:, base + 5:base + 10] = k_u_w[..., j]
        f_a[:, base + 10:base + 15] = k_v_w[..., j]

    f_b = np.zeros((256, _FB_LANES), np.float64)
    for j in range(3):                              # ro' blocks
        f_b[:, j * 8:j * 8 + 5] = k_t_ro[..., j]
    f_b[:, 24:29] = k_t_1
    for t in range(5):
        f_b[:, _N_BASE + t * 3:_N_BASE + t * 3 + 3] = n[:, t]

    for name, arr in (("f_a", f_a), ("f_b", f_b)):
        rt = arr.astype(jnp.bfloat16).astype(np.float64)
        if not np.array_equal(rt, arr):
            raise AssertionError(f"MT constant table {name} not bf16-exact")
    return f_a.astype(np.float32), f_b.astype(np.float32)


def mt_tables(axis_world: int) -> Tuple[jax.Array, jax.Array]:
    f_a, f_b = _mt_tables_np(axis_world)
    return (jnp.asarray(f_a, jnp.bfloat16), jnp.asarray(f_b, jnp.bfloat16))


def build_case_table(case_sw: jax.Array, th: int) -> jax.Array:
    """Sweep-layout case volume -> [th, sp*(B+2)] bf16 fetch table.

    Rows: 1 + a (zero guard rows at 0 and A+1, padded to ``th``).
    Columns: o * (B + 2) + 1 + b (zero guard columns between slabs), the
    total padded to a 128 multiple. Traceable (built in-jit per frame
    from the cached sweep layout).
    """
    sp, a_size, b_size = case_sw.shape
    ct = jnp.transpose(case_sw, (1, 0, 2))          # [A, sp, B]
    ct = jnp.pad(ct, ((1, th - a_size - 1), (0, 0), (1, 1)))
    ct = ct.reshape(th, sp * (b_size + 2))
    pad = (-ct.shape[1]) % 128
    if pad:
        ct = jnp.pad(ct, ((0, 0), (0, pad)))
    return ct.astype(jnp.bfloat16)


# scal_k layout (SMEM f32): 0 eye_s, 1 eye_a, 2 eye_b, 3 z0, 4 eps
_SK_N = 5


def _slab_kernel(ty: int, th: int, cw: int, b2: int, a_size: int,
                 b_size: int, s_valid: int, flip: bool, kcells: int,
                 scal_ref, o_ref, act_ref, ua_ref, ub_ref, ct_ref,
                 fa_ref, fb_ref,
                 hit_ref, t_ref, case_ref, tri_ref, ca_ref, cb_ref,
                 ns_ref, na_ref, nb_ref, a_scr):
    f32 = jnp.float32
    i32 = jnp.int32
    bf16 = jnp.bfloat16
    tx = 128
    P = ty * tx
    eye_s, eye_a, eye_b = scal_ref[0], scal_ref[1], scal_ref[2]
    z0, eps = scal_ref[3], scal_ref[4]

    o = o_ref[:, :]
    act = act_ref[:, :] != 0
    uaf = ua_ref[:, :]
    ubf = ub_ref[:, :]

    o_c = jnp.clip(o, 0.0, f32(s_valid - 1))
    k = (f32(s_valid) - 1.0 - o_c) if flip else o_c
    s_scale = (z0 - eye_s) / (k + 0.5 - eye_s)
    pa = (uaf - eye_a) / s_scale + eye_a
    pb = (ubf - eye_b) / s_scale + eye_b
    ca = jnp.floor(pa)
    cb = jnp.floor(pb)
    half_a = 0.5 * jnp.abs((uaf - eye_a) / (z0 - eye_s))
    half_b = 0.5 * jnp.abs((ubf - eye_b) / (z0 - eye_s))

    # ---- case fetch: packed 3-tap one-hot over active column groups ----
    cb_c = jnp.clip(cb, -1.0, f32(b_size))
    iv0 = o_c.astype(i32) * b2 + 1 + cb_c.astype(i32)
    iv_act = jnp.where(act, iv0, i32(cw + 130))
    park = jnp.clip(jnp.min(iv_act), 1, cw - 2)
    iv = jnp.where(act, iv0, park)
    iu = jnp.clip(ca.astype(i32) + 1, 0, th - 1)

    gmin = (jnp.min(iv) - 1) >> 7
    gmax = (jnp.max(iv) + 1) >> 7
    civ = jax.lax.broadcasted_iota(i32, (ty, tx, 128), 2)
    for g in range(cw // 128):
        def body(first, g=g):
            lane = civ + g * 128
            vg = ((lane == (iv - 1)[:, :, None]).astype(bf16)
                  + (lane == iv[:, :, None]).astype(bf16) * bf16(256.0)
                  + (lane == (iv + 1)[:, :, None]).astype(bf16)
                  * bf16(65536.0)).reshape(P, 128)
            d = jax.lax.dot_general(
                vg, ct_ref[:, g * 128:(g + 1) * 128],
                (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )
            if first:
                a_scr[:, :] = d
            else:
                a_scr[:, :] += d

        @pl.when(g == gmin)
        def _():
            body(True)

        @pl.when((g > gmin) & (g <= gmax))
        def _():
            body(False)

    a3 = a_scr[:, :].reshape(ty, tx, th)
    riota = jax.lax.broadcasted_iota(i32, (ty, tx, th), 2)

    def row_sel(da):
        r = jnp.clip(iu + da, 0, th - 1)
        return ((riota == r[:, :, None]).astype(f32) * a3).sum(axis=2)

    pk3 = [row_sel(da) for da in (-1, 0, 1)]        # packed b-triples

    def unpack3(p):
        c_ap1 = jnp.floor(p * (1.0 / 65536.0))
        r = p - c_ap1 * 65536.0
        c_a = jnp.floor(r * (1.0 / 256.0))
        return r - c_a * 256.0, c_a, c_ap1          # cases at b-1, b, b+1

    # cases[da][db], each [ty, tx]
    cases = [[None] * 3 for _ in range(3)]
    for da in range(3):
        bm1, b0, bp1 = unpack3(pk3[da])
        cases[da][0], cases[da][1], cases[da][2] = bm1, b0, bp1

    # ---- footprint slots ----
    lo_a = jnp.clip(jnp.floor(pa - half_a) - ca, -1.0, 0.0)
    hi_a = jnp.clip(jnp.floor(pa + half_a) - ca, 0.0, 1.0)
    lo_b = jnp.clip(jnp.floor(pb - half_b) - cb, -1.0, 0.0)
    hi_b = jnp.clip(jnp.floor(pb + half_b) - cb, 0.0, 1.0)
    slots = [(lo_a, lo_b), (lo_a, hi_b), (hi_a, lo_b), (hi_a, hi_b)]
    if kcells > 4:
        span_a3 = (hi_a - lo_a) >= 2.0
        slots.append((jnp.where(span_a3, 0.0, lo_a),
                      jnp.where(span_a3, lo_b, 0.0)))
        slots.append((jnp.where(span_a3, 0.0, hi_a),
                      jnp.where(span_a3, hi_b, 0.0)))

    def slot_case(da_f, db_f):
        c = jnp.zeros(da_f.shape, f32)
        for da in range(3):
            for db in range(3):
                m = (da_f == f32(da - 1)) & (db_f == f32(db - 1))
                c = jnp.where(m, cases[da][db], c)
        return c

    # ---- MT via dot constants ----
    # All elementwise work stays [ty, tx, L] (sublane-split reshapes of
    # matmul results keep the minor dim intact — Mosaic rejects [ty, tx]
    # -> [P, 1] shape casts).
    rd_s = jnp.broadcast_to(z0 - eye_s, pa.shape)
    rd_a = uaf - eye_a
    rd_b = ubf - eye_b
    liota_a = jax.lax.broadcasted_iota(i32, (ty, tx, _FA_LANES), 2)
    lane_j = liota_a >> 4
    liota_b = jax.lax.broadcasted_iota(i32, (ty, tx, _FB_LANES), 2)
    lane_jb = liota_b >> 3

    big = f32(3.0e38)
    best_tt = jnp.full(pa.shape, big)
    best_case = jnp.zeros(pa.shape, f32)
    best_tri = jnp.zeros(pa.shape, f32)
    best_ca = jnp.zeros(pa.shape, f32)
    best_cb = jnp.zeros(pa.shape, f32)

    c256 = jax.lax.broadcasted_iota(i32, (ty, tx, 256), 2)

    for da_f, db_f in slots:
        cse = slot_case(da_f, db_f)
        cell_a = ca + da_f
        cell_b = cb + db_f
        ro_s = eye_s - k
        ro_a = eye_a - cell_a
        ro_b = eye_b - cell_b
        w_s = ro_a * rd_b - ro_b * rd_a
        w_a = ro_b * rd_s - ro_s * rd_b
        w_b = ro_s * rd_a - ro_a * rd_s

        oh = (c256 == cse.astype(i32)[:, :, None]).astype(bf16)
        fka = jax.lax.dot_general(
            oh.reshape(P, 256), fa_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=f32).reshape(ty, tx, _FA_LANES)
        fkb = jax.lax.dot_general(
            oh.reshape(P, 256), fb_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=f32).reshape(ty, tx, _FB_LANES)

        qa = [rd_s, rd_a, rd_b, w_s, w_a, w_b]
        qlane_a = jnp.zeros((ty, tx, _FA_LANES), f32)
        for j in range(6):
            qlane_a = jnp.where(lane_j == j, qa[j][:, :, None], qlane_a)
        acc_a = qlane_a * fka
        qb = [ro_s, ro_a, ro_b, jnp.ones(pa.shape, f32)]
        qlane_b = jnp.zeros((ty, tx, _FB_LANES), f32)
        for j in range(4):
            qlane_b = jnp.where(lane_jb == j, qb[j][:, :, None], qlane_b)
        acc_b = qlane_b * fkb

        # j-sum via log-step lane folds (cross-lane REDUCTIONS are the
        # measured kernel cost — ~7 permute steps each; three rolls fold
        # all 8 16-lane blocks so lane t < 16 holds the exact j-sum):
        # det_t at lane t, ud_t at 5 + t, vd_t at 10 + t; two more rolls
        # align ud/vd onto det's lanes. td folds acc_b's 4 8-lane blocks.
        x = acc_a
        for sh in (16, 32, 64):
            x = x + pltpu.roll(x, _FA_LANES - sh, 2)
        y = acc_b
        for sh in (8, 16):
            y = y + pltpu.roll(y, _FB_LANES - sh, 2)
        det = x
        ud = pltpu.roll(x, _FA_LANES - 5, 2)
        vd = pltpu.roll(x, _FA_LANES - 10, 2)
        td = y
        s = jnp.sign(det)
        ok = jnp.abs(det) > eps
        tt = td / jnp.where(ok, det, 1.0)
        hit5 = ((liota_a < 5) & ok & (ud * s >= 0) & (vd * s >= 0)
                & ((ud + vd - det) * s <= 0) & (tt > eps))
        ttm = jnp.where(hit5, tt, big)
        t_slot = ttm.min(-1)                        # [ty, tx]
        tri_slot = jnp.where(ttm <= t_slot[:, :, None], liota_a, 127
                             ).min(-1).astype(f32)
        better = (t_slot < big) & (t_slot < best_tt)
        best_tt = jnp.where(better, t_slot, best_tt)
        best_case = jnp.where(better, cse, best_case)
        best_tri = jnp.where(better, tri_slot, best_tri)
        best_ca = jnp.where(better, cell_a, best_ca)
        best_cb = jnp.where(better, cell_b, best_cb)

    anyhit = act & (best_tt < big)

    # winner normal: one extra one-hot fetch by winning case, lanes
    # selected by winning triangle
    ohw = (c256 == best_case.astype(i32)[:, :, None]).astype(bf16)
    fkn = jax.lax.dot_general(
        ohw.reshape(P, 256), fb_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=f32).reshape(ty, tx, _FB_LANES)
    tri_lane = (_N_BASE + best_tri.astype(i32) * 3)[:, :, None]
    n3 = []
    for c in range(3):
        n3.append(jnp.where(liota_b == tri_lane + c, fkn, 0.0
                            ).sum(-1))

    hit_ref[:, :] = anyhit.astype(i32)
    t_ref[:, :] = jnp.where(anyhit, best_tt, 0.0)
    case_ref[:, :] = jnp.where(anyhit, best_case, 0.0).astype(i32)
    tri_ref[:, :] = jnp.where(anyhit, best_tri, 0.0).astype(i32)
    ca_ref[:, :] = jnp.where(anyhit, best_ca, 0.0)
    cb_ref[:, :] = jnp.where(anyhit, best_cb, 0.0)
    ns_ref[:, :] = jnp.where(anyhit, n3[0], 0.0)
    na_ref[:, :] = jnp.where(anyhit, n3[1], 0.0)
    nb_ref[:, :] = jnp.where(anyhit, n3[2], 0.0)


def slab_pass_kernel(o, act, uaf, ubf, ct, f_a, f_b, scal_k,
                     *, s_valid: int, flip: bool, b2: int, a_size: int,
                     b_size: int, kcells: int, ty: int = 8):
    """Pallas slab pass over flat [m] rows (m padded to ty*128).

    Returns (anyhit bool[m], tt f32[m] in |rd_sab| param units, case
    i32[m], tri i32[m], ca f32[m], cb f32[m], n_sab f32[m, 3]).
    Traceable; ``interpret`` on non-TPU backends.
    """
    m = o.shape[0]
    P = ty * 128
    mp = m + ((-m) % P)
    if mp != m:
        padz = lambda x: jnp.concatenate(
            [x, jnp.zeros((mp - m,), x.dtype)], 0)
        o, act, uaf, ubf = padz(o), padz(act), padz(uaf), padz(ubf)
    R = mp // 128
    shp = lambda x: x.reshape(R, 128)
    th, cw = ct.shape

    row_spec = pl.BlockSpec((ty, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda s: pl.BlockSpec(s, lambda i: tuple(0 for _ in s),
                                  memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_slab_kernel, ty, th, cw, b2, a_size, b_size,
                          s_valid, flip, kcells),
        grid=(R // ty,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row_spec, row_spec, row_spec, row_spec,
            full(ct.shape), full(f_a.shape), full(f_b.shape),
        ],
        out_specs=[row_spec] * 9,
        out_shape=[
            jax.ShapeDtypeStruct((R, 128), jnp.int32),
            jax.ShapeDtypeStruct((R, 128), jnp.float32),
            jax.ShapeDtypeStruct((R, 128), jnp.int32),
            jax.ShapeDtypeStruct((R, 128), jnp.int32),
            jax.ShapeDtypeStruct((R, 128), jnp.float32),
            jax.ShapeDtypeStruct((R, 128), jnp.float32),
            jax.ShapeDtypeStruct((R, 128), jnp.float32),
            jax.ShapeDtypeStruct((R, 128), jnp.float32),
            jax.ShapeDtypeStruct((R, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((P, th), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=jax.default_backend() != "tpu",
    )(scal_k, shp(o), shp(act.astype(jnp.int32)), shp(uaf), shp(ubf),
      ct, f_a, f_b)

    flat = [x.reshape(mp)[:m] for x in outs]
    hit, tt, case, tri, caw, cbw, ns, na, nb = flat
    return (hit != 0, tt, case, tri, caw, cbw,
            jnp.stack([ns, na, nb], axis=1))


def kernel_fits(th: int, cw: int, ty: int = 8) -> bool:
    """VMEM gate: case table + A scratch must fit comfortably."""
    ct_bytes = th * cw * 2
    scr_bytes = ty * 128 * th * 4
    return ct_bytes <= 7 * 2 ** 20 and scr_bytes <= 3 * 2 ** 20
