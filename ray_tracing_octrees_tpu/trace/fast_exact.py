"""Exact-semantics fast frame: the MXU slab sweep with a carried bit-cube.

Round-4's verdict: the 555 Mrays/s headline carried a 3% hit-mismatch /
2.9-voxel depth-RMS asterisk against the exact tracer, unchanged for three
rounds — the bilinear-threshold detection of trace/slab_sweep.py samples
the volume only at slab centers and quantizes depth to slabs. This module
replaces that detection with the CONSERVATIVE candidate field of the
sweep-exact tracer (trace/sweep_exact.py — widened-footprint tap bits, a
proven superset of every pixel ray's solid crossings) and resolves the
exact first hit per pixel from a small "cube" of occupancy bits carried
through the table, so the fast frame returns trace_octree's answers
(reference semantics: intersectOctreeIterative first solid-leaf entry,
RayTracerBVH.cpp:239-327) at sweep rates:

1. DETECTION chunk loop (MXU): the widened tap einsums of
   sweep_exact._widened_perspective_hats give, per (texel, slab), the
   ta x tb neighborhood-occupancy word and the footprint candidate flag.
   The loop carries, per texel: o1 = first candidate slab, the occupancy
   words at slabs o1, o1+1, o1+2 (the "cube" — selected in-loop by
   closed-form one-hot selects, no scan), a shadow bit per cube slab,
   and the full per-slab candidate words (for the fallback ladder).
2. WARP: three packed f32 planes (24-bit-exact integers) ride the one-hot
   MXU warp to pixels (split_hi_mid_lo keeps them exact in bf16 planes).
3. PIXEL epilogue (VPU, zero gathers): each pixel recomputes its ray and
   its texel's floor cells closed-form (bit-identical formulas to the hat
   build) and runs an exact ray/AABB mini-DDA over the carried cube:
   slabs in sweep order, min entry-t within a slab — the first valid
   solid cell is the ray's true first hit (cells of slab o span s in
   [k, k+1], so slab order is t order; every cell a ray can cross in a
   covered slab lies inside the tap window by the support gate of
   sweep_exact_setup).
4. FALLBACK: pixels whose cube exhausts (first candidate run longer than
   3 slabs) compact into sweep_exact's consume ladder (first_set_from on
   the candidate words + _slab_pass) — exactness never depends on the
   cube depth; the fallback is the proven-exact machinery at ~1% width.

Envelope: the same host gate as the sweep-exact tracer
(sweep_exact_setup): exterior eye + footprints within the tap window.
Callers fall back to the legacy bilinear fast frame (or the exact
tracer) outside it.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_octrees_tpu.trace.slab_sweep import (
    _AXIS_SELECTORS,
    _relayout_sweep,
)
from ray_tracing_octrees_tpu.trace import sweep_exact as se
from ray_tracing_octrees_tpu.trace.mesh_grid import exact_tap_words

_BIGI = jnp.int32(1 << 20)


# --------------------------------------------------------------------------
# Detection sweep with carried cube
# --------------------------------------------------------------------------


def _bilinear_hats(scal, sp: int, s_valid: int, a_size: int, b_size: int,
                   inter_h: int, inter_w: int, flip: bool):
    """Plain bilinear resample hats (slab_sweep._sweep_core's ma/mb) for
    the shadow channel, over the cube path's (widened) window."""
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    eye_s, eye_a, eye_b, z0 = scal[0], scal[1], scal[2], scal[3]
    a_min, a_max, b_min, b_max = scal[4], scal[5], scal[6], scal[7]
    ua = a_min + (a_max - a_min) * (jnp.arange(inter_h, dtype=f32) + 0.5) / inter_h
    ub = b_min + (b_max - b_min) * (jnp.arange(inter_w, dtype=f32) + 0.5) / inter_w
    o_all = jnp.arange(sp, dtype=f32)
    k_all = (f32(s_valid) - 1.0 - o_all) if flip else o_all
    s_all = (z0 - eye_s) / (k_all + 0.5 - eye_s)
    pa_all = (ua[None, :] - eye_a) / s_all[:, None] + eye_a
    pb_all = (ub[None, :] - eye_b) / s_all[:, None] + eye_b
    ia = jnp.arange(a_size, dtype=f32)
    ib = jnp.arange(b_size, dtype=f32)
    ma = jnp.maximum(0.0, 1.0 - jnp.abs(pa_all[..., None] - 0.5 - ia)).astype(bf16)
    mb = jnp.maximum(0.0, 1.0 - jnp.abs(pb_all[..., None] - 0.5 - ib)).astype(bf16)
    return ma, mb


def _plane_layout(nb: int):
    """Static bit layout of the three packed planes for an nb-bit tap word
    (nb = ta*tb <= 15). plane1 holds c0 and the low r1 bits of c1; plane2
    the high bits of c1, then c2, then the two shadow bits s1, s2
    (s0 rides plane0's +2048 flag, the legacy encoding)."""
    r1 = min(24 - nb, nb)          # bits of c1 stored in plane1
    hi1 = nb - r1                  # bits of c1 stored in plane2
    assert hi1 + nb + 2 <= 24
    return r1, hi1


@functools.partial(
    jax.jit,
    static_argnames=("n_chunks", "s_valid", "a_size", "b_size",
                     "inter_h", "inter_w", "flip", "ta", "tb",
                     "has_shadow"))
def _cube_sweep(occ_sw, shadow_sw, scal, n_chunks: int, s_valid: int,
                a_size: int, b_size: int, inter_h: int, inter_w: int,
                flip: bool, ta: int, tb: int, has_shadow: bool):
    """Detection sweep emitting (planes f32[3, IH*IW], words i32[IH*IW, C]).

    planes[0]: legacy packed value (k1 + 0.5 + 2048*sh0, or -1 no-candidate)
    planes[1], planes[2]: cube occupancy words + shadow bits
    (see _plane_layout); words: per-slab candidate bit field (bit o&31 of
    word o>>5), the fallback ladder's bits_src.
    """
    f32 = jnp.float32
    i32 = jnp.int32
    bf16 = jnp.bfloat16
    CH = 32
    sp = n_chunks * CH
    nb = ta * tb
    r1, hi1 = _plane_layout(nb)

    hats = se._widened_perspective_hats(
        scal, sp, s_valid, a_size, b_size, inter_h, inter_w, flip, ta, tb)
    ma_w, mb_w, am_f, bm_f = hats
    if has_shadow:
        sma, smb = _bilinear_hats(scal, sp, s_valid, a_size, b_size,
                                  inter_h, inter_w, flip)

    N = inter_h * inter_w
    o1 = jnp.full((inter_h, inter_w), _BIGI, i32)
    cubes = [jnp.zeros((inter_h, inter_w), i32) for _ in range(3)]
    shb = [jnp.zeros((inter_h, inter_w), i32) for _ in range(3)]
    words = jnp.zeros((N, n_chunks), i32)

    def chunk(ci, carry):
        o1, c0, c1, c2, s0, s1, s2, words = carry
        ma = jax.lax.dynamic_slice_in_dim(ma_w, ci * CH, CH, 0)
        mb = jax.lax.dynamic_slice_in_dim(mb_w, ci * CH, CH, 0)
        sl = jax.lax.dynamic_slice_in_dim(occ_sw, ci * CH, CH, 0)
        amc = jax.lax.dynamic_slice_in_dim(am_f, ci * CH, CH, 0)
        bmc = jax.lax.dynamic_slice_in_dim(bm_f, ci * CH, CH, 0)
        # bit-exact weighted tap words (split-chain form — wide taps
        # overflow bf16 partial sums; see mesh_grid.exact_tap_words)
        det = exact_tap_words(sl, ma, mb, wide=(ta > 3 or tb > 3))
        det_i = det.astype(i32)                                # [CH, h, w]
        fm = (amc[:, :, None] * bmc[:, None, :]).astype(i32)
        cand = (det_i & fm) != 0

        # per-slab candidate words (fallback ladder's bit field)
        word = jnp.zeros((inter_h, inter_w), i32)
        for k in range(CH):
            word = word | (cand[k].astype(i32) << k)
        words = jax.lax.dynamic_update_slice(words, word.reshape(N, 1),
                                             (0, ci))

        any_c = cand.any(axis=0)
        f_rel = jnp.argmax(cand, axis=0).astype(i32)
        o1n = jnp.where(o1 < _BIGI, o1,
                        jnp.where(any_c, ci * CH + f_rel, _BIGI))

        if has_shadow:
            smac = jax.lax.dynamic_slice_in_dim(sma, ci * CH, CH, 0)
            smbc = jax.lax.dynamic_slice_in_dim(smb, ci * CH, CH, 0)
            ssl = jax.lax.dynamic_slice_in_dim(shadow_sw, ci * CH, CH, 0)
            shh = jnp.einsum("cab,cha->cbh", ssl, smac,
                             preferred_element_type=bf16)
            shs = jnp.einsum("cbh,cwb->chw", shh, smbc,
                             preferred_element_type=f32)
            sh_bit = (shs > 0.5).astype(i32)

        kio = jax.lax.broadcasted_iota(i32, (CH, 1, 1), 0)
        outs = []
        for j, (cj, sj) in enumerate(zip((c0, c1, c2), (s0, s1, s2))):
            rel = o1n + j - ci * CH
            onehot = (kio == rel[None]).astype(i32)
            sel = (onehot * det_i).sum(axis=0)
            have = (o1n + j) < ci * CH
            cj2 = jnp.where(have, cj, sel)
            if has_shadow:
                sel_s = (onehot * sh_bit).sum(axis=0)
                sj2 = jnp.where(have, sj, sel_s)
            else:
                sj2 = sj
            outs.append((cj2, sj2))
        (c0, s0), (c1, s1), (c2, s2) = outs
        return o1n, c0, c1, c2, s0, s1, s2, words

    o1, c0, c1, c2, s0, s1, s2, words = jax.lax.fori_loop(
        0, n_chunks, chunk, (o1, *cubes, *shb, words))

    found = o1 < _BIGI
    o1c = jnp.minimum(o1, s_valid - 1)
    k1 = (i32(s_valid) - 1 - o1c) if flip else o1c
    p0 = jnp.where(found,
                   k1.astype(f32) + 0.5 + jnp.where(s0 != 0, 2048.0, 0.0),
                   -1.0)
    p1 = (c0 | ((c1 & ((1 << r1) - 1)) << nb)).astype(f32)
    p2 = ((c1 >> r1) | (c2 << hi1) | (s1 << (hi1 + nb))
          | (s2 << (hi1 + nb + 1))).astype(f32)
    planes = jnp.stack([p0.reshape(-1), p1.reshape(-1), p2.reshape(-1)])
    return planes, words


# --------------------------------------------------------------------------
# Per-pixel epilogue: closed-form cube DDA (zero gathers)
# --------------------------------------------------------------------------


def _pixel_cube_resolve(pv0, pv1, pv2, scal, axis_world: int, flip: bool,
                        S: int, A: int, B: int, IH: int, IW: int,
                        width: int, height: int, ta: int, tb: int):
    """Resolve each pixel's exact first hit from its warped cube planes.

    Returns dict(hit, t, ks, ca, cb, sh, suspicious, found, o1, rd3, ro3,
    texrow) — all [N] component arrays. ``suspicious`` rows (cube
    exhausted with candidates possibly remaining) carry o1 for the
    fallback ladder's start pointer.
    """
    f32 = jnp.float32
    i32 = jnp.int32
    N = width * height
    nb = ta * tb
    ra, rb = (ta - 1) // 2, (tb - 1) // 2
    r1, hi1 = _plane_layout(nb)
    eye_s, eye_a, eye_b, z0 = scal[0], scal[1], scal[2], scal[3]
    a_min, a_max, b_min, b_max = scal[4], scal[5], scal[6], scal[7]
    vs = scal[10]

    # pixel rays + texel mapping: identical formulas to
    # sweep_exact._primary_core (bit-identical rays for the same pixel)
    rd3 = tuple(c / vs for c in se._pixel_rays_sab(scal, axis_world,
                                                   width, height))
    ro3 = (jnp.broadcast_to(eye_s, (N,)), jnp.broadcast_to(eye_a, (N,)),
           jnp.broadcast_to(eye_b, (N,)))
    rd_s = rd3[0]
    forward = (rd_s < 0) if flip else (rd_s > 0)
    safe = jnp.where(jnp.abs(rd_s) < se._DEG, 1.0, rd_s)
    ua = eye_a + (z0 - eye_s) * rd3[1] / safe
    ub = eye_b + (z0 - eye_s) * rd3[2] / safe
    in_win = (ua >= a_min) & (ua <= a_max) & (ub >= b_min) & (ub <= b_max)
    ti = jnp.clip(jnp.floor((ua - a_min) / (a_max - a_min) * IH
                            ).astype(i32), 0, IH - 1)
    tj = jnp.clip(jnp.floor((ub - b_min) / (b_max - b_min) * IW
                            ).astype(i32), 0, IW - 1)
    texrow = ti * IW + tj
    geo_ok = forward & in_win

    found = geo_ok & (pv0 >= 0.0)
    sh0 = found & (pv0 >= 2048.0)
    k1 = jnp.maximum(pv0 - jnp.where(sh0, 2048.0, 0.0) - 0.5, 0.0)
    o1 = (f32(S) - 1.0 - k1) if flip else k1           # sweep-order slab
    w1 = pv1.astype(i32)
    w2 = pv2.astype(i32)
    cube = [w1 & ((1 << nb) - 1),
            ((w1 >> nb) & ((1 << r1) - 1)) | ((w2 & ((1 << hi1) - 1)) << r1),
            (w2 >> hi1) & ((1 << nb) - 1)]
    shbits = [sh0.astype(i32),
              (w2 >> (hi1 + nb)) & 1,
              (w2 >> (hi1 + nb + 1)) & 1]

    # texel-center window coords (must mirror the hat lattice exactly)
    ua0 = a_min + (a_max - a_min) * (ti.astype(f32) + 0.5) / IH
    ub0 = b_min + (b_max - b_min) * (tj.astype(f32) + 0.5) / IW

    got = jnp.zeros(N, jnp.bool_)
    t_hit = jnp.zeros(N, f32)
    ks_h = jnp.zeros(N, i32)
    ca_h = jnp.zeros(N, i32)
    cb_h = jnp.zeros(N, i32)
    sh_h = jnp.zeros(N, jnp.bool_)

    # hoisted per-axis reciprocals: every cell interval is then one
    # multiply-add (the naive per-cell _axis_interval form ran ~50
    # divides/pixel — measured 8.6 ms at 1080p)
    def axis_prep(ro, rd):
        deg = jnp.abs(rd) < se._DEG
        inv = 1.0 / jnp.where(deg, 1.0, rd)
        neg = inv < 0
        return ro, inv, deg, neg

    def axis_iv(prep, lo):
        """(tin, tout) of [lo, lo+1); degenerate axes by position."""
        ro, inv, deg, neg = prep
        t0 = (lo - ro) * inv
        tin = jnp.where(neg, t0 + inv, t0)
        tout = jnp.where(neg, t0, t0 + inv)
        inside = (ro >= lo) & (ro < lo + 1.0)
        tin = jnp.where(deg, jnp.where(inside, -se._BIG, se._BIG), tin)
        tout = jnp.where(deg, jnp.where(inside, se._BIG, -se._BIG), tout)
        return tin, tout

    prep_s = axis_prep(ro3[0], rd3[0])
    prep_a = axis_prep(ro3[1], rd3[1])
    prep_b = axis_prep(ro3[2], rd3[2])

    for j in range(3):
        oj = o1 + f32(j)
        k = (f32(S) - 1.0 - oj) if flip else oj
        # texel floor cells: the hats' pa_all formula verbatim
        inv_s = (k + 0.5 - eye_s) / (z0 - eye_s)
        pa0 = eye_a + (ua0 - eye_a) * inv_s
        pb0 = eye_b + (ub0 - eye_b) * inv_s
        ca0 = jnp.floor(pa0)
        cb0 = jnp.floor(pb0)
        ts0, ts1 = axis_iv(prep_s, k)
        tia = [axis_iv(prep_a, ca0 + (ia - ra)) for ia in range(ta)]
        tib = [axis_iv(prep_b, cb0 + (ib - rb)) for ib in range(tb)]
        best = jnp.full(N, se._BIG)
        bca = jnp.zeros(N, f32)
        bcb = jnp.zeros(N, f32)
        wj = cube[j]
        for ia in range(ta):
            for ib in range(tb):
                bit = (wj >> (ia * tb + ib)) & 1
                tin = jnp.maximum(ts0, jnp.maximum(tia[ia][0], tib[ib][0]))
                tout = jnp.minimum(ts1, jnp.minimum(tia[ia][1], tib[ib][1]))
                ok = (bit != 0) & (tin <= tout) & (tout > 0.0)
                t_c = jnp.where(ok, jnp.maximum(tin, 0.0), se._BIG)
                better = t_c < best
                best = jnp.where(better, t_c, best)
                bca = jnp.where(better, ca0 + (ia - ra), bca)
                bcb = jnp.where(better, cb0 + (ib - rb), bcb)
        slab_ok = found & (oj < f32(S)) & (best < se._BIG)
        newly = ~got & slab_ok
        got = got | newly
        t_hit = jnp.where(newly, best, t_hit)
        ks_h = jnp.where(newly, k.astype(i32), ks_h)
        ca_h = jnp.where(newly, bca.astype(i32), ca_h)
        cb_h = jnp.where(newly, bcb.astype(i32), cb_h)
        sh_h = jnp.where(newly, shbits[j] != 0, sh_h)

    suspicious = found & ~got
    return dict(hit=got, t=t_hit, ks=ks_h, ca=ca_h, cb=cb_h, sh=sh_h,
                suspicious=suspicious, found=found,
                o1=jnp.where(found, o1.astype(i32), 0),
                rd3=rd3, ro3=ro3, texrow=texrow)


# --------------------------------------------------------------------------
# Fallback ladder (sweep_exact's consume machinery at ~1% width)
# --------------------------------------------------------------------------


def _fallback_ladder(n: int, sp: int):
    """Suspicious rows measured at ~2-4% of pixels on Calgary poses (the
    consecutive 3-slab cube resolves the rest; sparse-candidate rows and
    silhouette grazes walk on). Overflow is counted, never dropped —
    but a dropped row IS a wrong pixel, so stage 1 takes 6% of n."""
    widths = (n, max(2048, int(n * 0.06)), max(1024, n // 128),
              max(512, n // 1024))
    caps = (0, 2, 8, 8 + sp)
    return widths, caps


def _run_fallback(res, words, nb9, scal, axis_world: int, flip: bool,
                  S: int, A: int, B: int, IH: int, IW: int,
                  width: int, height: int, ta: int, tb: int):
    """Exact consume for suspicious rows; returns (state1, map1, rounds,
    overflow) at stage-1 width (sweep_exact._consume_ladder layout).

    (A 16-px-block pre-compaction was tried against the full-width sort:
    silhouette suspicion does NOT cluster — 1-2 suspicious px per block —
    so expansion cost ~10x the width and dropped rows; the fused-key
    full-width sort inside _consume_ladder is the measured floor.)"""
    i32 = jnp.int32
    f32 = jnp.float32
    N = width * height
    eye_s, eye_a, eye_b, z0 = scal[0], scal[1], scal[2], scal[3]
    a_min, a_max, b_min, b_max = scal[4], scal[5], scal[6], scal[7]
    vs = scal[10]

    def stage0_geom(idxs):
        xf = (idxs % width).astype(f32)
        yf = (idxs // width).astype(f32)
        rd3_s = tuple(c / vs for c in se._rays_sab_from_xy(
            xf, yf, scal, axis_world, width, height))
        rs = rd3_s[0]
        sf_ = jnp.where(jnp.abs(rs) < se._DEG, 1.0, rs)
        ua_ = eye_a + (z0 - eye_s) * rd3_s[1] / sf_
        ub_ = eye_b + (z0 - eye_s) * rd3_s[2] / sf_
        ti_ = jnp.clip(jnp.floor((ua_ - a_min) / (a_max - a_min) * IH
                                 ).astype(i32), 0, IH - 1)
        tj_ = jnp.clip(jnp.floor((ub_ - b_min) / (b_max - b_min) * IW
                                 ).astype(i32), 0, IW - 1)
        m = idxs.shape[0]
        ro3_s = (jnp.broadcast_to(eye_s, (m,)),
                 jnp.broadcast_to(eye_a, (m,)),
                 jnp.broadcast_to(eye_b, (m,)))
        return ro3_s, rd3_s, ti_ * IW + tj_

    widths, caps = _fallback_ladder(N, S)
    ptr0 = jnp.where(res["suspicious"], res["o1"] + 3, 0)
    st1, map1, rounds, overflow = se._consume_ladder(
        words, res["texrow"], ptr0, ~res["suspicious"], res["ro3"],
        res["rd3"], nb9, S, A, B, flip, widths, caps, const_origin=True,
        ta=ta, tb=tb, want_stage1=True, stage0_geom=stage0_geom,
        stage0_gather_ptr=True)
    return st1, map1, rounds, overflow


# --------------------------------------------------------------------------
# Frame assembly
# --------------------------------------------------------------------------


def _shade_components(hit, t, ks, ca, cb, sh, rd3, scal, axis_world: int,
                      has_shadow: bool):
    """Lambert + shadow shade from sweep-space hit cells; returns packed
    0xRRGGBB i32 (the fused kernel's output convention). All [M]
    component math — no [M, 3] layouts."""
    f32 = jnp.float32
    i32 = jnp.int32
    vs = scal[10]
    org3 = tuple(scal[12 + c] for c in range(3))
    cam3 = tuple(scal[15 + c] for c in range(3))
    light = scal[34:37]
    l = light / jnp.linalg.norm(light)
    perm = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}[axis_world]
    inv_perm = [perm.index(c) for c in range(3)]
    sab_cell = (ks.astype(f32), ca.astype(f32), cb.astype(f32))
    sab_dir = rd3
    ndl = jnp.zeros_like(t)
    n2 = jnp.zeros_like(t)
    nrm = []
    for c in range(3):
        d_c = sab_dir[inv_perm[c]] * vs       # unit world dir component
        p_c = cam3[c] + d_c * t
        cen = org3[c] + (sab_cell[inv_perm[c]] + 0.5) * vs
        n_c = p_c - cen
        nrm.append(n_c)
        n2 = n2 + n_c * n_c
        ndl = ndl + n_c * l[c]
    ndotl = jnp.maximum(0.0, -ndl / jnp.maximum(jnp.sqrt(n2), 1e-12))
    packed = jnp.zeros(t.shape, i32)
    for c in range(3):
        col = scal[37 + c] * ndotl + scal[40 + c]
        if has_shadow:
            col = jnp.where(sh, scal[40 + c], col)
        col = jnp.where(hit, col, 0.0)
        q = jnp.clip(col * 255.0 + 0.5, 0.0, 255.0).astype(i32)
        packed = (packed << 8) | q
    return packed


def _warp_planes(planes, lin2, IH: int, IW: int, width: int, height: int,
                 warp_cfg):
    """Warp the three packed planes to pixels: one multi-plane Pallas call
    on TPU, three XLA takes elsewhere. Returns (pv0, pv1, pv2) [N]."""
    if warp_cfg is None:
        flat = jnp.maximum(lin2.reshape(-1), 0)
        iu = flat >> 10
        iv = flat & 1023
        idx = iu * IW + iv
        pv = [jnp.take(planes[p], idx) for p in range(3)]
        dead = lin2.reshape(-1) < 0
        pv[0] = jnp.where(dead, -1.0, pv[0])
        pv[1] = jnp.where(dead, 0.0, pv[1])
        pv[2] = jnp.where(dead, 0.0, pv[2])
        return pv[0], pv[1], pv[2]
    from ray_tracing_octrees_tpu.trace.warp_kernel import (
        split_hi_lo, split_hi_mid_lo, warp_lookup_multi,
    )

    ty, tx, win = warp_cfg
    t0 = split_hi_lo(planes[0].reshape(IH, IW))
    t1 = split_hi_mid_lo(planes[1].reshape(IH, IW))
    t2 = split_hi_mid_lo(planes[2].reshape(IH, IW))
    ph, pw = (-height) % ty, (-width) % tx
    if ph or pw:
        lin2 = jnp.pad(lin2, ((0, ph), (0, pw)), constant_values=-1)
    o0, o1_, o2 = warp_lookup_multi(
        jnp.concatenate([t0, t1, t2], axis=0), (2, 3, 3), lin2, ty, tx, win)
    pv0 = o0[:height, :width].reshape(-1)
    pv1 = jnp.maximum(o1_[:height, :width].reshape(-1), 0.0)
    pv2 = jnp.maximum(o2[:height, :width].reshape(-1), 0.0)
    return pv0, pv1, pv2


@functools.partial(
    jax.jit,
    static_argnames=("n_chunks", "S", "A", "B", "IH", "IW", "flip",
                     "axis_world", "width", "height", "ta", "tb",
                     "has_shadow", "warp_cfg", "want_image"))
def _fast_exact_frame_jit(occ_sw, shadow_native, nb9, scal, n_chunks, S, A,
                          B, IH, IW, flip, axis_world, width, height, ta,
                          tb, has_shadow, warp_cfg, want_image):
    f32 = jnp.float32
    i32 = jnp.int32
    N = width * height
    sp = n_chunks * 32
    shv = _relayout_sweep(shadow_native, axis_world, flip, sp, A, B,
                          0, S) if has_shadow else occ_sw[:1]
    planes, words = _cube_sweep(
        occ_sw, shv, scal, n_chunks, S, A, B, IH, IW, flip, ta, tb,
        has_shadow)

    # per-pixel lin for the warp (identical mapping to the epilogue's
    # texrow; packed (iu << 10) | iv per the kernel convention)
    res_probe = None
    rd3 = tuple(c / scal[10] for c in se._pixel_rays_sab(
        scal, axis_world, width, height))
    rd_s = rd3[0]
    forward = (rd_s < 0) if flip else (rd_s > 0)
    safe = jnp.where(jnp.abs(rd_s) < se._DEG, 1.0, rd_s)
    eye_s, eye_a, eye_b, z0 = scal[0], scal[1], scal[2], scal[3]
    a_min, a_max, b_min, b_max = scal[4], scal[5], scal[6], scal[7]
    ua = eye_a + (z0 - eye_s) * rd3[1] / safe
    ub = eye_b + (z0 - eye_s) * rd3[2] / safe
    in_win = (ua >= a_min) & (ua <= a_max) & (ub >= b_min) & (ub <= b_max)
    ti = jnp.clip(jnp.floor((ua - a_min) / (a_max - a_min) * IH
                            ).astype(i32), 0, IH - 1)
    tj = jnp.clip(jnp.floor((ub - b_min) / (b_max - b_min) * IW
                            ).astype(i32), 0, IW - 1)
    lin = jnp.where(forward & in_win, (ti << 10) | tj, -1)
    pv0, pv1, pv2 = _warp_planes(planes, lin.reshape(height, width),
                                 IH, IW, width, height, warp_cfg)

    res = _pixel_cube_resolve(pv0, pv1, pv2, scal, axis_world, flip,
                              S, A, B, IH, IW, width, height, ta, tb)

    # DIAGNOSTIC ablation (breaks exactness — suspicious rows become
    # misses): RTO_FE_NO_FALLBACK=1 measures the fallback ladder's
    # marginal cost. Measured round 5 at 1080p: 30.3 -> 16.3 ms, i.e.
    # the ladder serving ~3.4% of pixels costs ~14 ms — the dominant
    # round-6 target (the full-width sort-compaction is width-
    # independent; lax.top_k as a replacement compiled/ran > 9 min and
    # was rejected; 16-px-block pre-compaction failed on clustering).
    import os as _os
    if _os.environ.get("RTO_FE_NO_FALLBACK"):
        _m1 = 2048
        st1 = dict(hit=jnp.zeros(_m1, jnp.bool_), t=jnp.zeros(_m1, jnp.float32),
                   ks=jnp.zeros(_m1, jnp.int32), ca=jnp.zeros(_m1, jnp.int32),
                   cb=jnp.zeros(_m1, jnp.int32), ptr=jnp.zeros(_m1, jnp.int32),
                   resolved=jnp.ones(_m1, jnp.bool_))
        map1 = dict(unres=jnp.zeros(N, jnp.bool_), rank=jnp.zeros(N, jnp.int32),
                    M=_m1, rd=tuple(jnp.zeros(_m1, jnp.float32) for _ in range(3)),
                    ro=tuple(jnp.zeros(_m1, jnp.float32) for _ in range(3)),
                    pix=jnp.zeros(_m1, jnp.int32),
                    row_valid=jnp.zeros(_m1, jnp.bool_))
        rounds = overflow = jnp.zeros((), jnp.int32)
    else:
        st1, map1, rounds, overflow = _run_fallback(
            res, words, nb9, scal, axis_world, flip, S, A, B, IH, IW,
            width, height, ta, tb)

    # fallback shadow: one tiny gather of the relayout shadow volume at
    # the resolved cell (bilinear>0.5 at the texel is the main path's
    # convention; nearest-cell here — divergence confined to the <=2%
    # fallback rows at shadow boundaries)
    if has_shadow:
        o_s = jnp.where(st1["hit"],
                        (i32(S) - 1 - st1["ks"]) if flip else st1["ks"], 0)
        fi = (jnp.clip(o_s, 0, sp - 1) * A
              + jnp.clip(st1["ca"], 0, A - 1)) * B \
            + jnp.clip(st1["cb"], 0, B - 1)
        sh1 = jnp.take(shv.reshape(-1), fi).astype(f32) > 0.5
    else:
        sh1 = jnp.zeros(st1["hit"].shape, jnp.bool_)

    stats = dict(rounds=rounds, overflow=overflow,
                 suspicious=res["suspicious"].sum(),
                 unresolved=jnp.sum(~st1["resolved"] & ~st1["hit"]
                                    & (jnp.arange(st1["hit"].shape[0])
                                       < map1["M"])) + overflow)

    if want_image:
        packed = _shade_components(
            res["hit"], res["t"], res["ks"], res["ca"], res["cb"],
            res["sh"], res["rd3"], scal, axis_world, has_shadow)
        # scatter fallback rows into the flat packed canvas (1-D scatter,
        # ~6.4 ns/elem at ~1% width — the [N, C] merge gather costs 10 ms)
        fb_pack = _shade_components(
            st1["hit"], jnp.where(st1["hit"], st1["t"], 0.0), st1["ks"],
            st1["ca"], st1["cb"], sh1, map1["rd"], scal, axis_world,
            has_shadow)
        pix = map1["pix"]
        live = map1["row_valid"]
        packed = packed.at[jnp.where(live, pix, N)].set(
            jnp.where(live, fb_pack, 0), mode="drop")
        r = ((packed >> 16) & 255).astype(f32)
        g = ((packed >> 8) & 255).astype(f32)
        b = (packed & 255).astype(f32)
        a = jnp.full_like(r, 255.0)
        img = jnp.stack([r, g, b, a], axis=-1) * (1.0 / 255.0)
        return img.reshape(height, width, 4), stats

    # first-hit mode: scatter hit/t and the cell back to full width
    hit = res["hit"].at[jnp.where(map1["row_valid"], map1["pix"], N)].set(
        st1["hit"], mode="drop")
    t = res["t"].at[jnp.where(map1["row_valid"], map1["pix"], N)].set(
        jnp.where(st1["hit"], st1["t"], 0.0), mode="drop")
    return dict(hit=hit, t=t, rd3=res["rd3"]), stats


# --------------------------------------------------------------------------
# Public API
# --------------------------------------------------------------------------


def fast_exact_setup(volume, grid_origin, voxel_size, camera_pos, view,
                     max_inter: int = 1024, density: float = 3.5):
    """Host gate + config: sweep_exact_setup's envelope (exterior eye,
    footprint within the tap window), plus the Pallas warp plan.

    density 3.5 texels/voxel (vs the bilinear sweep's 6): exactness is
    lattice-independent and the cube absorbs the wider footprints; the
    b-contraction, warp table, and VPU carry costs are all linear in
    lattice area (Calgary bench: IW 768 -> 384 halves the sweep)."""
    ok, cfg = se.sweep_exact_setup(volume, grid_origin, voxel_size,
                                   camera_pos, view, max_inter, density)
    return ok, cfg


def _plan_cube_warp(cfg, scal_np, width: int, height: int):
    if jax.default_backend() != "tpu":
        return None
    if cfg["IW"] > 1024 or cfg["IW"] % 128:
        return None
    from ray_tracing_octrees_tpu.trace.warp_kernel import plan_warp

    return plan_warp(scal_np, _AXIS_SELECTORS, cfg["axis_world"],
                     cfg["IH"], cfg["IW"], width, height)


def render_fast_exact_frame(volume, shadow_vol, grid_origin, voxel_size,
                            camera_pos, view, fov_deg: float, aspect: float,
                            width: int, height: int,
                            light_dir=(-1.0, -1.0, -1.0),
                            base_color=(1.0, 0.8, 0.6),
                            ambient=(0.1, 0.1, 0.1),
                            with_stats: bool = False):
    """Exact-semantics fast frame (image), or None outside the envelope.

    Image-comparable to slab_sweep.render_fast_frame (same shading
    formulas) with hit/t from trace_octree's reference semantics.
    """
    ok, cfg = fast_exact_setup(volume, grid_origin, voxel_size,
                               camera_pos, view)
    if not ok:
        return None
    scal = cfg["scal_np"].copy()
    scal[8], scal[9] = fov_deg, aspect
    scal[34:37] = light_dir
    scal[37:40] = base_color
    scal[40:43] = ambient
    has_shadow = shadow_vol is not None
    sh_arg = shadow_vol if has_shadow else jnp.zeros((1, 1, 1), jnp.float32)
    occ_sw = cfg["occ_sw"]
    img, stats = _fast_exact_frame_jit(
        occ_sw, sh_arg, cfg["nb9"], jnp.asarray(scal),
        occ_sw.shape[0] // 32, cfg["S"], cfg["A"], cfg["B"],
        cfg["IH"], cfg["IW"], cfg["flip"], cfg["axis_world"],
        width, height, cfg["ta"], cfg["tb"], has_shadow,
        _plan_cube_warp(cfg, scal, width, height), True)
    return (img, stats) if with_stats else img


def fast_exact_first_hit(volume, grid_origin, voxel_size, camera_pos, view,
                         fov_deg: float, aspect: float,
                         width: int, height: int):
    """Exact (hit bool[N], t f32[N], point f32[N,3], dirs f32[N,3]) via
    the cube path, or None outside the envelope. Matches trace_octree's
    hit/t per pixel (sweep_first_hit's signature for parity probes)."""
    ok, cfg = fast_exact_setup(volume, grid_origin, voxel_size,
                               camera_pos, view)
    if not ok:
        return None
    scal = cfg["scal_np"].copy()
    scal[8], scal[9] = fov_deg, aspect
    occ_sw = cfg["occ_sw"]
    res, stats = _fast_exact_frame_jit(
        occ_sw, jnp.zeros((1, 1, 1), jnp.float32), cfg["nb9"],
        jnp.asarray(scal), occ_sw.shape[0] // 32, cfg["S"], cfg["A"],
        cfg["B"], cfg["IH"], cfg["IW"], cfg["flip"], cfg["axis_world"],
        width, height, cfg["ta"], cfg["tb"], False,
        _plan_cube_warp(cfg, scal, width, height), False)
    perm = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}[cfg["axis_world"]]
    inv_perm = [perm.index(c) for c in range(3)]
    vs = scal[10]
    dirs = jnp.stack([res["rd3"][inv_perm[c]] * vs for c in range(3)],
                     axis=1)
    cam = jnp.asarray(scal[15:18])
    t = res["t"]
    point = cam[None, :] + dirs * t[:, None]
    return res["hit"], t, point, dirs
