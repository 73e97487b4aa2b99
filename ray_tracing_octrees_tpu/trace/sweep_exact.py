"""Sweep-exact octree tracer: reference-semantics first-hit at MXU rates.

The exact tracer (trace/octree_trace.py) reproduces the reference's
octree traversal (intersectOctreeIterative, RayTracerBVH.cpp:239-327)
with per-ray gather DDA — correct, but rate-limited by XLA's scalar
gather floor (~8 ns/element): measured 2.57 Mrays/s primary on Calgary
(tools/time_exact.py) even with leaf-volume fetches, Chebyshev ball
skipping, sweep seeds and a compaction ladder. This module reaches the
same EXACT first-hit answers through the MXU slab-sweep machinery
instead:

1. A DETECTION bit-field sweep (the separable 3-tap einsum chain of
   trace/mesh_grid.py::_sweep_candidates) over a lateral texel lattice,
   with each texel's per-slab footprint WIDENED by the texel half-cell:
   the widened interval contains the footprint of EVERY pixel ray whose
   reference-plane crossing lies in that texel's cell, so the texel's
   bit field is a proven superset of any such ray's candidate slabs
   (bit o = "some cell the ray crosses in slab o is solid").
2. Consume rounds on the ACTUAL per-pixel rays (not texel rays — no
   warp, no nearest-texel approximation): each round resolves one
   candidate slab per unresolved ray with ONE gather of a packed 3x3
   neighborhood-occupancy volume plus exact ray/AABB slab tests of the
   up-to-9 footprint cells (VPU only; unlike the mesh tracer there is
   no per-candidate MXU case fetch — a voxel "triangle test" is just
   the box test). Rays run on a compaction ladder as survivors decay.
3. First hit: cells of slab o occupy exactly s in [k, k+1], so slab
   order IS t order along the ray; the first slab with a valid solid
   intersection yields the global nearest hit, with
   t = max(entry_t, 0) — the reference's tNear-of-solid-leaf semantics
   (RayTracerBVH.cpp:283-287): a solid octree leaf is solid in EVERY
   voxel, so the ray's entry into the leaf box equals its entry into
   the first solid voxel it crosses (the entered voxel's face lies on
   the leaf-box face).
4. The leaf node's identity (for the normalize(p - nodeCenter) normal)
   comes from ONE leaf-volume byte gather at the hit voxel
   (core/octree.py::build_leaf_volume).

Shadow rays (render_octree_image's per-hit ray toward the light,
BASELINE configs[3] "primary + shadow") get the same treatment with an
ORTHOGRAPHIC light-space sweep: all shadow rays share one direction, so
a ray's lateral path is affine in the slab index with a shared slope
and the whole detection field is CAMERA-INDEPENDENT — precomputed once
per scene (build_shadow_field), leaving only the per-ray consume rounds
in the frame.

Exactness envelope (host-gated, sweep_exact_supported):
- the eye must be outside the volume along the sweep axis (the same
  exterior condition as slab_sweep._sweep_geometry; interior cameras
  fall back to the gather tracer),
- the per-axis footprint half-width + lattice pad must fit a tap
  window: both axes within +-1 (3x3 taps, the cheap default) or ONE
  axis within +-2 (5x3 / 3x5 taps — the weight products must stay
  f32-exact, capping ta*tb at 15 bits). The Calgary bench pose needs
  5 taps on its long lateral axis (corner-ray slope ~2.8 voxels/slab),
- rays pointing backward along the sweep axis are PROVABLY misses for
  an exterior eye (they never enter the slab range) — reported as such.
Floating-point caveat: detection positions and the DDA tracer's nudged
positions round differently at exact cell boundaries; the widened
footprint gives ~0.2-voxel margin, so mismatches require a geometric
coincidence at the 1e-6 scale (tests assert exact hit-mask equality on
randomized scenes and poses).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_octrees_tpu.trace.slab_sweep import (
    _AXIS_SELECTORS,
    _auto_inter,
    _frame_scalars_np,
    _layout_volume,
    _sweep_geometry,
    first_set_from,
)
from ray_tracing_octrees_tpu.trace.mesh_grid import _sweep_candidates

_BIG = jnp.float32(3.0e38)
_DEG = 1e-12


# --------------------------------------------------------------------------
# Packed 3x3 neighborhood occupancy (the consume rounds' one gather)
# --------------------------------------------------------------------------


def _shift_axis(cs, off, axis):
    """Zero-padded shift: result[..., i, ...] = cs[..., i + off, ...]."""
    if off == 0:
        return cs
    zeros = jnp.zeros([abs(off) if i == axis else s
                       for i, s in enumerate(cs.shape)], cs.dtype)
    sl = [slice(None)] * cs.ndim
    if off > 0:
        sl[axis] = slice(off, None)
        return jnp.concatenate([cs[tuple(sl)], zeros], axis=axis)
    sl[axis] = slice(0, cs.shape[axis] + off)
    return jnp.concatenate([zeros, cs[tuple(sl)]], axis=axis)


def _pack_neighborhood(occ_sw: jax.Array, ta: int = 3,
                       tb: int = 3) -> jax.Array:
    """f32[sp*A*B]: bit tb*(da+ra) + (db+rb) set iff cell
    (o, a+da, b+db) is solid (ra = (ta-1)//2, rb = (tb-1)//2; zeros past
    the lateral edges) — the same bit scheme as the detection mask hats,
    so one element fetch answers a consume round's full ta x tb
    footprint window. ta*tb <= 15 keeps the packed value f32-exact
    alongside the detection sweep's weight products."""
    assert ta * tb <= 15
    ra, rb = (ta - 1) // 2, (tb - 1) // 2
    cs = (occ_sw > 0).astype(jnp.float32)
    sp, A, B = cs.shape
    out = jnp.zeros((sp, A, B), jnp.float32)
    for da in range(-ra, ra + 1):
        sa_ = _shift_axis(cs, da, 1)
        for db in range(-rb, rb + 1):
            s_ = _shift_axis(sa_, db, 2)
            # neighbor value at (a+da, b+db) lands at (a, b)
            out = out + s_ * np.float32(2 ** (tb * (da + ra) + (db + rb)))
    return out.reshape(-1)


# --------------------------------------------------------------------------
# Widened detection hats
# --------------------------------------------------------------------------


def _tap_weights(ta: int, tb: int):
    """Per-axis integer weights whose products enumerate distinct bits:
    a-tap da -> 2^(tb*(da+ra)), b-tap db -> 2^(db+rb). For (3,3) these
    are the {1,8,64} x {1,2,4} of mesh_grid._build_detect_hats."""
    ra, rb = (ta - 1) // 2, (tb - 1) // 2
    wa = [float(2 ** (tb * i)) for i in range(ta)]
    wb = [float(2 ** i) for i in range(tb)]
    return ra, rb, wa, wb


def _widened_perspective_hats(scal_np, sp: int, s_valid: int, a_size: int,
                              b_size: int, inter_h: int, inter_w: int,
                              flip: bool, ta: int = 3, tb: int = 3):
    """Per-frame detection hats whose footprint masks are widened so each
    texel's bits cover EVERY ray through its lattice cell.

    For a ray through lateral window coordinate ua (a-axis; same for b),
    the slab-center lateral position is pa(ua, o) = eye_a +
    (ua - eye_a) / s_scale(o), and the in-slab footprint half-width is
    half(ua) = 0.5 |ua - eye_a| / |z0 - eye_s|. Over the texel cell
    |ua - ua0| <= ha (half the lattice spacing) the footprint union is
    contained in [pa0 - half0 - wa(o), pa0 + half0 + wa(o)] with

        wa(o) = ha * (|1/s_scale(o)| + 0.5 / |z0 - eye_s|).

    Mask taps (occupancy of floor(pa)+{-1,0,1}, weights {1,8,64} x
    {1,2,4}) are unchanged from mesh_grid._build_detect_hats; only the
    footprint interval bits widen. Requires half + w <= 1 per axis per
    slab (checked by sweep_exact_supported) so the widened interval
    stays inside the 3-tap window.

    Returns (ma_w, mb_w, am, bm) in _sweep_candidates' layout.
    """
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    scal = jnp.asarray(scal_np)
    eye_s, eye_a, eye_b, z0 = scal[0], scal[1], scal[2], scal[3]
    a_min, a_max, b_min, b_max = scal[4], scal[5], scal[6], scal[7]

    ua = a_min + (a_max - a_min) * (jnp.arange(inter_h, dtype=f32) + 0.5) / inter_h
    ub = b_min + (b_max - b_min) * (jnp.arange(inter_w, dtype=f32) + 0.5) / inter_w
    ha = 0.5 * (a_max - a_min) / inter_h
    hb = 0.5 * (b_max - b_min) / inter_w
    o_all = jnp.arange(sp, dtype=f32)
    k_all = (f32(s_valid) - 1.0 - o_all) if flip else o_all
    inv_s = (k_all + 0.5 - eye_s) / (z0 - eye_s)            # 1/s_scale
    pa_all = eye_a + (ua[None, :] - eye_a) * inv_s[:, None]  # [sp, IH]
    pb_all = eye_b + (ub[None, :] - eye_b) * inv_s[:, None]  # [sp, IW]
    inv_z = 0.5 / jnp.abs(z0 - eye_s)
    wa = ha * (jnp.abs(inv_s) + inv_z)                       # [sp]
    wb = hb * (jnp.abs(inv_s) + inv_z)
    half_a = 0.5 * jnp.abs((ua - eye_a) / (z0 - eye_s))      # [IH]
    half_b = 0.5 * jnp.abs((ub - eye_b) / (z0 - eye_s))      # [IW]

    ra, rb, wa_l, wb_l = _tap_weights(ta, tb)
    ma_w = _taps(pa_all, a_size, ra, wa_l)
    mb_w = _taps(pb_all, b_size, rb, wb_l)
    am = _fmask(pa_all, half_a[None, :] + wa[:, None], ra, wa_l)
    bm = _fmask(pb_all, half_b[None, :] + wb[:, None], rb, wb_l)
    return ma_w, mb_w, am, bm


def _taps(p_all, size, r: int, weights):
    """Occupancy taps: weight w_i multiplies the cell floor(p) + (i - r)
    (mesh_grid._build_detect_hats' 3-tap form, generalized).

    The weights are powers of two with a common log2 stride (per
    _tap_weights), so the whole [*, size] tap matrix is ONE fused
    elementwise pass: m = exp2(stride * i) at tap index
    i = a - floor(p) + r, zero outside [0, len(weights)) — every value a
    power of two, bf16-exact. (The per-weight masked-add form cost ~5.5
    ms/frame on Calgary; this form ~1 ms.)"""
    f32 = jnp.float32
    nw = len(weights)
    stride = 0.0 if nw < 2 else float(np.log2(weights[1]))
    d2 = (jnp.arange(size, dtype=f32)
          - jnp.floor(p_all)[..., None] + f32(r))     # tap index per cell
    inside = (d2 >= 0) & (d2 < nw)
    m = jnp.where(inside, jnp.exp2(f32(stride) * d2), 0.0)
    return m.astype(jnp.bfloat16)


def _fmask(p_all, ext, r: int, weights):
    """Footprint-interval mask: sum of w_i over cell offsets (i - r)
    inside [floor(p - ext), floor(p + ext)] - floor(p). Exact while
    ext <= r (the support gate)."""
    f32 = jnp.float32
    lo = jnp.floor(p_all - ext) - jnp.floor(p_all)
    hi = jnp.floor(p_all + ext) - jnp.floor(p_all)
    m = jnp.zeros(p_all.shape, f32)
    for i, w in enumerate(weights):
        da = float(i - r)
        m = m + f32(w) * ((lo <= da) & (da <= hi)).astype(f32)
    return m


def _ortho_hats(sa: float, sb: float, aa_min: float, aa_span: float,
                ab_min: float, ab_span: float, sp: int, s_valid: int,
                a_size: int, b_size: int, inter_h: int, inter_w: int,
                flip: bool, ta: int = 3, tb: int = 3):
    """Detection hats for the ORTHOGRAPHIC light-space sweep.

    All shadow rays share direction, so a ray is identified by its
    intercept (alpha_a, alpha_b): lateral position at slab k is
    alpha + slope * (k + 0.5) with the SHARED slope (sa, sb). The
    footprint half-width is the constant |slope|/2, and the texel-cell
    widening is exactly the half lattice spacing (intercepts translate
    positions 1:1). Camera-independent: built once per (scene, light).
    """
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    aa = aa_min + aa_span * (jnp.arange(inter_h, dtype=f32) + 0.5) / inter_h
    ab = ab_min + ab_span * (jnp.arange(inter_w, dtype=f32) + 0.5) / inter_w
    ha = 0.5 * aa_span / inter_h
    hb = 0.5 * ab_span / inter_w
    o_all = jnp.arange(sp, dtype=f32)
    k_all = (f32(s_valid) - 1.0 - o_all) if flip else o_all
    pa_all = aa[None, :] + f32(sa) * (k_all[:, None] + 0.5)  # [sp, IH]
    pb_all = ab[None, :] + f32(sb) * (k_all[:, None] + 0.5)  # [sp, IW]
    ra, rb, wa_l, wb_l = _tap_weights(ta, tb)
    ma_w = _taps(pa_all, a_size, ra, wa_l)
    mb_w = _taps(pb_all, b_size, rb, wb_l)
    am = _fmask(pa_all, f32(abs(sa) * 0.5 + ha), ra, wa_l)
    bm = _fmask(pb_all, f32(abs(sb) * 0.5 + hb), rb, wb_l)
    return ma_w, mb_w, am, bm


# --------------------------------------------------------------------------
# Exact consume: rounds of (first-set-bit slab -> 9-cell ray/AABB test)
# --------------------------------------------------------------------------


def _axis_interval(ro, rd, lo, hi):
    """Exact slab interval of ray coordinate (ro + t*rd) within [lo, hi).

    Degenerate axes (|rd| ~ 0) resolve by position, as the DDA tracer's
    _degenerate_axes path does (trace/octree_trace.py:59-84).
    Returns (tin, tout)."""
    deg = jnp.abs(rd) < _DEG
    inv = 1.0 / jnp.where(deg, 1.0, rd)
    t0 = (lo - ro) * inv
    t1 = (hi - ro) * inv
    tin = jnp.minimum(t0, t1)
    tout = jnp.maximum(t0, t1)
    inside = (ro >= lo) & (ro < hi)
    tin = jnp.where(deg, jnp.where(inside, -_BIG, _BIG), tin)
    tout = jnp.where(deg, jnp.where(inside, _BIG, -_BIG), tout)
    return tin, tout


def _consume_state(m):
    f32 = jnp.float32
    i32 = jnp.int32
    return dict(
        ptr=jnp.zeros(m, i32), resolved=jnp.zeros(m, jnp.bool_),
        hit=jnp.zeros(m, jnp.bool_), t=jnp.zeros(m, f32),
        ks=jnp.zeros(m, i32), ca=jnp.zeros(m, i32), cb=jnp.zeros(m, i32),
    )


def _slab_pass(o_f, ro3, rd3, nb9, s_valid: int, a_size: int,
               b_size: int, flip: bool, ta: int = 3, tb: int = 3):
    """One candidate slab per row: packed-neighborhood gather + exact
    ta x tb-cell AABB tests.

    Cells of slab o span s in [k, k+1] exactly, so the first slab with a
    valid solid intersection holds the ray's global nearest solid-voxel
    entry. ``ro3``/``rd3`` are (s, a, b) COMPONENT tuples of [m] arrays —
    narrow-minor-dim [m, 3] layouts tile at T(8,128) = ~42x their bytes
    on TPU (docs/ROADMAP.md), which made ray setup alone cost 20 ms at
    1080p. Returns (anyhit, t_entry, ca_win, cb_win) with t in the
    parametrization of rd3 and t_entry = max(entry, 0)."""
    f32 = jnp.float32
    i32 = jnp.int32
    ra, rb = (ta - 1) // 2, (tb - 1) // 2
    k = (f32(s_valid) - 1.0 - o_f) if flip else o_f
    ro_s, ro_a, ro_b = ro3
    rd_s, rd_a, rd_b = rd3
    t_c = (k + 0.5 - ro_s) / rd_s          # rd_s never ~0 (axis choice)
    pa = ro_a + rd_a * t_c
    pb = ro_b + rd_b * t_c
    ca = jnp.floor(pa)
    cb = jnp.floor(pb)

    # Fetch the neighborhood mask at the CLAMPED center: when the center
    # cell is laterally out of bounds the in-bounds footprint cells still
    # lie inside the clamped center's window — their bit slot just shifts
    # by the clamp offset (cells needing |shift| > r are provably outside
    # the grid and are masked by inb_a/inb_b below).
    ca_c = jnp.clip(ca, 0.0, a_size - 1.0)
    cb_c = jnp.clip(cb, 0.0, b_size - 1.0)
    sh_a = (ca - ca_c).astype(i32)
    sh_b = (cb - cb_c).astype(i32)
    fi = ((o_f * a_size + ca_c) * b_size + cb_c).astype(i32)
    npk = nb9.shape[0]
    mask = jnp.take(nb9, jnp.clip(fi, 0, npk - 1)).astype(i32)

    das = [float(i - ra) for i in range(ta)]
    dbs = [float(i - rb) for i in range(tb)]
    ts_in, ts_out = _axis_interval(ro_s, rd_s, k, k + 1.0)
    tia = [_axis_interval(ro_a, rd_a, ca + da, ca + da + 1.0) for da in das]
    tib = [_axis_interval(ro_b, rd_b, cb + db, cb + db + 1.0) for db in dbs]
    inb_a = [(ca + da >= 0) & (ca + da < a_size) for da in das]
    inb_b = [(cb + db >= 0) & (cb + db < b_size) for db in dbs]

    best_t = jnp.full(pa.shape, _BIG)
    best_ca = jnp.zeros(pa.shape, f32)
    best_cb = jnp.zeros(pa.shape, f32)
    for ia, da in enumerate(das):
        for ib, db in enumerate(dbs):
            sia = ia + sh_a
            sib = ib + sh_b
            slot_ok = ((sia >= 0) & (sia <= ta - 1)
                       & (sib >= 0) & (sib <= tb - 1))
            slot = jnp.clip(sia * tb + sib, 0, ta * tb - 1)
            bit = (mask >> slot) & 1
            tin = jnp.maximum(ts_in, jnp.maximum(tia[ia][0], tib[ib][0]))
            tout = jnp.minimum(ts_out, jnp.minimum(tia[ia][1], tib[ib][1]))
            valid = ((bit != 0) & slot_ok & inb_a[ia] & inb_b[ib]
                     & (tin <= tout) & (tout > 0.0))
            t_cell = jnp.where(valid, jnp.maximum(tin, 0.0), _BIG)
            better = t_cell < best_t
            best_t = jnp.where(better, t_cell, best_t)
            best_ca = jnp.where(better, ca + da, best_ca)
            best_cb = jnp.where(better, cb + db, best_cb)
    anyhit = best_t < _BIG
    return anyhit, best_t, k, best_ca, best_cb


def _consume_round(st, c_bits, ro3, rd3, nb9, s_valid: int,
                   a_size: int, b_size: int, flip: bool,
                   ta: int = 3, tb: int = 3):
    ptr, resolved = st["ptr"], st["resolved"]
    has, o_i = first_set_from(c_bits, ptr)
    act = ~resolved & has
    anyhit, t_min, k, wca, wcb = _slab_pass(
        o_i.astype(jnp.float32), ro3, rd3, nb9, s_valid, a_size,
        b_size, flip, ta, tb)
    newly = act & anyhit
    miss = act & ~anyhit
    exh = ~resolved & ~has
    return dict(
        ptr=jnp.where(miss, o_i + 1, ptr),
        resolved=resolved | newly | exh,
        hit=st["hit"] | newly,
        t=jnp.where(newly, t_min, st["t"]),
        ks=jnp.where(newly, k.astype(jnp.int32), st["ks"]),
        ca=jnp.where(newly, wca.astype(jnp.int32), st["ca"]),
        cb=jnp.where(newly, wcb.astype(jnp.int32), st["cb"]),
    )


def _consume_ladder(bits_src, texrow, ptr0, dead0, ro3, rd3, nb9,
                    s_valid: int, a_size: int, b_size: int, flip: bool,
                    widths, round_caps, const_origin: bool,
                    ta: int = 3, tb: int = 3, want_stage1: bool = False,
                    stage0_geom=None, stage0_gather_ptr: bool = False):
    """Run consume rounds on a gather-only compaction ladder.

    ``bits_src`` is the [T, C] per-TEXEL candidate bit field and
    ``texrow`` [N] maps rows to texels: full-width rows never materialize
    their C bit words (the [N, C] row gather + repacking cost ~20 ms at
    1080p); each compacted stage gathers ``bits_src[texrow_s]`` at ITS
    width instead, and the carry per row is just (ptr, texrow, rd[, ro])
    packed into one i32 matrix so each stage compacts with a single
    row-major gather (vector gathers are pathological on v5e —
    docs/ROADMAP.md). Requires ``round_caps[0] == 0`` (stage 0 has no
    bits to consume). ``ro3``/``rd3``: (s, a, b) component tuples of [N]
    arrays (narrow [N, 3] layouts tile at ~42x bytes). With
    ``const_origin`` the origin is not carried (primary rays: all origins
    equal; rebuilt by broadcast).

    Returns (state_full_width, rounds, overflow): survivors beyond a
    stage width stay behind unresolved (counted in overflow).

    ``want_stage1`` (requires >= 2 widths): return instead
    (state1, map1, rounds, overflow) with the COMPLETE result set still
    compacted at stage-1 width M1 = widths[1] — since stage 0 runs no
    rounds, every hit lives in stage 1's index space, so callers can run
    per-hit epilogues (leaf normals, shadow rays, shading) at M1 instead
    of full width and merge once at the very end via ``map1`` =
    dict(unres [N] stage-1 membership mask, rank [N] stage-1 row of each
    member, M, rd (3x[M1]), ro (3x[M1])). Rows dead at entry
    (seed-killed misses) never enter stage 1 and need no epilogue; rows
    beyond M1 are the already-counted overflow.
    """
    f32 = jnp.float32
    i32 = jnp.int32
    as_i32 = lambda x: jax.lax.bitcast_convert_type(x, i32)
    as_f32 = lambda x: jax.lax.bitcast_convert_type(x, f32)
    N = texrow.shape[0]
    assert round_caps[0] == 0, "stage 0 carries no bits; caps[0] must be 0"

    def run_stage(carry_rounds, width, cap, next_target, bits_s, ptr_s,
                  dead_s, ro3_s, rd3_s):
        st = _consume_state(width)
        st["ptr"] = ptr_s
        st["resolved"] = dead_s
        st["rounds_t"] = carry_rounds

        def cond(s):
            return ((s["rounds_t"] < cap)
                    & (jnp.sum(~s["resolved"]) > next_target))

        def body(s):
            s2 = _consume_round(
                dict(ptr=s["ptr"], resolved=s["resolved"], hit=s["hit"],
                     t=s["t"], ks=s["ks"], ca=s["ca"], cb=s["cb"]),
                bits_s, ro3_s, rd3_s, nb9, s_valid, a_size, b_size, flip,
                ta, tb)
            s2["rounds_t"] = s["rounds_t"] + 1
            return s2

        return jax.lax.while_loop(cond, body, st)

    rounds = jnp.zeros((), i32)
    overflow = jnp.zeros((), i32)
    caps = list(round_caps)
    tgts = [w for w in widths[1:]] + [0]

    # stage 0: no rounds (no bits at full width); state passthrough
    g = _consume_state(N)
    g["ptr"] = ptr0
    g["resolved"] = dead0

    prev = dict(resolved=g["resolved"], ptr=g["ptr"], texrow=texrow,
                ro=ro3, rd=rd3, width=N)
    entries = []
    for si, M in enumerate(widths[1:]):
        unres = ~prev["resolved"]
        n_unres = jnp.sum(unres)
        overflow = overflow + jnp.maximum(n_unres - M, 0)
        rank = jnp.cumsum(unres.astype(i32)) - 1
        # stable-sort compaction: live rows first in original order
        # (measured 5.7 ms vs 13.4 for the iota-scatter form at 2.09M
        # rows). Slots past n_unres hold arbitrary dead rows — exactly
        # the region row_valid masks off below. When the width fits 27
        # bits the live flag and the index fuse into ONE u32 key (a
        # single-operand sort moves half the bytes of key+payload).
        pw = prev["width"]
        if pw <= (1 << 27):
            fused = jnp.where(unres, 0, 1 << 27) | jnp.arange(pw, dtype=i32)
            idxs = jax.lax.sort(fused) & ((1 << 27) - 1)
        else:
            _, idxs = jax.lax.sort(
                (jnp.where(unres, 0, 1).astype(i32),
                 jnp.arange(pw, dtype=i32)),
                num_keys=1, is_stable=True)
        idxs = idxs[:M] if M <= prev["width"] else jnp.pad(
            idxs, (0, M - prev["width"]))
        if si == 0 and stage0_geom is not None:
            # stage-0 rows carry NOTHING: every per-row quantity is a
            # closed form of the pixel index (primary rays), recomputed
            # at stage-1 width instead of packed/gathered at full width
            # (the [N, 5] concat + row gather cost ~5 ms at 1080p)
            ro3_s, rd3_s, texrow_s = stage0_geom(idxs)
            # primary rays start at ptr 0 (no gather); callers whose rows
            # carry a data-dependent start slab (the fast-exact fallback:
            # ptr = cube end) opt into one M-wide column gather instead
            ptr_s = (prev["ptr"][idxs] if stage0_gather_ptr
                     else jnp.zeros(M, i32))
            bits_s = bits_src[texrow_s]
        else:
            cols = [prev["ptr"][:, None], prev["texrow"][:, None]]
            cols += [as_i32(prev["rd"][j])[:, None] for j in range(3)]
            if not const_origin:
                cols += [as_i32(prev["ro"][j])[:, None] for j in range(3)]
            packed = jnp.concatenate(cols, axis=1)
            rows = packed[idxs]
            ptr_s, texrow_s = rows[:, 0], rows[:, 1]
            bits_s = bits_src[texrow_s]
            rd3_s = tuple(as_f32(rows[:, 2 + j]) for j in range(3))
            if const_origin:
                ro3_s = tuple(jnp.broadcast_to(ro3[j][:1], (M,))
                              for j in range(3))
            else:
                ro3_s = tuple(as_f32(rows[:, 5 + j]) for j in range(3))
        row_valid = jnp.arange(M) < jnp.minimum(n_unres, M)
        st_l = run_stage(rounds, M, caps[si + 1],
                         tgts[si + 1] if si + 1 < len(tgts) else 0,
                         bits_s, ptr_s, ~row_valid, ro3_s, rd3_s)
        rounds = st_l.pop("rounds_t")
        entries.append(dict(unres=unres, rank=rank, M=M, st=st_l,
                            rd=rd3_s, ro=ro3_s, pix=idxs,
                            row_valid=row_valid))
        prev = dict(resolved=st_l["resolved"], ptr=st_l["ptr"],
                    texrow=texrow_s, ro=ro3_s, rd=rd3_s, width=M)

    def merge_back(dst, unres_in, rank_in, src, m_src):
        take = unres_in & (rank_in < m_src)
        packed = jnp.concatenate(
            [src["hit"].astype(i32)[:, None], as_i32(src["t"])[:, None],
             src["ks"][:, None], src["ca"][:, None], src["cb"][:, None],
             src["ptr"][:, None], src["resolved"].astype(i32)[:, None]],
            axis=1)
        rows = packed[jnp.clip(jnp.where(take, rank_in, 0), 0, m_src - 1)]
        s_hit = take & (rows[:, 0] != 0)
        out = dict(dst)
        out["hit"] = dst["hit"] | s_hit
        out["t"] = jnp.where(s_hit, as_f32(rows[:, 1]), dst["t"])
        out["ks"] = jnp.where(s_hit, rows[:, 2], dst["ks"])
        out["ca"] = jnp.where(s_hit, rows[:, 3], dst["ca"])
        out["cb"] = jnp.where(s_hit, rows[:, 4], dst["cb"])
        out["ptr"] = jnp.where(take, rows[:, 5], dst["ptr"])
        out["resolved"] = jnp.where(take, rows[:, 6] != 0, dst["resolved"])
        return out

    if want_stage1:
        assert entries and caps[0] == 0, \
            "stage-1 epilogue needs caps[0] == 0 and a compacted stage"
        merged = entries[-1]["st"]
        for i in range(len(entries) - 2, -1, -1):
            merged = merge_back(entries[i]["st"], entries[i + 1]["unres"],
                                entries[i + 1]["rank"], merged,
                                entries[i + 1]["M"])
        map1 = dict(unres=entries[0]["unres"], rank=entries[0]["rank"],
                    M=entries[0]["M"], rd=entries[0]["rd"],
                    ro=entries[0]["ro"], pix=entries[0]["pix"],
                    row_valid=entries[0]["row_valid"])
        return merged, map1, rounds, overflow
    if entries:
        merged = entries[-1]["st"]
        for i in range(len(entries) - 2, -1, -1):
            merged = merge_back(entries[i]["st"], entries[i + 1]["unres"],
                                entries[i + 1]["rank"], merged,
                                entries[i + 1]["M"])
        g = merge_back(g, entries[0]["unres"], entries[0]["rank"], merged,
                       entries[0]["M"])
    return g, rounds, overflow


# --------------------------------------------------------------------------
# Scene-level preparation (host)
# --------------------------------------------------------------------------

# Caches keyed by id() with the entry pinning the source volume alive and
# hits requiring `src is volume` (the _LAYOUT_CACHE discipline from
# trace/slab_sweep.py — a GC'd id can never serve a stale entry).
_NB9_CACHE: dict = {}
_SHADOW_FIELD_CACHE: dict = {}


def _nb9_for(volume, axis_world: int, flip: bool, S: int, A: int, B: int,
             ta: int = 3, tb: int = 3):
    key = (id(volume), axis_world, flip, S, ta, tb)
    ent = _NB9_CACHE.get(key)
    if ent is not None and ent[0] is volume:
        return ent[1]
    occ_sw = _layout_volume(volume, axis_world, flip, S, A, B)
    nb9 = jax.block_until_ready(_pack_neighborhood(occ_sw, ta, tb))
    if len(_NB9_CACHE) > 8:
        _NB9_CACHE.clear()
    _NB9_CACHE[key] = (volume, nb9)
    return nb9


def _pick_taps(ext_a: float, ext_b: float):
    """Smallest (ta, tb) tap window covering the per-axis footprint
    extents, or None: (3,3) while both fit in +-1; one axis may widen to
    5 taps (+-2) — both may not (the weight products must stay within
    f32's 24-bit exact-integer range, ta*tb <= 15)."""
    need = lambda e: 3 if e <= 0.999 else (5 if e <= 1.999 else None)
    na, nb_ = need(ext_a), need(ext_b)
    if na is None or nb_ is None or na * nb_ > 15:
        return None
    return na, nb_


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["bits", "nb9", "l_sab"],
    meta_fields=["axis_l", "flip_l", "S", "A", "B", "sp", "aa_min",
                 "aa_span", "ab_min", "ab_span", "inter_h", "inter_w",
                 "sa", "sb", "ta", "tb"],
)
@dataclasses.dataclass(frozen=True)
class ShadowField:
    """Camera-independent exact shadow-ray field for one (scene, light).

    ``bits[tex, word]``: per-slab candidate bit field of the light-space
    texel lattice (orthographic sweep along the light's dominant axis);
    ``nb9``: packed 3x3 neighborhood occupancy in the same layout;
    ``l_sab``: the shared ray direction (-light) in light-sweep (s, a, b)
    components, world-length parametrization (voxel coords / voxel_size).
    """

    bits: jax.Array
    nb9: jax.Array
    l_sab: jax.Array
    axis_l: int
    flip_l: bool
    S: int
    A: int
    B: int
    sp: int
    aa_min: float
    aa_span: float
    ab_min: float
    ab_span: float
    inter_h: int
    inter_w: int
    sa: float
    sb: float
    ta: int = 3
    tb: int = 3


def build_shadow_field(volume, light_dir, voxel_size,
                       max_inter: int = 1024) -> Optional[ShadowField]:
    """Precompute the exact shadow-ray detection field (once per scene).

    Returns None when the light's lateral slope leaves no room for the
    lattice pad (|slope|/2 + pad > 1 on either axis) — callers fall back
    to the gather-DDA shadow trace.
    """
    l = np.asarray(light_dir, np.float64)
    l = l / np.linalg.norm(l)
    d_world = -l                                     # ray direction
    axis_l = int(np.argmax(np.abs(d_world)))
    sel = _AXIS_SELECTORS[axis_l]
    rd = np.array([d_world @ np.asarray(s, np.float64) for s in sel])
    rd = rd / float(voxel_size)                      # world-t parametrization
    flip_l = bool(rd[0] < 0)
    dz, dy, dx = np.asarray(volume).shape[:3] if hasattr(volume, "shape") \
        else volume.shape[:3]
    S, A, B = {0: (dx, dy, dz), 1: (dy, dx, dz), 2: (dz, dx, dy)}[axis_l]
    sa = float(rd[1] / rd[0])
    sb = float(rd[2] / rd[0])

    # intercept bounds over any origin within the grid + 4-voxel margin
    m = 4.0
    aa_lo = -m - max(sa * -m, sa * (S + m))
    aa_hi = (A + m) - min(sa * -m, sa * (S + m))
    ab_lo = -m - max(sb * -m, sb * (S + m))
    ab_hi = (B + m) - min(sb * -m, sb * (S + m))
    aa_span = aa_hi - aa_lo
    ab_span = ab_hi - ab_lo

    def dim(span):
        import math
        t = int(math.ceil(6.0 * max(span, 1.0) / 128.0)) * 128
        return max(128, min(max_inter, t))

    IHs, IWs = dim(aa_span), dim(ab_span)
    ha = 0.5 * aa_span / IHs
    hb = 0.5 * ab_span / IWs
    taps = _pick_taps(abs(sa) * 0.5 + ha, abs(sb) * 0.5 + hb)
    if taps is None:
        return None
    ta, tb = taps

    cache_key = (id(volume), axis_l, flip_l, round(sa, 9), round(sb, 9),
                 IHs, IWs, ta, tb)
    ent = _SHADOW_FIELD_CACHE.get(cache_key)
    if ent is not None and ent[0] is volume:
        return ent[1]

    occ_sw = _layout_volume(volume, axis_l, flip_l, S, A, B)
    sp = occ_sw.shape[0]
    hats = _ortho_hats(sa, sb, aa_lo, aa_span, ab_lo, ab_span, sp, S,
                       A, B, IHs, IWs, flip_l, ta, tb)
    bits = jax.block_until_ready(_sweep_candidates(
        (occ_sw > 0).astype(jnp.bfloat16), hats, sp // 32, S, A, B,
        IHs, IWs, flip_l, exact_acc=(ta > 3 or tb > 3)))
    nb9 = _nb9_for(volume, axis_l, flip_l, S, A, B, ta, tb)
    fld = ShadowField(
        bits=bits, nb9=nb9, l_sab=jnp.asarray(rd, jnp.float32),
        axis_l=axis_l, flip_l=flip_l, S=S, A=A, B=B, sp=sp,
        aa_min=float(aa_lo), aa_span=float(aa_span),
        ab_min=float(ab_lo), ab_span=float(ab_span),
        inter_h=IHs, inter_w=IWs, sa=sa, sb=sb, ta=ta, tb=tb,
    )
    if len(_SHADOW_FIELD_CACHE) > 4:
        _SHADOW_FIELD_CACHE.clear()
    _SHADOW_FIELD_CACHE[cache_key] = (volume, fld)
    return fld


def sweep_exact_setup(volume, grid_origin, voxel_size, camera_pos, view,
                      max_inter: int = 1024, density: float = 6.0):
    """Host-side gate + configuration for the sweep-exact PRIMARY trace.

    Returns (ok, cfg): ok=False when the pose leaves the exactness
    envelope (interior eye, or footprint+pad exceeding the 3-tap
    window); cfg carries everything the jitted frame needs.

    ``density``: lattice texels per voxel. Exactness is lattice-
    independent (the superset invariant only widens candidate sets —
    tests/test_sweep_exact.py::test_coarse_lattice_stays_exact); density
    trades detection-sweep cost against consume-round count. The
    fast-exact frame runs at ~3.5 (its cube absorbs the wider
    footprints); this tracer's ladder was tuned at 6.
    """
    axis_world, flip, (S, A, B), eyes, window, crop_lo = _sweep_geometry(
        volume, grid_origin, voxel_size, camera_pos, view)
    if crop_lo != 0:
        return False, None                          # interior eye
    eye_s, eye_a, eye_b, z0 = eyes
    a_min, a_max, b_min, b_max = window
    # A ray can hit a boundary cell with its slab-CENTER position (and so
    # its reference-plane coordinate) up to one footprint half-width
    # outside [0, ext]: ua extends the slab_sweep window by at most
    # half * s_scale <= 1 per side (s_scale <= 1 because z0 sits at the
    # slab nearest the eye). Widen the lattice window accordingly so the
    # in-window dead test and the clamped texel lookup stay supersets.
    a_min, a_max = a_min - 1.0, a_max + 1.0
    b_min, b_max = b_min - 1.0, b_max + 1.0
    window = (a_min, a_max, b_min, b_max)
    IH, IW = _auto_inter(window, max_inter, density)
    dz = abs(z0 - eye_s)
    # max |1/s_scale| over slabs (inv_s is monotone in k; check ends)
    inv_ends = [abs((k + 0.5 - eye_s) / (z0 - eye_s)) for k in (0, S - 1)]
    inv_max = max(inv_ends)
    ha = 0.5 * (a_max - a_min) / IH
    hb = 0.5 * (b_max - b_min) / IW
    half_a_max = 0.5 * max(abs(a_min - eye_a), abs(a_max - eye_a)) / dz
    half_b_max = 0.5 * max(abs(b_min - eye_b), abs(b_max - eye_b)) / dz
    wa = ha * (inv_max + 0.5 / dz)
    wb = hb * (inv_max + 0.5 / dz)
    taps = _pick_taps(half_a_max + wa, half_b_max + wb)
    if taps is None:
        return False, None
    ta, tb = taps
    occ_sw = _layout_volume(volume, axis_world, flip, S, A, B)
    nb9 = _nb9_for(volume, axis_world, flip, S, A, B, ta, tb)
    scal_np = _frame_scalars_np(
        eye_s, eye_a, eye_b, z0, a_min, a_max, b_min, b_max,
        0.0, 0.0, float(voxel_size), S,
        np.asarray(grid_origin, np.float32),
        np.asarray(camera_pos, np.float32), view)
    cfg = dict(axis_world=axis_world, flip=bool(flip), S=S, A=A, B=B,
               occ_sw=occ_sw, nb9=nb9, scal_np=scal_np, IH=IH, IW=IW,
               ta=ta, tb=tb)
    return True, cfg


# --------------------------------------------------------------------------
# Jitted frame programs
# --------------------------------------------------------------------------


def _primary_ladder(n: int, sp: int):
    """Stage widths/caps tuned to the MEASURED survivor decay on Calgary
    (tools probe, round-3): live after the seed kill 27.6% of N, then
    8.4% -> 1.9% -> 0.5% per consume round. With sort-compaction cheap
    (~2 ms at 0.36N), every early stage runs exactly ONE round and
    compacts — round 2 at 0.10n instead of 0.36n saves its nb9 gather
    and VPU width. Caps are cumulative; every ladder ends at cap >= sp
    so exactness never depends on the schedule (overflow is counted,
    not dropped)."""
    widths = (n, max(2048, int(n * 0.36)), max(1024, int(n * 0.10)),
              max(1024, int(n * 0.03)), max(512, n // 112))
    caps = (0, 1, 2, 4, 4 + sp)
    return widths, caps


def _shadow_ladder(n: int, sp: int):
    """Shadow survivor decay (same probe): live 24% of N, then 3% ->
    0.37% -> 0.04% — faster than primary (the shallow city light exits
    the volume quickly), so stages shrink harder."""
    widths = (n, max(2048, int(n * 0.30)), max(1024, int(n * 0.035)),
              max(512, n // 200))
    caps = (0, 1, 3, 3 + sp)
    return widths, caps


def _rays_sab_from_xy(xf, yf, scal, axis_world: int, width: int,
                      height: int):
    """Ray directions as (s, a, b) COMPONENT arrays for pixel coords
    (xf, yf) [f32 arrays].

    Reproduces render/camera.py::generate_rays' math op-for-op
    (normalize in view space, rotate, normalize in world space) without
    ever materializing an [N, 3] array — the narrow-minor-dim layout
    tiles at T(8,128) = ~42x its bytes. Shared by the full-frame path
    and the stage-0 compaction callback (same ops => bit-identical rays
    for the same pixel). The sweep components are a PERMUTATION of the
    world components (axis selectors are unit basis vectors), picked by
    index instead of dot products.
    """
    import math as _math

    f32 = jnp.float32
    fov = scal[8] * f32(_math.pi / 180.0)
    tan_half = jnp.tan(fov * 0.5)
    aspect = scal[9]
    view = scal[18:34].reshape(4, 4)
    R = jnp.linalg.inv(view)[:3, :3]
    nxf = ((xf + 0.5) / width * 2.0 - 1.0) * aspect * tan_half
    nyf = (1.0 - (yf + 0.5) / height * 2.0) * tan_half
    inv1 = 1.0 / jnp.sqrt(nxf * nxf + nyf * nyf + 1.0)
    dv = (nxf * inv1, nyf * inv1, -inv1)
    dw = [dv[0] * R[c, 0] + dv[1] * R[c, 1] + dv[2] * R[c, 2]
          for c in range(3)]
    inv2 = 1.0 / jnp.sqrt(dw[0] * dw[0] + dw[1] * dw[1] + dw[2] * dw[2])
    dw = [c * inv2 for c in dw]
    perm = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}[axis_world]
    return tuple(dw[perm[i]] for i in range(3))


def _pixel_rays_sab(scal, axis_world: int, width: int, height: int):
    """Full-frame (s, a, b) ray components [N] (row-major from top)."""
    f32 = jnp.float32
    xg, yg = jnp.meshgrid(jnp.arange(width, dtype=f32),
                          jnp.arange(height, dtype=f32), indexing="xy")
    return _rays_sab_from_xy(xg.reshape(-1), yg.reshape(-1), scal,
                             axis_world, width, height)


def _primary_core(occ_sw, nb9, scal, axis_world: int, flip: bool,
                  S: int, A: int, B: int, IH: int, IW: int,
                  width: int, height: int, ta: int = 3, tb: int = 3,
                  stage1: bool = False, warp_cfg=None, ladder=None):
    """Shared jit body: detection sweep + per-pixel exact consume.

    Returns (res dict, None, None). res: hit, t (world), ks/ca/cb
    (hit voxel in sweep coords), rounds, overflow, unresolved.

    The per-pixel dead test (texel has no candidate slab at all) rides
    the Pallas one-hot warp of the texel any-flag table instead of a
    full-width [N, C] bits row gather + any-reduce (10.5 ms at 1080p);
    stages gather their bit rows from the texel field at THEIR width.

    With ``stage1``, the result set stays compacted at stage-1 width
    (every hit lives there because stage 0 runs no rounds): res gains
    ``map1`` (see _consume_ladder) and ``dirs1``/``origins1`` (world
    rays per stage-1 row, reconstructed exactly from the carried sweep
    components — the axis selectors are a permutation), and hit/t/ks/
    ca/cb are [M1] instead of [N]. The full-width per-pixel epilogue
    (leaf normal + shade + shadow, all hit-only work) then runs at M1.
    """
    f32 = jnp.float32
    i32 = jnp.int32
    N = width * height
    sp = occ_sw.shape[0]
    eye_s, eye_a, eye_b, z0 = scal[0], scal[1], scal[2], scal[3]
    a_min, a_max, b_min, b_max = scal[4], scal[5], scal[6], scal[7]
    vs = scal[10]

    hats = _widened_perspective_hats(scal, sp, S, A, B, IH, IW, flip,
                                     ta, tb)
    bits_tex = _sweep_candidates(
        (occ_sw > 0).astype(jnp.bfloat16), hats, sp // 32, S, A, B,
        IH, IW, flip, exact_acc=(ta > 3 or tb > 3))

    rd3 = tuple(c / vs for c in _pixel_rays_sab(scal, axis_world,
                                                width, height))
    ro3 = (jnp.broadcast_to(eye_s, (N,)), jnp.broadcast_to(eye_a, (N,)),
           jnp.broadcast_to(eye_b, (N,)))
    rd_s = rd3[0]
    forward = (rd_s < 0) if flip else (rd_s > 0)
    safe = jnp.where(jnp.abs(rd_s) < _DEG, 1.0, rd_s)
    ua = eye_a + (z0 - eye_s) * rd3[1] / safe
    ub = eye_b + (z0 - eye_s) * rd3[2] / safe
    in_win = (ua >= a_min) & (ua <= a_max) & (ub >= b_min) & (ub <= b_max)
    ti = jnp.clip(jnp.floor((ua - a_min) / (a_max - a_min) * IH
                            ).astype(i32), 0, IH - 1)
    tj = jnp.clip(jnp.floor((ub - b_min) / (b_max - b_min) * IW
                            ).astype(i32), 0, IW - 1)
    texrow = ti * IW + tj

    # dead test by Pallas warp of the texel any-flag (the kernel's lin
    # decode is a fixed iu = lin >> 10, iv = lin & 1023 — valid for any
    # IW <= 1024); without a planned config (non-TPU backends,
    # pathological cameras) fall back to the full-width row gather + any
    geo_dead = ~forward | ~in_win
    if warp_cfg is not None:
        from ray_tracing_octrees_tpu.trace.warp_kernel import warp_lookup

        ty, tx, win = warp_cfg
        any_t = jnp.where((bits_tex != 0).any(axis=1), 1.0, -1.0
                          ).astype(jnp.bfloat16).reshape(IH, IW)
        lin2 = jnp.where(geo_dead, -1, (ti << 10) | tj
                         ).reshape(height, width)
        ph, pw = (-height) % ty, (-width) % tx
        if ph or pw:
            lin2 = jnp.pad(lin2, ((0, ph), (0, pw)), constant_values=-1)
        any_pix = warp_lookup(any_t, lin2, ty, tx, win, n_planes=1
                              )[:height, :width].reshape(-1)
        dead0 = geo_dead | (any_pix < 0.0)
    else:
        dead0 = geo_dead | ~(bits_tex[texrow] != 0).any(axis=1)

    def stage0_geom(idxs):
        # all stage-1 row data recomputed from pixel indices (identical
        # ops to the full-width forms above => bit-identical rays)
        xf = (idxs % width).astype(f32)
        yf = (idxs // width).astype(f32)
        rd3_s = tuple(c / vs for c in _rays_sab_from_xy(
            xf, yf, scal, axis_world, width, height))
        rs = rd3_s[0]
        sf_ = jnp.where(jnp.abs(rs) < _DEG, 1.0, rs)
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

    widths, caps = ladder if ladder is not None else _primary_ladder(N, sp)
    if stage1:
        g1, map1, rounds, overflow = _consume_ladder(
            bits_tex, texrow, jnp.zeros(N, i32), dead0, ro3, rd3, nb9,
            S, A, B, flip, widths, caps, const_origin=True, ta=ta, tb=tb,
            want_stage1=True, stage0_geom=stage0_geom)
        perm = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}[axis_world]
        inv_perm = [perm.index(c) for c in range(3)]
        # component tuples (exact: the selector is a permutation + scale)
        dirs1 = tuple(map1["rd"][inv_perm[c]] * vs for c in range(3))
        origins1 = tuple(jnp.broadcast_to(scal[15 + c], (map1["M"],))
                         for c in range(3))
        res = dict(hit=g1["hit"], t=g1["t"], ks=g1["ks"], ca=g1["ca"],
                   cb=g1["cb"], rounds=rounds, overflow=overflow,
                   unresolved=(jnp.sum(~g1["resolved"] & ~g1["hit"])
                               + overflow),
                   map1=map1, dirs1=dirs1, origins1=origins1)
        return res, None, None
    g, rounds, overflow = _consume_ladder(
        bits_tex, texrow, jnp.zeros(N, i32), dead0, ro3, rd3, nb9,
        S, A, B, flip, widths, caps, const_origin=True, ta=ta, tb=tb,
        stage0_geom=stage0_geom)
    res = dict(hit=g["hit"], t=g["t"], ks=g["ks"], ca=g["ca"], cb=g["cb"],
               rounds=rounds, overflow=overflow,
               unresolved=jnp.sum(~g["resolved"] & ~g["hit"]))
    return res, None, None


def _leaf_normal(res, origins, dirs, leaf_flat, leaf_S: int,
                 axis_world: int, grid_origin, vs):
    """Leaf-node normal at the hit voxel (normalize(p - nodeCenter),
    RayTracerBVH.cpp:283-287) via one leaf-volume byte gather.

    Component-wise throughout — [M, 3] narrow layouts tile at ~42x their
    bytes; returns (point3, nrm3) as xyz tuples of [M] arrays."""
    f32 = jnp.float32
    i32 = jnp.int32
    perm = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}[axis_world]
    inv_perm = [perm.index(c) for c in range(3)]
    sab = (res["ks"], res["ca"], res["cb"])
    v3 = [sab[inv_perm[c]] for c in range(3)]        # voxel xyz
    idx = (v3[2] * leaf_S + v3[1]) * leaf_S + v3[0]
    byte = jnp.take(leaf_flat, jnp.clip(idx, 0, leaf_flat.shape[0] - 1)
                    ).astype(i32)
    level = (byte >> 1) & 15
    csize = (jnp.int32(1) << level).astype(f32)
    point3, nrm3, n2 = [], [], 0.0
    for c in range(3):
        p_c = origins[c] + dirs[c] * res["t"]
        cmin = ((v3[c] >> level) << level).astype(f32)
        cen = grid_origin[c] + (cmin + 0.5 * csize) * vs
        n_c = p_c - cen
        point3.append(p_c)
        nrm3.append(n_c)
        n2 = n2 + n_c * n_c
    inv = 1.0 / jnp.maximum(jnp.sqrt(n2), 1e-30)
    nrm3 = [jnp.where(res["hit"], n_c * inv, 0.0) for n_c in nrm3]
    return point3, nrm3


def _merge1_to_n(map1, cols, defaults):
    """Scatter stage-1 per-row results back to full width with ONE packed
    row gather. ``cols``: list of [M1] arrays (f32/i32/bool); ``defaults``:
    per-column full-width default arrays (or scalars). Returns the
    full-width columns, dtypes preserved."""
    f32 = jnp.float32
    i32 = jnp.int32
    as_i32 = lambda x: jax.lax.bitcast_convert_type(x, i32)
    as_f32 = lambda x: jax.lax.bitcast_convert_type(x, f32)
    take = map1["unres"] & (map1["rank"] < map1["M"])
    packed = jnp.concatenate(
        [(as_i32(c) if c.dtype == f32 else c.astype(i32))[:, None]
         for c in cols], axis=1)
    rows = packed[jnp.clip(jnp.where(take, map1["rank"], 0),
                           0, map1["M"] - 1)]
    out = []
    for j, (c, d) in enumerate(zip(cols, defaults)):
        v = rows[:, j]
        if c.dtype == f32:
            v = as_f32(v)
        elif c.dtype == jnp.bool_:
            v = v != 0
        out.append(jnp.where(take, v, d))
    return out


def _shadow_ladder_stage1(m: int, sp: int):
    """Shadow ladder when origins are ALREADY compacted at stage-1 width
    m: compact immediately onto the live (primary-hit) rows — ~2/3 of m —
    run the first round there, then shrink on the measured decay
    (15.5k / 1.9k of 518k pixels after rounds 1/2)."""
    widths = (m, max(1024, int(m * 0.75)), max(1024, int(m * 0.12)),
              max(512, m // 64))
    caps = (0, 1, 3, 3 + sp)
    return widths, caps


def _shadow_occluded(sf_bits, sf_nb9, sf_lsab, o_vox3, s_live,
                     meta, ladder=None):
    """Exact occlusion of shadow rays (shared dir) via the precomputed
    light-space field. ``o_vox3``: origin components in VOXEL xyz."""
    (axis_l, flip_l, S_l, A_l, B_l, sp_l, aa_min, aa_span, ab_min,
     ab_span, IHs, IWs, sa, sb, ta_l, tb_l) = meta
    f32 = jnp.float32
    i32 = jnp.int32
    N = o_vox3[0].shape[0]
    perm = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}[axis_l]
    ro3 = tuple(o_vox3[perm[i]] for i in range(3))
    rd3 = tuple(jnp.broadcast_to(sf_lsab[i], (N,)) for i in range(3))
    aa = ro3[1] - f32(sa) * ro3[0]
    ab = ro3[2] - f32(sb) * ro3[0]
    ti = jnp.clip(jnp.floor((aa - aa_min) / aa_span * IHs).astype(i32),
                  0, IHs - 1)
    tj = jnp.clip(jnp.floor((ab - ab_min) / ab_span * IWs).astype(i32),
                  0, IWs - 1)
    texrow = ti * IWs + tj
    k0 = jnp.floor(ro3[0]).astype(i32)
    o0 = (S_l - 1 - k0) if flip_l else k0
    # no any-candidate pre-test: on the shallow city light nearly every
    # live shadow ray has candidates (the round-3 prune measured zero
    # kills), and any per-row flag fetch at full width costs more than
    # letting the first in-ladder round resolve empties via first_set
    dead0 = ~s_live | (o0 >= S_l)
    ptr0 = jnp.maximum(o0, 0)
    widths, caps = ladder if ladder is not None else _shadow_ladder(N, sp_l)
    g, rounds, overflow = _consume_ladder(
        sf_bits, texrow, ptr0, dead0, ro3, rd3, sf_nb9, S_l, A_l, B_l,
        flip_l, widths, caps, const_origin=False, ta=ta_l, tb=tb_l)
    return (g["hit"] & s_live, rounds, overflow,
            jnp.sum(~g["resolved"] & ~g["hit"] & s_live))


@functools.partial(
    jax.jit,
    static_argnames=("axis_world", "flip", "S", "A", "B", "IH", "IW",
                     "width", "height", "leaf_S", "ta", "tb", "warp_cfg"))
def _trace_pixels_jit(occ_sw, nb9, leaf_flat, scal, axis_world, flip,
                      S, A, B, IH, IW, width, height, leaf_S,
                      ta=3, tb=3, warp_cfg=None):
    res, _, _ = _primary_core(
        occ_sw, nb9, scal, axis_world, flip, S, A, B, IH, IW,
        width, height, ta, tb, stage1=True, warp_cfg=warp_cfg)
    t1 = jnp.where(res["hit"], res["t"], 0.0)
    o1 = res["origins1"]
    d1 = res["dirs1"]
    point3, nrm3 = _leaf_normal(
        dict(hit=res["hit"], t=t1, ks=res["ks"], ca=res["ca"],
             cb=res["cb"]),
        o1, d1, leaf_flat, leaf_S,
        axis_world, tuple(scal[12 + c] for c in range(3)), scal[10])
    N = width * height
    f32 = jnp.float32
    zero = jnp.zeros(N, f32)
    merged = _merge1_to_n(
        res["map1"],
        [res["hit"], t1, point3[0], point3[1], point3[2],
         nrm3[0], nrm3[1], nrm3[2]],
        [jnp.zeros(N, jnp.bool_), zero,
         jnp.broadcast_to(scal[15], (N,)),
         jnp.broadcast_to(scal[16], (N,)),
         jnp.broadcast_to(scal[17], (N,)),
         zero, zero, zero])
    hit, t = merged[0], merged[1]
    point = jnp.stack(merged[2:5], axis=1)
    nrm = jnp.stack(merged[5:8], axis=1)
    return dict(hit=hit, t=t, point=point, normal=nrm,
                rounds=res["rounds"], overflow=res["overflow"],
                unresolved=res["unresolved"])


@functools.partial(
    jax.jit,
    static_argnames=("axis_world", "flip", "S", "A", "B", "IH", "IW",
                     "width", "height", "leaf_S", "shadows", "sf_meta",
                     "ta", "tb", "warp_cfg"))
def _exact_frame_jit(occ_sw, nb9, leaf_flat, scal, sf_bits, sf_nb9,
                     sf_lsab, axis_world, flip, S, A, B, IH, IW,
                     width, height, leaf_S, shadows, sf_meta,
                     ta=3, tb=3, warp_cfg=None):
    f32 = jnp.float32
    res, _, _ = _primary_core(
        occ_sw, nb9, scal, axis_world, flip, S, A, B, IH, IW,
        width, height, ta, tb, stage1=True, warp_cfg=warp_cfg)
    org3 = tuple(scal[12 + c] for c in range(3))
    vs = scal[10]
    # Whole per-hit epilogue (leaf normal, Lambert shade, shadow trace)
    # at stage-1 width, component-wise ([M, 3] layouts tile at ~42x).
    t1 = jnp.where(res["hit"], res["t"], 0.0)
    point3, nrm3 = _leaf_normal(
        dict(hit=res["hit"], t=t1, ks=res["ks"], ca=res["ca"],
             cb=res["cb"]),
        res["origins1"], res["dirs1"], leaf_flat, leaf_S,
        axis_world, org3, vs)
    hit1 = res["hit"]

    # shade() (RayTracerBVH.cpp:331-336), matching
    # models/octree_raytracer.py::lambert_shade bit for bit
    light_dir = scal[34:37]
    l = light_dir / jnp.linalg.norm(light_dir)
    ndotl = jnp.maximum(
        0.0, -(nrm3[0] * l[0] + nrm3[1] * l[1] + nrm3[2] * l[2]))
    color3 = [jnp.where(hit1, scal[37 + c] * ndotl + scal[40 + c], 0.0)
              for c in range(3)]

    stats = dict(rounds=res["rounds"], overflow=res["overflow"],
                 unresolved=res["unresolved"],
                 s_rounds=jnp.zeros((), jnp.int32),
                 s_overflow=jnp.zeros((), jnp.int32),
                 s_unresolved=jnp.zeros((), jnp.int32))
    if shadows:
        o_vox3 = tuple(
            (point3[c] + nrm3[c] * (vs * 2.0) - org3[c]) / vs
            for c in range(3))
        occluded, s_rounds, s_over, s_unres = _shadow_occluded(
            sf_bits, sf_nb9, sf_lsab, o_vox3, hit1, sf_meta,
            ladder=_shadow_ladder_stage1(int(res["map1"]["M"]),
                                         sf_meta[5]))
        color3 = [jnp.where(occluded, scal[40 + c], color3[c])
                  for c in range(3)]
        stats.update(s_rounds=s_rounds, s_overflow=s_over,
                     s_unresolved=s_unres)
    N = width * height
    # full-width output via the rank-gather merge. (A row-scatter of
    # stage-1 colors at their pixel ids was measured 25 ms SLOWER at
    # 1080p: the [N, 3] scatter canvas tiles at T(8,128) = 42x its
    # bytes, so the scatter writes ~1 GB of tiles.)
    zero = jnp.zeros(N, f32)
    cr, cg, cb_ = _merge1_to_n(
        res["map1"], [color3[0], color3[1], color3[2]],
        [zero, zero, zero])
    color = jnp.stack([cr, cg, cb_], axis=1)
    alpha = jnp.ones((N, 1), f32)
    img = jnp.concatenate([color, alpha], axis=-1)
    return img.reshape(height, width, 4), stats


# --------------------------------------------------------------------------
# Public API
# --------------------------------------------------------------------------


def _plan_dead_warp(cfg, scal_np, width: int, height: int):
    """Host-side Pallas config for the dead-test warp (None = fallback
    row-gather path: non-TPU backend, odd table widths, or a pathological
    camera per plan_warp's window bound)."""
    if jax.default_backend() != "tpu":
        return None
    if cfg["IW"] > 1024 or cfg["IW"] % 128:
        return None
    from ray_tracing_octrees_tpu.trace.warp_kernel import plan_warp

    return plan_warp(scal_np, _AXIS_SELECTORS, cfg["axis_world"],
                     cfg["IH"], cfg["IW"], width, height)


def trace_pixels_sweep_exact(volume, leaf_vol, grid_origin, voxel_size,
                             cam_pos, view, width: int, height: int,
                             fov_deg: float, aspect: float):
    """Exact per-pixel primary trace (trace_octree semantics) via the
    sweep. Returns (dict | None): None when the pose is outside the
    exactness envelope (caller falls back to the gather tracer)."""
    ok, cfg = sweep_exact_setup(volume, grid_origin, voxel_size,
                                cam_pos, view)
    if not ok:
        return None
    scal = cfg["scal_np"].copy()
    scal[8], scal[9] = fov_deg, aspect
    leaf_flat = jnp.asarray(leaf_vol).reshape(-1)
    return _trace_pixels_jit(
        cfg["occ_sw"], cfg["nb9"], leaf_flat, jnp.asarray(scal),
        cfg["axis_world"], cfg["flip"], cfg["S"], cfg["A"], cfg["B"],
        cfg["IH"], cfg["IW"], width, height, int(leaf_vol.shape[0]),
        ta=cfg["ta"], tb=cfg["tb"],
        warp_cfg=_plan_dead_warp(cfg, scal, width, height))


def render_exact_frame(volume, leaf_vol, grid_origin, voxel_size,
                       cam_pos, view, width: int, height: int,
                       fov_deg: float, aspect: float,
                       light_dir=(-1.0, -1.0, -1.0),
                       base_color=(1.0, 0.8, 0.6),
                       ambient=(0.1, 0.1, 0.1),
                       shadows: bool = True,
                       shadow_field: Optional[ShadowField] = None):
    """Exact full frame (primary + per-hit shadow ray toward the light),
    image-identical to models/octree_raytracer.py::render_octree_image.

    Returns (img f32[H, W, 4], stats) or None when the pose or light is
    outside the sweep-exact envelope.
    """
    ok, cfg = sweep_exact_setup(volume, grid_origin, voxel_size,
                                cam_pos, view)
    if not ok:
        return None
    if shadows and shadow_field is None:
        shadow_field = build_shadow_field(volume, light_dir, voxel_size)
        if shadow_field is None:
            return None
    scal = cfg["scal_np"].copy()
    scal[8], scal[9] = fov_deg, aspect
    scal[34:37] = light_dir
    scal[37:40] = base_color
    scal[40:43] = ambient
    leaf_flat = jnp.asarray(leaf_vol).reshape(-1)
    if shadows:
        sf = shadow_field
        sf_meta = (sf.axis_l, sf.flip_l, sf.S, sf.A, sf.B, sf.sp,
                   sf.aa_min, sf.aa_span, sf.ab_min, sf.ab_span,
                   sf.inter_h, sf.inter_w, sf.sa, sf.sb, sf.ta, sf.tb)
        sf_bits, sf_nb9, sf_lsab = sf.bits, sf.nb9, sf.l_sab
    else:
        sf_meta = (0, False, 1, 1, 1, 32, 0.0, 1.0, 0.0, 1.0, 1, 1,
                   0.0, 0.0, 3, 3)
        sf_bits = jnp.zeros((1, 1), jnp.int32)
        sf_nb9 = jnp.zeros(1, jnp.float32)
        sf_lsab = jnp.ones(3, jnp.float32)
    return _exact_frame_jit(
        cfg["occ_sw"], cfg["nb9"], leaf_flat, jnp.asarray(scal),
        sf_bits, sf_nb9, sf_lsab,
        cfg["axis_world"], cfg["flip"], cfg["S"], cfg["A"], cfg["B"],
        cfg["IH"], cfg["IW"], width, height, int(leaf_vol.shape[0]),
        bool(shadows), sf_meta, ta=cfg["ta"], tb=cfg["tb"],
        warp_cfg=_plan_dead_warp(cfg, scal, width, height))
