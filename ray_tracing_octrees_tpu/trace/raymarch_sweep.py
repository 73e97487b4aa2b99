"""Sweep-space volume raymarcher: the fast path for VOLUME_RAYCAST mode.

MXU restructuring of ``trace/raymarch.py`` (the per-ray port of
shaders/raycastFS.glsl:511-986, kept as this module's oracle). The port is
semantically complete but marches per ray with trilinear gathers at the
~8 ns/element scalar floor (26.6 s/frame at 256**2 measured in round 2);
the reference runs the same kernel interactively at 1300**2 on a GPU's
texture units (main.cpp:1204). This module reaches that rate on TPU by
exploiting a structural property of the reference shader ON BINARY
DENSITY VOLUMES:

  every shaded sample takes alpha a = min(0.9999, 0.95 + noise*0.02), so
  accumulated alpha exceeds the 0.95 ALPHA_CUTOFF after the FIRST shaded
  sample and the march terminates — the 991-line marcher is exactly
  "first shadeable sample -> full shading stack -> post-processing".

That factors onto the slab-sweep machinery (trace/slab_sweep.py):

  1. first-hit detection: one bilinear-hat MXU sweep over the DETECTION
     volume ((density > 0.5) | (edge_factor > 0.1), minus radiation-carved
     voxels — the shader's do_shade condition at raycastFS.glsl:813-815
     and the carve skip at :763-777);
  2. shading inputs at the hit: the 10 per-voxel fields the shader
     samples (ao, grad_mag, edge_factor, grad_dir, indirect, shadow) ride
     the same sweep as EXACT 24-bit packed channels — fields are 8-bit
     quantized per voxel, concatenated along the lateral b axis, fetched
     with floor one-hot hats, and packed by {1, 256, 65536} weights in the
     b-contraction under f32 accumulation (the mesh_grid packing scheme);
  3. the shader's 8-step shadow march toward the light (raycastFS.glsl:
     223-272) becomes a precomputed WINDOWED cumulative-occlusion volume
     (sheared cumsum difference over the march range) — same blocker
     fraction the 8 samples estimate, computed exactly per voxel;
  4. per-pixel epilogue: the full calculateShading stack (:274-351) —
     procedural building colors, windows, boundaries, hemispheric lights,
     rim, edge darkening — plus gamma/tone/fog/dither post (:943-986),
     all closed-form elementwise math.

Documented divergences from the oracle (bounded by tests/test_raymarch_sweep.py):
  * hit positions are slab-quantized along the sweep axis (one voxel) and
    bilinear within slabs; the oracle's adaptive stepping + 6-step binary
    refinement resolves sub-voxel edges. Depth differs by O(1 voxel).
  * shading fields are nearest-voxel 8-bit, not trilinear f32.
  * the shadow term uses the exact windowed blocker fraction instead of 8
    stochastic samples; penumbra shapes differ in detail, not scale.
  * stochastic terms (blue-noise step jitter, TAA accumulation) that
    perturb WHERE the oracle samples are dropped; the deterministic
    per-pixel noise/dither of the post stack is kept.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_octrees_tpu.trace.raymarch import (
    ALPHA_CUTOFF,
    EDGE_THRESHOLD,
    GROUND_LIGHT_COLOR,
    MAIN_LIGHT_COLOR,
    MAIN_LIGHT_DIR,
    SKY_LIGHT_COLOR,
    VolumeTextures,
    _hash,
    detect_building_boundaries,
    get_building_color,
    is_window_position,
)
from ray_tracing_octrees_tpu.trace.slab_sweep import (
    _AXIS_SELECTORS,
    _auto_inter,
    _frame_scalars_np,
    _layout_volume,
    _sweep_geometry,
    _warp_setup,
)

f32 = jnp.float32
bf16 = jnp.bfloat16


# --------------------------------------------------------------------------
# Static scene preparation
# --------------------------------------------------------------------------


@jax.jit
def _detection_volume(density, edge_factor, radiation):
    """Shadeable-voxel indicator (do_shade analog, raycastFS.glsl:763-815)."""
    shadeable = (density > EDGE_THRESHOLD) | (edge_factor > 0.1)
    carved = radiation > 0.05
    return jnp.where(shadeable & ~carved, 1.0, 0.0).astype(f32)


@functools.partial(jax.jit, static_argnames=(
    "axis", "flip", "window_slabs", "pa_lo", "pa_hi", "pb_lo", "pb_hi",
    "inv"))
def _shadow_fraction_apply(blocker, axis: int, flip: bool, window_slabs: int,
                           da, db, pa_lo: int, pa_hi: int, pb_lo: int,
                           pb_hi: int, inv):
    """Windowed cumulative occlusion along the light (blocker fraction).

    Same shear + cumsum factorization as slab_sweep._shadow_sweep, but the
    per-voxel result is the MEAN blocker occupancy over the next
    ``window_slabs`` sweep steps toward the light — the quantity the
    reference's 8 shadow samples over its 5-unit march estimate
    stochastically (raycastFS.glsl:223-272).
    """
    S, A, B = blocker.shape
    OA = A + pa_lo + pa_hi
    OB = B + pb_lo + pb_hi
    vols = blocker[::-1] if flip else blocker
    m = jnp.arange(S, dtype=f32)
    oa = jnp.arange(OA, dtype=f32)[None, :] - f32(pa_lo) - m[:, None] * da
    ob = jnp.arange(OB, dtype=f32)[None, :] - f32(pb_lo) - m[:, None] * db
    ia = jnp.arange(A, dtype=f32)
    ib = jnp.arange(B, dtype=f32)
    ma = jnp.maximum(0.0, 1.0 - jnp.abs(oa[..., None] - ia)).astype(bf16)
    mb = jnp.maximum(0.0, 1.0 - jnp.abs(ob[..., None] - ib)).astype(bf16)
    sh = jnp.einsum("soa,sab->sob", ma, vols.astype(bf16),
                    preferred_element_type=f32)
    sh = jnp.einsum("sob,spb->sop", sh.astype(bf16), mb,
                    preferred_element_type=f32)
    # exclusive cumsum; windowed sum over the PRECEDING window_slabs steps
    # (sweep runs from the light side, so "toward the light" = earlier m)
    cum = jnp.cumsum(sh, axis=0) - sh
    w = window_slabs
    shifted = jnp.concatenate([jnp.zeros((w,) + cum.shape[1:], f32),
                               cum[:-w] if w < S else cum[:0]], axis=0)
    frac = jnp.clip((cum - shifted) / f32(w), 0.0, 1.0)
    ua = jnp.arange(A, dtype=f32)[None, :] + f32(pa_lo) + m[:, None] * da
    ub = jnp.arange(B, dtype=f32)[None, :] + f32(pb_lo) + m[:, None] * db
    io = jnp.arange(OA, dtype=f32)
    ip = jnp.arange(OB, dtype=f32)
    wa = jnp.maximum(0.0, 1.0 - jnp.abs(ua[..., None] - io)).astype(bf16)
    wb = jnp.maximum(0.0, 1.0 - jnp.abs(ub[..., None] - ip)).astype(bf16)
    out = jnp.einsum("sao,sop->sap", wa, frac.astype(bf16),
                     preferred_element_type=f32)
    out = jnp.einsum("sap,sbp->sab", out.astype(bf16), wb,
                     preferred_element_type=f32)
    if flip:
        out = out[::-1]
    return jnp.transpose(out, inv)


def shadow_fraction_volume(density, radiation, to_light,
                           range_world: float, voxel_size: float):
    """f32[Z,Y,X] blocker fraction over ``range_world`` toward the light.

    Blockers are the shader's occluders: density > 0.5 and not
    radiation-carved (raycastFS.glsl:252-260).
    """
    l = np.asarray(to_light, np.float64)
    l = l / np.linalg.norm(l)
    axis = int(np.argmax(np.abs(l)))
    inv = {0: (2, 1, 0), 1: (2, 0, 1), 2: (0, 2, 1)}[axis]
    blocker = jnp.where((density > EDGE_THRESHOLD) & (radiation < 0.5),
                        1.0, 0.0).astype(f32)
    if axis == 0:
        vol = jnp.transpose(blocker, (2, 1, 0))
    elif axis == 1:
        vol = jnp.transpose(blocker, (1, 2, 0))
    else:
        vol = jnp.transpose(blocker, (0, 2, 1))
    sel = _AXIS_SELECTORS[axis]
    l_s = float(l @ sel[0])
    l_a = float(l @ sel[1])
    l_b = float(l @ sel[2])
    flip = l_s > 0
    step_s = -1.0 if flip else 1.0
    da = -(l_a / l_s) * step_s
    db = -(l_b / l_s) * step_s
    S = int(vol.shape[0])
    # one sweep step spans voxel_size/|l_s| world units along the light
    w = int(max(1, min(S - 1, round(range_world * abs(l_s) /
                                    max(voxel_size, 1e-9)))))
    pa_lo = int(math.ceil(max(0.0, -(S - 1) * da)))
    pa_hi = int(math.ceil(max(0.0, (S - 1) * da)))
    pb_lo = int(math.ceil(max(0.0, -(S - 1) * db)))
    pb_hi = int(math.ceil(max(0.0, (S - 1) * db)))
    return _shadow_fraction_apply(vol, axis, bool(flip), w, f32(da), f32(db),
                                  pa_lo, pa_hi, pb_lo, pb_hi, inv)


def _q8(x):
    """Quantize [0, 1] -> integers 0..255 as f32 (bf16-exact values)."""
    return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0).astype(f32)


@dataclasses.dataclass
class VolumeSweepScene:
    """Static sweep form of VolumeTextures: detection + packed field volumes.

    ``bundles`` holds per-channel field triples quantized to 8-bit
    integers, each field a separate f32[Z,Y,X] volume (concatenated along
    the lateral axis at layout time; the {1,256,65536} packing happens in
    the b-contraction weights, keeping every einsum operand bf16-exact).
    """

    det: jax.Array                       # f32[Z,Y,X] detection indicator
    bundles: List[List[jax.Array]]       # channels of 1..3 8-bit fields
    box_min: np.ndarray                  # host copies: read every frame to
    box_max: np.ndarray                  # build scalars — keep off-device
    voxel_size: float
    layouts: Dict = dataclasses.field(default_factory=dict)
    # sticky sweep-table dims: orbiting cameras cross _auto_inter's 128-
    # texel buckets every few frames, and each flip is a multi-second
    # recompile; reuse the previous dims while they still cover the window
    sticky_inter: Optional[Tuple[int, int]] = None


def prepare_volume_scene(tex: VolumeTextures, voxel_size: float,
                         shadow_range_world: float = 5.0,
                         working: Optional[jax.Array] = None,
                         ) -> VolumeSweepScene:
    """Bind VolumeTextures for sweep rendering (static per scene state).

    Rebuild after radiation carving / precompute refresh, exactly when the
    reference re-dispatches its precompute (VolumeRaycastRenderer.cpp:
    843-905). ``working``: optional frustum working volume; when given,
    voxels outside it are dropped from detection (raycastFS.glsl:704-714).
    """
    density = tex.vol_mips[0]
    det = _detection_volume(density, tex.edge_factor, tex.radiation)
    if working is not None:
        det = jnp.where(working >= 0.001, det, 0.0)
    shadow = shadow_fraction_volume(density, tex.radiation,
                                    np.asarray(MAIN_LIGHT_DIR),
                                    shadow_range_world, voxel_size)
    gd = tex.grad_dir
    bundles = [
        [_q8(tex.ao), _q8(tex.grad_mag), _q8(tex.edge_factor)],
        [_q8(gd[..., 0] * 0.5 + 0.5), _q8(gd[..., 1] * 0.5 + 0.5),
         _q8(gd[..., 2] * 0.5 + 0.5)],
        [_q8(tex.indirect[..., 0]), _q8(tex.indirect[..., 1]),
         _q8(tex.indirect[..., 2])],
        [_q8(shadow)],
    ]
    det = jax.block_until_ready(det)
    return VolumeSweepScene(
        det=det,
        bundles=[[jax.block_until_ready(b) for b in ch] for ch in bundles],
        box_min=np.asarray(tex.box_min, np.float32),
        box_max=np.asarray(tex.box_max, np.float32),
        voxel_size=float(voxel_size),
    )


def _layout_bundle(scene: VolumeSweepScene, axis_world: int, flip: bool,
                   S: int, A: int, B: int, crop_lo: int):
    """Sweep-order concat layouts for all bundle channels (cached)."""
    key = (axis_world, flip, S, crop_lo)
    ent = scene.layouts.get(key)
    if ent is not None:
        return ent
    cats = []
    for ch in scene.bundles:
        parts = [_layout_volume(fv, axis_world, flip, S, A, B, crop_lo)
                 for fv in ch]
        cats.append(jax.block_until_ready(jnp.concatenate(parts, axis=2)))
    scene.layouts.clear()
    scene.layouts[key] = cats
    return cats


# --------------------------------------------------------------------------
# The per-frame sweep: detection + packed field channels
# --------------------------------------------------------------------------


def _volume_sweep_core(det_bf, cats, scal, n_chunks: int, s_valid: int,
                       a_size: int, b_size: int, inter_h: int, inter_w: int,
                       flip: bool, nf: Tuple[int, ...], o_base=None):
    """Traceable core: first-hit detection + field values at the hit.

    Returns (first_o f32[IH, IW] — GLOBAL layout-row index of the first
    hit, sentinel s_valid + 1 on miss — and vals, tuple of f32[IH, IW]
    24-bit packed field integers per channel at that hit). ``o_base``
    (traced scalar, default 0) offsets local slab rows into global rows —
    the slab-segmented multi-chip decomposition: the global first hit is
    the plain pmin of per-device first_o (rows globally unique), the
    winner's field values follow by pick-and-psum
    (parallel/sharding.py::volume_frame_segmented)."""
    CH = 32
    sp = det_bf.shape[0]
    eye_s, eye_a, eye_b, z0 = scal[0], scal[1], scal[2], scal[3]
    a_min, a_max, b_min, b_max = scal[4], scal[5], scal[6], scal[7]

    ua = a_min + (a_max - a_min) * (jnp.arange(inter_h, dtype=f32) + 0.5) / inter_h
    ub = b_min + (b_max - b_min) * (jnp.arange(inter_w, dtype=f32) + 0.5) / inter_w
    ob = f32(0) if o_base is None else jnp.asarray(o_base).astype(f32)
    o_all = jnp.arange(sp, dtype=f32) + ob
    k_all = (f32(s_valid) - 1.0 - o_all) if flip else o_all
    s_all = (z0 - eye_s) / (k_all + 0.5 - eye_s)
    pa_all = (ua[None, :] - eye_a) / s_all[:, None] + eye_a
    pb_all = (ub[None, :] - eye_b) / s_all[:, None] + eye_b
    ia = jnp.arange(a_size, dtype=f32)
    ib = jnp.arange(b_size, dtype=f32)
    # bilinear hats for detection; floor one-hots for nearest field fetch
    ma_all = jnp.maximum(0.0, 1.0 - jnp.abs(pa_all[..., None] - 0.5 - ia)).astype(bf16)
    mb_all = jnp.maximum(0.0, 1.0 - jnp.abs(pb_all[..., None] - 0.5 - ib)).astype(bf16)
    da = pa_all[..., None] - ia
    maN_all = ((da >= 0) & (da < 1)).astype(bf16)
    dbn = pb_all[..., None] - ib
    mbN = ((dbn >= 0) & (dbn < 1)).astype(bf16)
    # packed b-weights: field j of a channel sits at b-offset j*B and
    # carries weight 256^j (exact powers of two in bf16; f32 accumulation
    # bounds the packed value at 255*(1+256+65536) < 2^24, exactly
    # representable)
    mb_pk3 = jnp.concatenate(
        [mbN, mbN * bf16(256.0), mbN * bf16(65536.0)], axis=2)

    big_o = f32(s_valid + 1)
    ci_iota = jax.lax.broadcasted_iota(jnp.int32, (CH, 1, 1), 0)
    n_ch = len(nf)

    def chunk(ci, carry):
        first_o, vals = carry
        sl_det = jax.lax.dynamic_slice_in_dim(det_bf, ci * CH, CH, 0)
        ma = jax.lax.dynamic_slice_in_dim(ma_all, ci * CH, CH, 0)
        mb = jax.lax.dynamic_slice_in_dim(mb_all, ci * CH, CH, 0)
        hb = jnp.einsum("cab,cha->cbh", sl_det, ma, preferred_element_type=bf16)
        sh = jnp.einsum("cbh,cwb->chw", hb, mb, preferred_element_type=bf16)
        hits = sh > 0.5
        am = jnp.argmax(hits, axis=0)
        cand = jnp.where(hits.any(axis=0), (ci * CH + am).astype(f32) + ob,
                         big_o)
        upd = cand < first_o
        sel = (ci_iota == am[None]).astype(f32)

        maNc = jax.lax.dynamic_slice_in_dim(maN_all, ci * CH, CH, 0)
        new_vals = []
        for j in range(n_ch):
            k = nf[j]
            catv = jax.lax.dynamic_slice_in_dim(cats[j], ci * CH, CH, 0)
            hbx = jnp.einsum("cab,cha->cbh", catv, maNc,
                             preferred_element_type=bf16)
            if k == 3:
                mbx = jax.lax.dynamic_slice_in_dim(mb_pk3, ci * CH, CH, 0)
            else:
                mbx = jax.lax.dynamic_slice_in_dim(mbN, ci * CH, CH, 0)
                if k == 2:
                    mbx = jnp.concatenate([mbx, mbx * bf16(256.0)], axis=2)
            shx = jnp.einsum("cbh,cwb->chw", hbx, mbx,
                             preferred_element_type=f32)
            v_at = (shx * sel).sum(axis=0)
            new_vals.append(jnp.where(upd, v_at, vals[j]))
        return jnp.where(upd, cand, first_o), tuple(new_vals)

    init = (jnp.full((inter_h, inter_w), big_o),
            tuple(jnp.zeros((inter_h, inter_w), f32) for _ in range(n_ch)))
    return jax.lax.fori_loop(0, n_chunks, chunk, init)


def _pack_volume_first_o(first_o, vals, s_valid: int, flip: bool):
    """first_o/vals -> (packed k+0.5 or -1, flat vals), split from the
    sweep so the segmented path packs AFTER its cross-device combine."""
    hit_i = first_o < f32(s_valid)
    k_first = (f32(s_valid) - 1.0 - first_o) if flip else first_o
    packed = jnp.where(hit_i, k_first + 0.5, -1.0).reshape(-1)
    return packed, tuple(v.reshape(-1) for v in vals)


@functools.partial(
    jax.jit,
    static_argnames=("n_chunks", "s_valid", "a_size", "b_size",
                     "inter_h", "inter_w", "flip", "nf"),
)
def _volume_sweep(det_bf, cats, scal, n_chunks: int, s_valid: int,
                  a_size: int, b_size: int, inter_h: int, inter_w: int,
                  flip: bool, nf: Tuple[int, ...]):
    """One fused program: detection sweep + pack (single-device path)."""
    first_o, vals = _volume_sweep_core(
        det_bf, cats, scal, n_chunks, s_valid, a_size, b_size,
        inter_h, inter_w, flip, nf)
    return _pack_volume_first_o(first_o, vals, s_valid, flip)


# --------------------------------------------------------------------------
# Per-pixel shading epilogue (calculateShading + post, closed forms)
# --------------------------------------------------------------------------


def _unpack3(v):
    c2 = jnp.floor(v / 65536.0)
    r = v - c2 * 65536.0
    c1 = jnp.floor(r / 256.0)
    c0 = r - c1 * 256.0
    return c0 / 255.0, c1 / 255.0, c2 / 255.0


@functools.partial(jax.jit, static_argnames=("width", "height"))
def _shade_pixels(w_depth, w_vals, behind, dirs, d_s_n, scal,
                  time_value, width: int, height: int):
    """calculateShading (raycastFS.glsl:274-351) + post (:943-986)."""
    n = width * height
    eye_s = scal[0]
    voxel_size = scal[10]
    grid_origin = scal[12:15]
    cam_pos = scal[15:18]

    hit = (w_depth >= 0.0) & ~behind
    z_f = jnp.maximum(w_depth, 0.0)
    t_world = (z_f - eye_s) * voxel_size / d_s_n
    t_world = jnp.where(hit, t_world, 0.0)
    pos = cam_pos[None, :] + dirs * t_world[:, None]

    ao_q, gm_q, ef_q = _unpack3(w_vals[0])
    gx, gy, gz = _unpack3(w_vals[1])
    ir, ig, ib_ = _unpack3(w_vals[2])
    sh_frac = w_vals[3] / 255.0

    normal = jnp.stack([gx, gy, gz], -1) * 2.0 - 1.0
    nlen = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.maximum(nlen, 1e-6)
    indirect = jnp.stack([ir, ig, ib_], -1)

    boundary = detect_building_boundaries(pos)
    edge_factor = jnp.where(boundary < 0.4,
                            jnp.maximum(ef_q, 1.0 - boundary * 2.0), ef_q)
    window = is_window_position(pos, normal)
    base = get_building_color(pos, scal[43:46], scal[46:49])

    ao = 1.0 - ao_q * 0.7
    ao = jnp.where(boundary < 0.5, ao * (0.7 + 0.3 * boundary), ao)

    l = jnp.asarray(MAIN_LIGHT_DIR)
    ndotl = jnp.maximum(0.0, (normal * l[None, :]).sum(-1))
    # shadow: init with boundary dimming, subtract the windowed blocker
    # fraction's 8-sample analog, clamp (raycastFS.glsl:236-272)
    sh_init = jnp.where(boundary < 0.6, 0.8 + 0.2 * boundary, 1.0)
    shadow = jnp.maximum(0.2, sh_init - 1.6 * sh_frac)
    direct = jnp.asarray(MAIN_LIGHT_COLOR) * (ndotl * shadow)[..., None]
    sky = jnp.asarray(SKY_LIGHT_COLOR) * (0.5 + 0.5 * normal[..., 1])[..., None]
    ground = jnp.asarray(GROUND_LIGHT_COLOR) * (0.5 - 0.5 * normal[..., 1])[..., None]

    rim_f = (1.0 - jnp.maximum(0.0, (normal * -dirs).sum(-1))) ** 3
    rim = jnp.ones(3, f32) * (rim_f * 0.3)[..., None]
    rim = jnp.where((boundary < 0.6)[..., None],
                    rim * (2.0 * (1.0 - boundary))[..., None], rim)
    edge_dark = jnp.where(
        edge_factor > 0.7, 0.7,
        jnp.where(edge_factor > 0.3,
                  0.85 + 0.15 * ((0.7 - edge_factor) / 0.4), 1.0))
    edge_dark = jnp.where(boundary < 0.4, edge_dark * (0.6 + 0.4 * boundary),
                          edge_dark)
    lit = base * (direct + sky + ground + indirect * 3.0) \
        * (ao * edge_dark)[..., None] + rim
    lit = jnp.where(window[..., None], jnp.array([0.2, 0.25, 0.3], f32), lit)

    # compositing: first (only) shaded sample (raycastFS.glsl:884-898)
    px = jnp.tile(jnp.arange(width, dtype=f32), height)
    py = jnp.repeat(jnp.arange(height, dtype=f32), width)
    frag_xy = jnp.stack([px, py], -1)
    pixel_noise = _hash(jnp.concatenate(
        [frag_xy, jnp.broadcast_to(time_value * 1111.0, (n, 1))], -1))
    a = jnp.minimum(0.9999, 0.95 + pixel_noise * 0.02)
    a = jnp.where(ef_q > 0.5, 0.9999, a)
    alpha = jnp.where(hit, a, 0.0)
    color = a[:, None] * lit

    # post-processing (:943-986)
    nonzero = alpha >= 0.1
    final = jnp.where(nonzero[..., None], jnp.abs(color) ** (1.0 / 2.2), 0.0)
    dither = (_hash(jnp.concatenate(
        [frag_xy, jnp.broadcast_to(time_value * 591.3, (n, 1))], -1)) - 0.5) * 0.01
    final = jnp.where(nonzero[..., None], final + dither[..., None], final)
    final = jnp.where(nonzero[..., None], final / (final + 0.15), final)
    fog = (1.0 - jnp.exp(-t_world * 0.0001)) * 0.15
    fog_color = jnp.array([0.15, 0.17, 0.2], f32)
    final = jnp.where(nonzero[..., None],
                      final + fog[..., None] * (fog_color - final), final)
    rgba = jnp.concatenate([final, jnp.ones((n, 1), f32)], -1)
    return dict(
        color=rgba.reshape(height, width, 4),
        depth=jnp.where(hit, t_world, 0.0).reshape(height, width),
        normal=jnp.where(hit[:, None], normal, 0.0).reshape(height, width, 3),
        alpha=alpha.reshape(height, width),
    )


# --------------------------------------------------------------------------
# Frame driver
# --------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("n_chunks", "s_valid", "a_size", "b_size", "inter_h",
                     "inter_w", "flip", "axis_world", "width", "height",
                     "nf"),
)
def _volume_frame(det_bf, cats, scal, time_value, n_chunks, s_valid,
                  a_size, b_size, inter_h, inter_w, flip, axis_world,
                  width, height, nf):
    packed, vals = _volume_sweep(
        det_bf, cats, scal, n_chunks, s_valid, a_size, b_size,
        inter_h, inter_w, flip, nf)
    lin, behind, dirs, d_s_n = _warp_setup(
        scal, axis_world, inter_h, inter_w, width, height)
    safe = jnp.maximum(lin, 0)
    # ONE row gather of the stacked per-texel record instead of 1 + n_ch
    # scalar gathers: XLA's per-element gather runs at the ~8 ns scalar
    # floor (5 gathers = ~80 ms at 1080p — the round-3 "1080p cliff",
    # LADDER_r03 volume_raymarch_sweep 181 ms); row-major row gathers move
    # whole records at near copy rate (docs/ROADMAP.md cost model).
    tbl = jnp.stack((packed,) + tuple(vals), axis=1)      # [IH*IW, 1+n_ch]
    rows = tbl[safe]                                      # [N, 1+n_ch]
    w_depth = jnp.where(lin < 0, -1.0, rows[:, 0])
    w_vals = tuple(jnp.where(lin < 0, 0.0, rows[:, 1 + j])
                   for j in range(len(vals)))
    return _shade_pixels(w_depth, w_vals, behind, dirs, d_s_n, scal,
                         time_value, width, height)


# scalar slots appended past the slab_sweep layout for the shading epilogue
_SCAL_EXT = 49   # 43..45 box_min, 46..48 box_max


def _volume_frame_inputs(
    scene: VolumeSweepScene,
    grid_origin,
    camera_pos,
    view,
    fov_deg: float,
    aspect: float,
    inter_h: Optional[int] = None,
    inter_w: Optional[int] = None,
):
    """Host-side frame setup shared by the single-device and segmented
    paths: sweep geometry, sticky table dims, layouts, packed scalars."""
    det = scene.det
    axis_world, flip, (S, A, B), eyes, window, crop_lo = _sweep_geometry(
        det, grid_origin, scene.voxel_size, camera_pos, view)
    auto_h, auto_w = _auto_inter(window)
    if inter_h is None or inter_w is None:
        st = scene.sticky_inter
        if (st is not None and st[0] >= auto_h and st[1] >= auto_w
                and st[0] * st[1] <= 3 * auto_h * auto_w):
            auto_h, auto_w = st
        else:
            auto_h = min(1024, -(-auto_h // 256) * 256)
            auto_w = min(1024, -(-auto_w // 256) * 256)
            scene.sticky_inter = (auto_h, auto_w)
    inter_h = auto_h if inter_h is None else inter_h
    inter_w = auto_w if inter_w is None else inter_w
    det_bf = _layout_volume(det, axis_world, flip, S, A, B, crop_lo)
    cats = _layout_bundle(scene, axis_world, bool(flip), S, A, B, crop_lo)
    origin_c = np.asarray(grid_origin, np.float32) + np.asarray(
        _AXIS_SELECTORS[axis_world][0], np.float32
    ) * (crop_lo * float(scene.voxel_size))
    scal_np = np.zeros(_SCAL_EXT, np.float32)
    scal_np[:43] = _frame_scalars_np(
        *eyes[:3], eyes[3], *window, fov_deg, aspect, scene.voxel_size, S,
        origin_c, np.asarray(camera_pos, np.float32), view)
    scal_np[43:46] = scene.box_min
    scal_np[46:49] = scene.box_max
    nf = tuple(len(ch) for ch in scene.bundles)
    meta = dict(axis_world=axis_world, flip=bool(flip), S=S, A=A, B=B,
                inter_h=inter_h, inter_w=inter_w, nf=nf)
    return det_bf, cats, scal_np, meta


def render_volume_frame(
    scene: VolumeSweepScene,
    grid_origin,
    camera_pos,
    view,
    fov_deg: float,
    aspect: float,
    width: int,
    height: int,
    time_value: float = 0.0,
    inter_h: Optional[int] = None,
    inter_w: Optional[int] = None,
) -> dict:
    """Sweep-space volume raymarch frame.

    Returns dict(color f32[H,W,4], depth, normal, alpha) — the
    raymarch_volume output contract for the fields the app consumes.
    """
    det_bf, cats, scal_np, m = _volume_frame_inputs(
        scene, grid_origin, camera_pos, view, fov_deg, aspect,
        inter_h, inter_w)
    return _volume_frame(
        det_bf, tuple(cats), jnp.asarray(scal_np), jnp.asarray(time_value, f32),
        det_bf.shape[0] // 32, m["S"], m["A"], m["B"],
        m["inter_h"], m["inter_w"], m["flip"],
        m["axis_world"], width, height, m["nf"])
