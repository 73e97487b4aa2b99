"""MXU slab-sweep first-hit tracer (perspective shear-warp factorization).

The performance kernel behind the ray-trace benchmark. Per-ray traversal
loops cannot feed the TPU (XLA gathers cost ~8 ns/element — scalar-unit
rate — so a gather-per-step traversal runs orders of magnitude below
vector rate; see SURVEY §7 hard-part #3); instead the viewing transform
is factored exactly a la Lacroute-Levoy:

  view = warp_2d  o  per-slice scale+translate

For volume slices perpendicular to the dominant view axis, projecting each
slice through the eye onto a reference plane is a *uniform* scale+translate
(scale s_k = (z_ref - e_z)/(z_k - e_z)), which is separable into two small
matrix products with 1D linear-interpolation ("hat") matrices — pure MXU
work. Slices sweep front-to-back updating a per-ray first-hit depth; the
composited sheared buffer maps to the final image by one exact 2D
perspective warp. Every ray samples every slice crossing exactly once, so
hits are voxel-accurate along the sweep axis and interpolated (bilinear)
within slices.

Shadows come from a once-per-frame *orthographic* sweep along the light
direction (translate-only shears accumulating occlusion), so "primary +
shadow" costs one volume sweep + one cheap gather, not a second trace.

Surface normals use the reference's own formula normalize(p - cellCenter)
(RayTracerBVH.cpp:283-287) at voxel granularity — pure per-pixel math.
Divergence from the reference kernel (documented): hits are
slice-quantized along the sweep axis and bilinear within slices, where
the exact tracer (:mod:`ray_tracing_octrees_tpu.trace.octree_trace`)
resolves the true leaf-box entry point; and the reference's uniform-node
cells can be larger than one voxel, so normals there use the larger cell
center.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _hat_matrix(out_coords, in_size: int):
    """Linear-interpolation matrix M[o, i] = hat(in_pos(o) - i).

    out_coords: f32[O] sample positions in input-texel space. Out-of-range
    samples get weight 0 (reads as empty space).
    """
    i = jnp.arange(in_size, dtype=jnp.float32)[None, :]
    d = jnp.abs(out_coords[:, None] - i)
    w = jnp.maximum(0.0, 1.0 - d)
    return w


_LAYOUT_CACHE: dict = {}

# selectors: world-axis unit vectors for (sweep, A, B) per sweep axis,
# matching the volume transposes in _layout_volume.
_AXIS_SELECTORS = {
    0: (np.array([1.0, 0, 0], np.float32), np.array([0, 1.0, 0], np.float32), np.array([0, 0, 1.0], np.float32)),
    1: (np.array([0, 1.0, 0], np.float32), np.array([1.0, 0, 0], np.float32), np.array([0, 0, 1.0], np.float32)),
    2: (np.array([0, 0, 1.0], np.float32), np.array([1.0, 0, 0], np.float32), np.array([0, 1.0, 0], np.float32)),
}


# Per-frame parameters ride in ONE packed f32 array (every separate host
# scalar/argument is a separate host->device transfer over the device
# tunnel, ~ms each; packing makes a frame cost 1 upload).
# Layout: 0 eye_s, 1 eye_a, 2 eye_b, 3 z0, 4 a_min, 5 a_max, 6 b_min,
# 7 b_max, 8 fov_deg, 9 aspect, 10 voxel_size, 11 S, 12..14 origin,
# 15..17 cam_pos, 18..33 view (row major), 34..36 light_dir,
# 37..39 base_color, 40..42 ambient.
_SCAL_N = 43


def _sweep_core(vol_bf, scal, n_chunks: int, s_valid: int, a_size: int,
                b_size: int, inter_h: int, inter_w: int, flip: bool,
                shadow_sw=None, o_base=None):
    """hats + chunked MXU first-hit loop; traceable core.

    Returns (first_o f32[IH, IW] — GLOBAL layout-row index of the first
    hit, sentinel s_valid + 1 on miss — and sh_first, the shadow sample
    at that hit). ``o_base`` (traced scalar, default 0) offsets the local
    slab rows into global row indices: a device holding only the slab
    rows [o_base, o_base + sp) of the sweep layout computes the exact
    restriction of the full sweep to its segment, and the global first
    hit is the plain minimum of per-device first_o (ray order == layout
    row order) — the SP decomposition of parallel/sharding.py's
    ``sweep_frame_segmented``.
    """
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    CH = 32
    sp = vol_bf.shape[0]
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
    ma_all = jnp.maximum(0.0, 1.0 - jnp.abs(pa_all[..., None] - 0.5 - ia)).astype(bf16)
    mb_all = jnp.maximum(0.0, 1.0 - jnp.abs(pb_all[..., None] - 0.5 - ib)).astype(bf16)

    big_o = f32(s_valid + 1)
    has_sh = shadow_sw is not None
    ci_iota = jax.lax.broadcasted_iota(jnp.int32, (CH, 1, 1), 0)

    def chunk(ci, carry):
        # einsum order matters on narrow scenes (Calgary B = 29): the
        # a-contraction emits [c, b, h] so the tiny b axis pads to 8
        # SUBLANES instead of 128 LANES (4.4x MXU waste measured), and
        # the b-contraction then produces the [c, h, w] table directly.
        first_o, sh_first = carry
        ma = jax.lax.dynamic_slice_in_dim(ma_all, ci * CH, CH, 0)
        mb = jax.lax.dynamic_slice_in_dim(mb_all, ci * CH, CH, 0)
        sl = jax.lax.dynamic_slice_in_dim(vol_bf, ci * CH, CH, 0)
        hb = jnp.einsum("cab,cha->cbh", sl, ma, preferred_element_type=bf16)
        sh = jnp.einsum("cbh,cwb->chw", hb, mb, preferred_element_type=bf16)
        hits = sh > 0.5
        am = jnp.argmax(hits, axis=0)
        cand = jnp.where(
            hits.any(axis=0), (ci * CH + am).astype(f32) + ob, big_o,
        )
        upd = cand < first_o
        if has_sh:
            ssl = jax.lax.dynamic_slice_in_dim(shadow_sw, ci * CH, CH, 0)
            hbs = jnp.einsum("cab,cha->cbh", ssl, ma, preferred_element_type=bf16)
            shs = jnp.einsum("cbh,cwb->chw", hbs, mb, preferred_element_type=bf16)
            sel = (ci_iota == am[None]).astype(bf16)
            sh_at = (shs * sel).sum(axis=0).astype(f32)
            sh_first = jnp.where(upd, sh_at, sh_first)
        return jnp.where(upd, cand, first_o), sh_first

    return jax.lax.fori_loop(
        0, n_chunks, chunk,
        (jnp.full((inter_h, inter_w), big_o),
         jnp.zeros((inter_h, inter_w), f32)),
    )


def _pack_first_o(first_o, sh_first, s_valid: int, flip: bool, has_sh: bool):
    """(first_o, sh_first) -> the packed (hit ? k + 0.5 [+2048*sh] : -1)
    field, flattened. Split from the sweep so the segmented multi-chip
    path can pack AFTER its cross-device min-combine."""
    f32 = jnp.float32
    hit_i = first_o < f32(s_valid)
    k_first = (f32(s_valid) - 1.0 - first_o) if flip else first_o
    packed = k_first + 0.5
    if has_sh:
        packed = packed + jnp.where(sh_first > 0.5, 2048.0, 0.0)
    return jnp.where(hit_i, packed, -1.0).reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=("n_chunks", "s_valid", "a_size", "b_size",
                     "inter_h", "inter_w", "flip"),
)
def _sweep_all(vol_bf, scal, n_chunks: int, s_valid: int, a_size: int,
               b_size: int, inter_h: int, inter_w: int, flip: bool,
               shadow_sw=None):
    """hats + chunked MXU first-hit loop + packing, one program.

    Returns the packed (hit ? slice_center : -1) field, flattened. When
    ``shadow_sw`` (the shadow volume in the same sweep layout) is given,
    it is resampled alongside occupancy and its value AT the first hit is
    packed into the same float: value = k + 0.5 + 2048 * shadowed_bit —
    one downstream warp gather recovers depth and shadow together, so the
    frame needs no per-pixel attribute gathers at all.
    """
    first_o, sh_first = _sweep_core(
        vol_bf, scal, n_chunks, s_valid, a_size, b_size,
        inter_h, inter_w, flip, shadow_sw=shadow_sw,
    )
    return _pack_first_o(first_o, sh_first, s_valid, flip,
                         shadow_sw is not None)


@functools.partial(
    jax.jit,
    static_argnames=("axis_world", "inter_h", "inter_w", "width", "height"),
)
def _warp_setup(scal, axis_world: int, inter_h: int, inter_w: int,
                width: int, height: int):
    """Per-pixel warp indices into the sheared buffer + ray geometry.

    ``lin`` is -1 for pixels that cannot hit: rays pointing away from the
    reference plane (t_ref <= 0) or whose reference-plane intersection
    falls outside the table window. The window contains the volume's full
    projection at both slab extremes (see _sweep_geometry), and a ray's
    window coordinate is monotone along the slab, so out-of-window rays
    provably miss — clipping them to the edge texel (as a plain clamped
    gather would) could alias a different ray's hit.
    """
    f32 = jnp.float32
    eye_s, eye_a, eye_b, z0 = scal[0], scal[1], scal[2], scal[3]
    a_min, a_max, b_min, b_max = scal[4], scal[5], scal[6], scal[7]
    fov_deg, aspect, voxel_size = scal[8], scal[9], scal[10]
    cam_pos = scal[15:18]
    view = scal[18:34].reshape(4, 4)

    tan_half = jnp.tan(fov_deg * f32(math.pi / 360.0))
    px = (jnp.arange(width, dtype=f32) + 0.5) / width * 2.0 - 1.0
    py = 1.0 - (jnp.arange(height, dtype=f32) + 0.5) / height * 2.0
    nx = px * aspect * tan_half
    ny = py * tan_half
    nxg, nyg = jnp.meshgrid(nx, ny, indexing="xy")
    d_view = jnp.stack([nxg, nyg, -jnp.ones_like(nxg)], -1)
    inv_view = jnp.linalg.inv(view)
    d_world = jnp.matmul(d_view.reshape(-1, 3), inv_view[:3, :3].T,
                         precision=jax.lax.Precision.HIGHEST)

    sel = _AXIS_SELECTORS[axis_world]
    d_s = d_world @ jnp.asarray(sel[0], f32)
    d_a = d_world @ jnp.asarray(sel[1], f32)
    d_b = d_world @ jnp.asarray(sel[2], f32)
    denom = d_s / voxel_size
    t_ref = (z0 - eye_s) / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    a_ref = eye_a + d_a / voxel_size * t_ref
    b_ref = eye_b + d_b / voxel_size * t_ref
    behind = t_ref <= 0

    uu = (a_ref - a_min) / (a_max - a_min) * inter_h
    vv = (b_ref - b_min) / (b_max - b_min) * inter_w
    oow = (uu < 0) | (uu >= inter_h) | (vv < 0) | (vv >= inter_w)
    iu = jnp.clip(uu.astype(jnp.int32), 0, inter_h - 1)
    iv = jnp.clip(vv.astype(jnp.int32), 0, inter_w - 1)
    lin = jnp.where(behind | oow, -1, iu * inter_w + iv)
    d_len = jnp.linalg.norm(d_world, axis=-1)
    dirs = d_world / d_len[:, None]
    d_s_n = d_s / d_len
    return lin, behind, dirs, d_s_n


def _frame_scalars_np(eye_s, eye_a, eye_b, z0, a_min, a_max, b_min, b_max,
                      fov_deg, aspect, voxel_size, s_valid, origin, cam_pos,
                      view, light_dir=(0, 0, 0), base=(0, 0, 0), amb=(0, 0, 0)):
    scal = np.zeros(_SCAL_N, np.float32)
    scal[0:8] = (eye_s, eye_a, eye_b, z0, a_min, a_max, b_min, b_max)
    scal[8:12] = (fov_deg, aspect, voxel_size, s_valid)
    scal[12:15] = origin
    scal[15:18] = cam_pos
    scal[18:34] = np.asarray(view, np.float32).reshape(-1)
    scal[34:37] = light_dir
    scal[37:40] = base
    scal[40:43] = amb
    return scal


def _frame_scalars(*args, **kwargs):
    return jnp.asarray(_frame_scalars_np(*args, **kwargs))


def _plan_warp_cfg(scal_np, axis_world: int, inter_h: int, inter_w: int,
                   width: int, height: int, for_fused: bool = False):
    """Pick the Pallas warp kernel config for this frame (host-side).

    Returns a (ty, tx, win) tuple, or None to use the XLA gather fallback
    (pathological cameras whose per-tile u-range exceeds every window).
    ``for_fused``: the fused frame kernel computes table indices from the
    closed forms in-kernel, so it has no fixed-column-count constraint;
    the standalone lookup kernel decodes packed ``lin`` via ``>> 10`` and
    needs exactly 1024 columns.
    """
    from ray_tracing_octrees_tpu.trace.warp_kernel import plan_warp

    if jax.default_backend() != "tpu":
        return None   # CPU/interpret: XLA gather is the fast path there
    if not for_fused and inter_w != 1024:
        return None   # the kernel's >>10 index decode assumes 1024 columns
    return plan_warp(scal_np, _AXIS_SELECTORS, axis_world,
                     inter_h, inter_w, width, height)


def _auto_inter(window, max_dim: int = 1024,
                density: float = 6.0) -> Tuple[int, int]:
    """Table resolution fitted to the projected volume extent (host-side).

    The sweep table historically used a fixed 1024x1024, but scenes are
    often thin along one lateral axis (Calgary: B = 29 voxels of building
    height vs A = 425): a 1024-texel axis there is ~35x oversampled and
    the b-contraction's cost is linear in table width. ``density`` texels
    per voxel (default 6) keeps in-slab bilinear hit resolution well
    under the 1-voxel slab quantization that already bounds the sweep's
    accuracy; exact consumers (sweep_exact / fast_exact) may run coarser
    — their answers are lattice-independent.
    """
    a_min, a_max, b_min, b_max = window

    def dim(span: float) -> int:
        t = int(math.ceil(density * max(span, 1.0) / 128.0)) * 128
        return max(256, min(max_dim, t))

    return dim(a_max - a_min), dim(b_max - b_min)


def _warp_values(packed, lin, inter_h: int, inter_w: int,
                 width: int, height: int, warp_cfg):
    """Per-pixel table lookup: Pallas one-hot MXU warp or XLA gather.

    Both paths return -1.0 for lin == -1 (cannot-hit pixels).
    """
    if warp_cfg is None:
        w = jnp.take(packed, jnp.maximum(lin, 0))
        return jnp.where(lin < 0, -1.0, w)
    from ray_tracing_octrees_tpu.trace.warp_kernel import (
        split_hi_lo, warp_lookup,
    )

    ty, tx, win = warp_cfg
    t_hl = split_hi_lo(packed.reshape(inter_h, inter_w))
    lin2 = lin.reshape(height, width)
    ph, pw = (-height) % ty, (-width) % tx
    if ph or pw:
        lin2 = jnp.pad(lin2, ((0, ph), (0, pw)), constant_values=-1)
    out = warp_lookup(t_hl, lin2, ty, tx, win)
    return out[:height, :width].reshape(-1)


def _sweep_geometry(volume, grid_origin, voxel_size, camera_pos, view):
    """Host-side sweep configuration: axis, flip, eye coords, window, crop.

    The factorization needs the eye outside the slab range along the
    sweep axis. Exterior cameras pick the most view-aligned axis that
    satisfies it. INTERIOR cameras (fly-throughs) sweep only the
    forward half-volume along the most view-aligned axis: slabs past the
    eye's own slab in the look direction, with the returned ``crop_lo``
    offset cropped out of the layout. The reference's fragment marcher
    handles interior eyes with tNear = max(tNear, 0)
    (raycastFS.glsl:571); here the analog drops (a) the eye's own ~1-slab
    layer and (b) rays pointing backward along the sweep axis (outside
    the forward frustum cone for any camera whose look direction
    dominates the axis — they report miss). Exterior cameras keep
    crop_lo == 0 and behave exactly as before.
    """
    look = -np.asarray(view)[2, :3]
    axis_world = int(np.argmax(np.abs(look)))
    cam_vox = (
        np.asarray(camera_pos, np.float64) - np.asarray(grid_origin, np.float64)
    ) / float(voxel_size)
    dz_, dy_, dx_ = volume.shape[:3]
    exts = {0: dx_, 1: dy_, 2: dz_}
    order = list(np.argsort(-np.abs(look)))
    crop_lo = 0
    s_keep = None
    for ax in order:
        e = float(cam_vox @ np.asarray(_AXIS_SELECTORS[int(ax)][0], np.float64))
        if e < 0.0 or e > exts[int(ax)]:
            axis_world = int(ax)
            break
    else:
        # interior eye: forward half-volume along the most-aligned axis
        axis_world = int(order[0])
        sel0 = np.asarray(_AXIS_SELECTORS[axis_world][0], np.float64)
        e = float(cam_vox @ sel0)
        s_full = exts[axis_world]
        if float(look @ sel0) >= 0.0:
            crop_lo = min(int(np.floor(e)) + 1, s_full - 1)
            s_keep = s_full - crop_lo
        else:
            crop_lo = 0
            s_keep = max(int(np.floor(e)), 1)
    sel = _AXIS_SELECTORS[axis_world]
    eye_s = float(cam_vox @ np.asarray(sel[0], np.float64)) - crop_lo
    eye_a = float(cam_vox @ np.asarray(sel[1], np.float64))
    eye_b = float(cam_vox @ np.asarray(sel[2], np.float64))
    dz, dy, dx = volume.shape[:3]
    S, A, B = {0: (dx, dy, dz), 1: (dy, dx, dz), 2: (dz, dx, dy)}[axis_world]
    if s_keep is not None:
        S = s_keep
    flip = eye_s > S / 2
    k0 = (S - 1.0) if flip else 0.0
    z0 = k0 + 0.5
    s_far_k = 0.0 if flip else (S - 1.0)
    s_far = (z0 - eye_s) / (s_far_k + 0.5 - eye_s)
    a_min = min(0.0, (0.0 - eye_a) * s_far + eye_a)
    a_max = max(float(A), (float(A) - eye_a) * s_far + eye_a)
    b_min = min(0.0, (0.0 - eye_b) * s_far + eye_b)
    b_max = max(float(B), (float(B) - eye_b) * s_far + eye_b)
    return (axis_world, flip, (S, A, B), (eye_s, eye_a, eye_b, z0),
            (a_min, a_max, b_min, b_max), crop_lo)


def _layout_volume(volume, axis_world, flip, S, A, B, crop_lo=0):
    """bf16 sweep-order volume, padded to the chunk size; cached per scene.

    ``crop_lo``/``S`` crop the sweep axis to [crop_lo, crop_lo + S) in
    unflipped sweep order (the interior-camera forward half-volume)."""
    CH = 32
    # Keyed by id() but the entry pins the source volume alive, and a hit
    # requires `src is volume` — so a GC'd volume whose id is reused can
    # never be served a stale layout (ids are unique among live objects).
    key = (id(volume), axis_world, flip, crop_lo, S)
    ent = _LAYOUT_CACHE.get(key)
    vol_bf = ent[1] if ent is not None and ent[0] is volume else None
    if vol_bf is None:
        vol_zyx = jnp.asarray(volume, jnp.float32)
        if axis_world == 0:
            vol = jnp.transpose(vol_zyx, (2, 1, 0))
        elif axis_world == 1:
            vol = jnp.transpose(vol_zyx, (1, 2, 0))
        else:
            vol = jnp.transpose(vol_zyx, (0, 2, 1))
        if crop_lo or S != vol.shape[0]:
            vol = vol[crop_lo : crop_lo + S]
        if flip:
            vol = vol[::-1]
        s_pad = (-S) % CH
        if s_pad:
            vol = jnp.concatenate([vol, jnp.zeros((s_pad, A, B), jnp.float32)], 0)
        vol_bf = jax.block_until_ready(vol.astype(jnp.bfloat16))
        if len(_LAYOUT_CACHE) > 12:
            _LAYOUT_CACHE.clear()
        _LAYOUT_CACHE[key] = (volume, vol_bf)
    return vol_bf


def sweep_first_hit(
    volume,          # f32[Z, Y, X] occupancy (0/1)
    grid_origin,
    voxel_size,
    camera_pos,
    view,
    fov_deg: float,
    aspect: float,
    width: int,
    height: int,
    inter_h: int = 1024,
    inter_w: int = 1024,
):
    """First-hit trace of a full frame via the slab sweep.

    Three programs per frame (sweep+pack, warp setup, finish) plus one
    isolated warp gather; all per-frame parameters ride in a single packed
    scalar upload (per-argument transfers dominate on tunneled devices).

    Returns (hit bool[N], t f32[N], point f32[N,3], dirs f32[N,3]) with
    N = width*height, pixel order row-major from the top row.
    """
    f32 = jnp.float32
    axis_world, flip, (S, A, B), eyes, window, crop_lo = _sweep_geometry(
        volume, grid_origin, voxel_size, camera_pos, view
    )
    vol_bf = _layout_volume(volume, axis_world, flip, S, A, B, crop_lo)
    sp = vol_bf.shape[0]
    origin_c = np.asarray(grid_origin, np.float32) + np.asarray(
        _AXIS_SELECTORS[axis_world][0], np.float32
    ) * (crop_lo * float(voxel_size))
    scal_np = _frame_scalars_np(
        *eyes[:3], eyes[3], *window, fov_deg, aspect, float(voxel_size), S,
        origin_c, np.asarray(camera_pos, np.float32),
        view,
    )
    scal = jnp.asarray(scal_np)
    warp_cfg = _plan_warp_cfg(scal_np, axis_world, inter_h, inter_w,
                              width, height)
    hit, t, point, dirs = _sweep_first_hit_jit(
        vol_bf, scal, sp // 32, S, A, B, inter_h, inter_w, bool(flip),
        axis_world, width, height, warp_cfg,
    )
    return hit, t, point, dirs


@functools.partial(
    jax.jit,
    static_argnames=("n_chunks", "s_valid", "a_size", "b_size", "inter_h",
                     "inter_w", "flip", "axis_world", "width", "height",
                     "warp_cfg"),
)
def _sweep_first_hit_jit(vol_bf, scal, n_chunks, s_valid, a_size, b_size,
                         inter_h, inter_w, flip, axis_world, width, height,
                         warp_cfg):
    packed = _sweep_all(
        vol_bf, scal, n_chunks, s_valid, a_size, b_size, inter_h, inter_w,
        flip,
    )
    lin, behind, dirs, d_s_n = _warp_setup(
        scal, axis_world, inter_h, inter_w, width, height
    )
    w_val = _warp_values(packed, lin, inter_h, inter_w, width, height,
                         warp_cfg)
    return _finish_sweep(w_val, behind, dirs, d_s_n, scal)


SEED_DILATION = 3


def dilate_occupancy(volume, radius: int = SEED_DILATION):
    """Chebyshev dilation of a 0/1 occupancy volume, PADDED by ``radius``
    on every side (for sweep_seed: a ray crossing an edge voxel can have
    its slab-center sample up to 2 cells outside the array, where the
    resample taps would read 0 whatever the dilation — the pad keeps every
    tap of every in-bounds crossing inside dilated-1 cells). The caller's
    grid origin shifts by -radius voxels; sweep_seed does this itself."""
    occ = jnp.asarray(volume) > 0
    r = int(radius)
    occ = jnp.pad(occ, ((r, r), (r, r), (r, r)), constant_values=False)
    k = 2 * r + 1
    dil = jax.lax.reduce_window(
        occ, False, jax.lax.bitwise_or,
        window_dimensions=(k, k, k), window_strides=(1, 1, 1),
        padding="SAME",
    )
    # bf16 halves the persistent footprint (518^3 at the Calgary root);
    # 0/1 is exact and the sweep layout upcasts/re-quantizes anyway
    return dil.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("to_light", "doublings"))
def light_blocked_volume(volume_dilated, to_light: tuple,
                         doublings: int = 10):
    """Conservative per-voxel "any solid toward the light" flag.

    bool[Z+2r, Y+2r, X+2r] over dilate_occupancy's padded cube: False
    PROVES that a ray from anywhere in the voxel toward ``to_light``
    crosses no solid voxel — the exact frame's shadow rays die at step 0
    there (the flag is ANDed into the shadow trace's live mask; True just
    means "trace it"). Pays for elevated lights / sparse scenes only: a
    shallow light over a city flags ~99% of voxels "maybe occluded"
    (measured on Calgary — zero rays pruned), so it is opt-in
    (config.raytrace.exact_shadow_prune).

    Construction: directional doubling. B_0 = the radius-3 dilated
    occupancy; B_{k+1} = maxpool3(B_k) | shift(maxpool3(B_k),
    round(2^k * step)) with step = -to_light normalized to max-axis 1.
    The per-step 3^3 dilation absorbs both the fractional-shift rounding
    (<= 0.5/axis) and the within-step lateral path (covered inductively),
    so the union over t in [0, 2^K] of the swept dilated occupancy is a
    subset of B_K — conservative by induction. Over-dilation grows ~1
    voxel per doubling, costing only false "maybe occluded" flags.
    """
    d = -np.asarray(to_light, np.float64)
    d = d / max(np.max(np.abs(d)), 1e-12)
    step_xyz = d  # voxels per unit step along the dominant axis
    B = jnp.asarray(volume_dilated) > 0

    def shift3(a, off_zyx):
        out = a
        for ax, off in enumerate(off_zyx):
            if off == 0:
                continue
            pad = [(0, 0)] * 3
            if off > 0:
                pad[ax] = (off, 0)
                sl = [slice(None)] * 3
                sl[ax] = slice(0, a.shape[ax])
            else:
                pad[ax] = (0, -off)
                sl = [slice(None)] * 3
                sl[ax] = slice(-off, a.shape[ax] - off)
            out = jnp.pad(out, pad, constant_values=False)[tuple(sl)]
        return out

    for k in range(doublings):
        B = jax.lax.reduce_window(
            B, False, jax.lax.bitwise_or,
            window_dimensions=(3, 3, 3), window_strides=(1, 1, 1),
            padding="SAME",
        )
        off = np.rint((2.0 ** k) * step_xyz).astype(np.int64)
        # shift B by -offset: a voxel reads the region the ray REACHES
        # (x is occludable if x + 2^k*step is in B), zyx order
        B = B | shift3(B, (-int(off[2]), -int(off[1]), -int(off[0])))
    return B


def sweep_seed(
    volume_dilated,   # f32[Z+6, Y+6, X+6] from dilate_occupancy(occ)
    grid_origin,      # of the ORIGINAL grid; the pad shift happens here
    voxel_size,
    camera_pos,
    view,
    fov_deg: float,
    aspect: float,
    width: int,
    height: int,
):
    """CONSERVATIVE per-pixel DDA seeds from one sweep of the dilated grid.

    Returns (live bool[N], t_seed f32[N], exterior bool). For an EXTERIOR
    camera (exterior=True) the guarantees are:

      * live[i] == False  =>  ray i hits NO solid voxel (safe to skip the
        exact DDA entirely — the dilated volume is a superset of the
        occupancy, and the radius-3 dilation makes the 0.5-threshold
        bilinear slab test conservative: if the ray crosses a solid voxel
        w in slab o, the crossing point lies within |slope|/2 <= 2 cells
        of the slab-center sample laterally, the four bilinear taps within
        1 more, so EVERY tap cell is within 3 of w and reads 1 — the
        resampled value is exactly 1 > 0.5; valid while the frame's max
        lateral slope <= 4, checked on the host from the window extents),
      * t_seed[i] <= the world-t at which ray i first enters any solid
        voxel (the dilated first hit can only be EARLIER; 2.5 slabs of
        margin cover the slab-center quantization).

    With exterior=False (interior eye: forward half-volume crop drops the
    eye's slab and backward rays) no skipping claim holds; callers must
    ignore the seeds. Seeding changes the exact tracer's sampled-point
    sequence only across provably-empty space, so outputs match the
    unseeded trace except in the nudge-epsilon grazing class (tests
    measure equality).
    """
    f32 = jnp.float32
    origin_p = np.asarray(grid_origin, np.float32) - np.float32(
        SEED_DILATION) * np.float32(voxel_size)
    axis_world, flip, (S, A, B), eyes, window, crop_lo = _sweep_geometry(
        volume_dilated, origin_p, voxel_size, camera_pos, view
    )
    n = width * height
    cam_vox = (
        np.asarray(camera_pos, np.float64) - np.asarray(origin_p, np.float64)
    ) / float(voxel_size)
    dz_, dy_, dx_ = volume_dilated.shape[:3]
    inside = bool(
        (0 <= cam_vox[0] <= dx_) and (0 <= cam_vox[1] <= dy_)
        and (0 <= cam_vox[2] <= dz_)
    )
    a_min, a_max, b_min, b_max = window
    eye_s, eye_a, eye_b, z0 = eyes
    span = abs(z0 - eye_s)
    slope_max = max(abs(a_min - eye_a), abs(a_max - eye_a),
                    abs(b_min - eye_b), abs(b_max - eye_b)) / max(span, 1e-9)
    if inside or crop_lo != 0 or slope_max > 4.0:
        return (jnp.ones(n, bool), jnp.zeros(n, f32), False)

    auto_h, auto_w = _auto_inter(window)
    vol_bf = _layout_volume(volume_dilated, axis_world, flip, S, A, B, crop_lo)
    sp = vol_bf.shape[0]
    scal_np = _frame_scalars_np(
        eye_s, eye_a, eye_b, z0, a_min, a_max, b_min, b_max,
        fov_deg, aspect, float(voxel_size), S,
        origin_p,
        np.asarray(camera_pos, np.float32), view,
    )
    scal = jnp.asarray(scal_np)
    warp_cfg = _plan_warp_cfg(scal_np, axis_world, auto_h, auto_w,
                              width, height)
    live, t_seed = _sweep_seed_jit(
        vol_bf, scal, sp // 32, S, A, B, auto_h, auto_w, bool(flip),
        axis_world, width, height, warp_cfg,
    )
    return live, t_seed, True


@functools.partial(
    jax.jit,
    static_argnames=("n_chunks", "s_valid", "a_size", "b_size", "inter_h",
                     "inter_w", "flip", "axis_world", "width", "height",
                     "warp_cfg"),
)
def _sweep_seed_jit(vol_bf, scal, n_chunks, s_valid, a_size, b_size,
                    inter_h, inter_w, flip, axis_world, width, height,
                    warp_cfg):
    packed = _sweep_all(
        vol_bf, scal, n_chunks, s_valid, a_size, b_size, inter_h, inter_w,
        flip,
    )
    lin, behind, dirs, d_s_n = _warp_setup(
        scal, axis_world, inter_h, inter_w, width, height
    )
    w_val = _warp_values(packed, lin, inter_h, inter_w, width, height,
                         warp_cfg)
    eye_s = scal[0]
    voxel_size = scal[10]
    live = (w_val >= 0.0) & ~behind
    # entry of the dilated hit slab minus margin: 2.5 slabs EARLIER along
    # the ray (toward the eye — sign(d_s_n) is the k-space travel
    # direction) covers the center-vs-entry half slab and the warp/tap
    # quantization with a full 2-slab cushion
    z_f = w_val - 2.5 * jnp.sign(d_s_n)
    t_seed = (z_f - eye_s) * voxel_size / d_s_n
    t_seed = jnp.where(live, jnp.maximum(t_seed, 0.0), 0.0)
    return live, t_seed


@jax.jit
def _finish_sweep(w_val, behind, dirs, d_s_n, scal):
    eye_s = scal[0]
    voxel_size = scal[10]
    cam_pos = scal[15:18]
    hit = (w_val >= 0.0) & ~behind
    z_f = jnp.maximum(w_val, 0.0)
    t_world = (z_f - eye_s) * voxel_size / d_s_n
    t_world = jnp.where(hit, t_world, 0.0)
    point = cam_pos[None, :] + dirs * t_world[:, None]
    return hit, t_world, point, dirs


def _shadow_hats(S: int, A: int, B: int, da: float, db: float,
                 pa_lo: int, pa_hi: int, pb_lo: int, pb_hi: int):
    """Shear/unshear hat matrices for the shadow sweep (host, numpy).

    Depend only on the light slope and the volume shape — camera-invariant
    — so they are built once per (scene, light) and cached on device
    rather than rebuilt inside every frame program (the [S, OA, A] builds
    were ~40% of the per-frame shadow cost).
    """
    f32 = np.float32
    OA = A + pa_lo + pa_hi
    OB = B + pb_lo + pb_hi
    m = np.arange(S, dtype=f32)
    oa = np.arange(OA, dtype=f32)[None, :] - f32(pa_lo) - m[:, None] * f32(da)
    ob = np.arange(OB, dtype=f32)[None, :] - f32(pb_lo) - m[:, None] * f32(db)
    ia = np.arange(A, dtype=f32)
    ib = np.arange(B, dtype=f32)
    ma = np.maximum(0.0, 1.0 - np.abs(oa[..., None] - ia))
    mb = np.maximum(0.0, 1.0 - np.abs(ob[..., None] - ib))
    ua = np.arange(A, dtype=f32)[None, :] + f32(pa_lo) + m[:, None] * f32(da)
    ub = np.arange(B, dtype=f32)[None, :] + f32(pb_lo) + m[:, None] * f32(db)
    io = np.arange(OA, dtype=f32)
    ip = np.arange(OB, dtype=f32)
    wa = np.maximum(0.0, 1.0 - np.abs(ua[..., None] - io))
    wb = np.maximum(0.0, 1.0 - np.abs(ub[..., None] - ip))
    to_dev = lambda x: jnp.asarray(x.astype(np.float32)).astype(jnp.bfloat16)
    return to_dev(ma), to_dev(mb), to_dev(wa), to_dev(wb)


@functools.partial(jax.jit, static_argnames=("flip", "inv"))
def _shadow_apply(vol, ma, mb, wa, wb, flip: bool, inv):
    """Shadow sweep given precomputed hats: 4 batched einsums + cumsum."""
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    vols = vol[::-1] if flip else vol
    sh = jnp.einsum("soa,sab->sob", ma, vols.astype(bf16),
                    preferred_element_type=f32)
    sh = jnp.einsum("sob,spb->sop", sh.astype(bf16), mb,
                    preferred_element_type=f32)
    cum = jnp.cumsum(sh, axis=0) - sh
    occ = jnp.minimum(cum, 1.0)
    out = jnp.einsum("sao,sop->sap", wa, occ.astype(bf16),
                     preferred_element_type=f32)
    out = jnp.einsum("sap,sbp->sab", out.astype(bf16), wb,
                     preferred_element_type=f32)
    if flip:
        out = out[::-1]
    return jnp.transpose(out, inv)


@functools.partial(
    jax.jit,
    static_argnames=("flip", "pa_lo", "pa_hi", "pb_lo", "pb_hi", "inv"),
)
def _shadow_sweep(vol, da, db, flip: bool, pa_lo: int, pa_hi: int,
                  pb_lo: int, pb_hi: int, inv):
    """Cumulative occlusion along a direction, fully batched for the MXU.

    vol: f32[S, A, B]; (da, db) is the light slope in voxels per sweep step.
    A blocker at (j, a, b) occludes (m, a - (m-j)*da, b - (m-j)*db) for all
    m later in the sweep. Because the shift per step is constant
    (orthographic light), the sequential shift-and-accumulate factors into
    three batched ops: shear every slice into a common "light space" frame
    (one einsum pair, slice j translated by +j*(da, db)), an exclusive
    cumulative sum along the sweep axis, and an unshear back (second einsum
    pair). No sequential scan — S slices in 4 MXU batched matmuls.

    Returns occluded f32 transposed by ``inv`` back to the grid's native
    (Z, Y, X) order: ~1 where some solid voxel lies toward the light.
    """
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    S, A, B = vol.shape
    OA = A + pa_lo + pa_hi
    OB = B + pb_lo + pb_hi
    vols = vol[::-1] if flip else vol  # vols[m] = slice at sweep step m
    m = jnp.arange(S, dtype=f32)

    # shear: sheared[m][o] = vols[m] sampled at (o - pa_lo - m*da), so a
    # volume coordinate a lands at o = a + pa_lo + m*da (common frame).
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

    # occlusion strictly before step m in light space
    cum = jnp.cumsum(sh, axis=0) - sh
    occ = jnp.minimum(cum, 1.0)

    # unshear: occl[m][a] = occ[m] sampled at (a + pa_lo + m*da)
    ua = jnp.arange(A, dtype=f32)[None, :] + f32(pa_lo) + m[:, None] * da
    ub = jnp.arange(B, dtype=f32)[None, :] + f32(pb_lo) + m[:, None] * db
    io = jnp.arange(OA, dtype=f32)
    ip = jnp.arange(OB, dtype=f32)
    wa = jnp.maximum(0.0, 1.0 - jnp.abs(ua[..., None] - io)).astype(bf16)
    wb = jnp.maximum(0.0, 1.0 - jnp.abs(ub[..., None] - ip)).astype(bf16)
    out = jnp.einsum("sao,sop->sap", wa, occ.astype(bf16),
                     preferred_element_type=f32)
    out = jnp.einsum("sap,sbp->sab", out.astype(bf16), wb,
                     preferred_element_type=f32)
    if flip:
        out = out[::-1]
    return jnp.transpose(out, inv)


def shadow_volume(volume, light_dir):
    """Per-voxel shadowing from a directional light (world space).

    Returns f32[Z, Y, X] in the grid's native layout: ~1 where occluded
    along ``light_dir`` toward the light, 0 where directly lit.
    """
    l = np.asarray(light_dir, np.float64)
    l = l / np.linalg.norm(l)
    axis = int(np.argmax(np.abs(l)))
    inv = {0: (2, 1, 0), 1: (2, 0, 1), 2: (0, 2, 1)}[axis]
    ckey = (id(volume), "shadow", axis)
    ent = _LAYOUT_CACHE.get(ckey)
    vol = ent[1] if ent is not None and ent[0] is volume else None
    if vol is None:
        vol_zyx = jnp.asarray(volume, jnp.float32)
        if axis == 0:
            vol = jnp.transpose(vol_zyx, (2, 1, 0))       # (X, Y, Z)
        elif axis == 1:
            vol = jnp.transpose(vol_zyx, (1, 2, 0))       # (Y, X, Z)
        else:
            vol = jnp.transpose(vol_zyx, (0, 2, 1))       # (Z, X, Y)
        vol = jax.block_until_ready(vol)
        _LAYOUT_CACHE[ckey] = (volume, vol)
    sel = _AXIS_SELECTORS[axis]
    l_s = float(l @ sel[0])
    l_a = float(l @ sel[1])
    l_b = float(l @ sel[2])
    # The light VECTOR points toward the light (reference convention:
    # dot(normal, mainLightDir)); light travels along -l. Sweep starts on
    # the light side: high slice indices when l_s > 0.
    flip = l_s > 0
    step_s = -1.0 if flip else 1.0
    # moving one slice along the sweep shifts the shadow footprint by
    # (l_a/l_s, l_b/l_s) * step_s; the resample offset is its negation.
    da = -(l_a / l_s) * step_s
    db = -(l_b / l_s) * step_s
    S = int(vol.shape[0])
    pa_lo = int(math.ceil(max(0.0, -(S - 1) * da)))
    pa_hi = int(math.ceil(max(0.0, (S - 1) * da)))
    pb_lo = int(math.ceil(max(0.0, -(S - 1) * db)))
    pb_hi = int(math.ceil(max(0.0, (S - 1) * db)))
    A, B = int(vol.shape[1]), int(vol.shape[2])
    hkey = ("shadow_hats", S, A, B, round(da, 6), round(db, 6),
            pa_lo, pa_hi, pb_lo, pb_hi)
    hats = _LAYOUT_CACHE.get(hkey)
    if hats is None:
        hats = jax.block_until_ready(
            _shadow_hats(S, A, B, da, db, pa_lo, pa_hi, pb_lo, pb_hi))
        _LAYOUT_CACHE[hkey] = hats
    return _shadow_apply(vol, *hats, bool(flip), inv)


def render_fast_frame(
    volume,          # f32[Z, Y, X]
    shadow_vol,      # f32[Z, Y, X] from shadow_volume(), or None
    grid_origin,
    voxel_size,
    camera_pos,
    view,
    fov_deg: float,
    aspect: float,
    width: int,
    height: int,
    light_dir=(-1.0, -1.0, -1.0),
    base_color=(1.0, 0.8, 0.6),
    ambient=(0.1, 0.1, 0.1),
    inter_h: Optional[int] = None,
    inter_w: Optional[int] = None,
    fused: bool = True,
):
    """Slab-sweep frame with Lambert + shadow shading.

    The fast-path equivalent of render_octree_image (the shade() of
    RayTracerBVH.cpp:331-336 with shadowing): primary visibility from the
    MXU sweep, normals analytic ``normalize(p - voxelCenter)`` exactly as
    RayTracerBVH.cpp:283-287 (at voxel granularity), shadow term carried
    through the sweep as a packed channel. The whole frame performs ONE
    per-pixel gather (the final warp) — per-pixel attribute gathers are the
    dominant device cost on TPU (~8 ns/element), so visibility, depth, and
    shadowing all ride the packed sweep value instead.

    ``fused=True`` runs the frame as a single XLA program; ``fused=False``
    keeps each stage its own program (useful for stage timing). No host
    synchronization either way, so back-to-back frames pipeline.
    """
    axis_world, flip, (S, A, B), eyes, window, crop_lo = _sweep_geometry(
        volume, grid_origin, voxel_size, camera_pos, view
    )
    auto_h, auto_w = _auto_inter(window)
    inter_h = auto_h if inter_h is None else inter_h
    inter_w = auto_w if inter_w is None else inter_w
    vol_bf = _layout_volume(volume, axis_world, flip, S, A, B, crop_lo)
    sp = vol_bf.shape[0]
    origin_c = np.asarray(grid_origin, np.float32) + np.asarray(
        _AXIS_SELECTORS[axis_world][0], np.float32
    ) * (crop_lo * float(voxel_size))
    scal_np = _frame_scalars_np(
        *eyes[:3], eyes[3], *window, fov_deg, aspect, float(voxel_size), S,
        origin_c, np.asarray(camera_pos, np.float32),
        view, light_dir, base_color, ambient,
    )
    scal = jnp.asarray(scal_np)
    warp_cfg = _plan_warp_cfg(scal_np, axis_world, inter_h, inter_w,
                              width, height, for_fused=fused)
    has_shadow = shadow_vol is not None
    sh_arg = shadow_vol if has_shadow else jnp.zeros((1, 1, 1), jnp.float32)

    if fused:
        return _frame_fused(
            vol_bf, sh_arg, scal, sp // 32, S, A, B,
            inter_h, inter_w, bool(flip), axis_world, width, height,
            has_shadow, warp_cfg, crop_lo=crop_lo, s_keep=S,
        )

    shv = _shadow_relayout(sh_arg, axis_world, bool(flip), sp, A, B,
                           crop_lo=crop_lo, s_keep=S) \
        if has_shadow else None
    packed = _sweep_all(
        vol_bf, scal, sp // 32, S, A, B, inter_h, inter_w, bool(flip),
        shadow_sw=shv,
    )
    lin, behind, dirs, d_s_n = _warp_setup(
        scal, axis_world, inter_h, inter_w, width, height
    )
    w_val = _warp_values(packed, lin, inter_h, inter_w, width, height,
                         warp_cfg)
    return _finish_shade(w_val, behind, dirs, d_s_n, scal, width, height,
                         has_shadow)


def _relayout_sweep(sh, axis_world: int, flip: bool, sp: int, a_size: int,
                    b_size: int, crop_lo: int = 0, s_keep: int = 0):
    """(Z, Y, X) -> padded bf16 sweep order; traceable (used in-jit)."""
    if axis_world == 0:
        shv = jnp.transpose(sh, (2, 1, 0))
    elif axis_world == 1:
        shv = jnp.transpose(sh, (1, 2, 0))
    else:
        shv = jnp.transpose(sh, (0, 2, 1))
    if crop_lo or (s_keep and s_keep != shv.shape[0]):
        shv = shv[crop_lo : crop_lo + (s_keep or shv.shape[0])]
    if flip:
        shv = shv[::-1]
    pad = sp - shv.shape[0]
    if pad:
        shv = jnp.concatenate(
            [shv, jnp.zeros((pad, a_size, b_size), shv.dtype)], 0)
    return shv.astype(jnp.bfloat16)


@functools.partial(
    jax.jit, static_argnames=("axis_world", "flip", "sp", "a_size", "b_size",
                              "crop_lo", "s_keep"))
def _shadow_relayout(sh, axis_world: int, flip: bool, sp: int, a_size: int,
                     b_size: int, crop_lo: int = 0, s_keep: int = 0):
    return _relayout_sweep(sh, axis_world, flip, sp, a_size, b_size,
                           crop_lo, s_keep)


@functools.partial(
    jax.jit,
    static_argnames=("n_chunks", "s_valid", "a_size", "b_size", "inter_h",
                     "inter_w", "flip", "axis_world", "width", "height",
                     "has_shadow", "warp_cfg", "crop_lo", "s_keep"),
)
def _frame_fused(vol_bf, shadow_native, scal, n_chunks, s_valid, a_size,
                 b_size, inter_h, inter_w, flip, axis_world, width, height,
                 has_shadow, warp_cfg=None, crop_lo=0, s_keep=0):
    """The whole frame in one XLA program (sweep, Pallas warp, shade).

    With a planned ``warp_cfg`` the entire per-pixel half of the frame
    (ray math + table lookup + shade) runs inside ONE Pallas kernel
    (warp_kernel.warp_frame): the split XLA stages materialize [N, 3]
    f32 intermediates that tile at ~42x their bytes, which made setup and
    shade cost ~as much as the lookup itself. The fallback (no config /
    non-TPU) keeps the reference XLA path.
    """
    shv = _relayout_sweep(shadow_native, axis_world, flip,
                          vol_bf.shape[0], a_size, b_size,
                          crop_lo, s_keep) \
        if has_shadow else None
    packed = _sweep_all(
        vol_bf, scal, n_chunks, s_valid, a_size, b_size, inter_h, inter_w,
        flip, shadow_sw=shv,
    )
    if warp_cfg is not None:
        from ray_tracing_octrees_tpu.trace.warp_kernel import (
            frame_scalars_kernel, split_hi_lo, unpack_frame_rgb, warp_frame,
        )

        ty, tx, win = warp_cfg
        t_hl = split_hi_lo(packed.reshape(inter_h, inter_w))
        kscal = frame_scalars_kernel(scal, axis_world)
        out = warp_frame(t_hl, kscal, ty, tx, win, axis_world,
                         width, height, has_shadow)
        return unpack_frame_rgb(out, width, height)
    lin, behind, dirs, d_s_n = _warp_setup(
        scal, axis_world, inter_h, inter_w, width, height
    )
    w_val = _warp_values(packed, lin, inter_h, inter_w, width, height,
                         warp_cfg)
    return _finish_shade(w_val, behind, dirs, d_s_n, scal, width, height,
                         has_shadow)


@functools.partial(jax.jit, static_argnames=("width", "height", "has_shadow"))
def _finish_shade(w_val, behind, dirs, d_s_n, scal, width: int, height: int,
                  has_shadow: bool):
    """Unpack depth+shadow, reconstruct the hit point, Lambert-shade.

    Normals are normalize(p - voxelCenter) (RayTracerBVH.cpp:283-287) —
    pure per-pixel math, no volume gather.
    """
    f32 = jnp.float32
    eye_s = scal[0]
    voxel_size = scal[10]
    grid_origin = scal[12:15]
    cam_pos = scal[15:18]
    light_dir = scal[34:37]
    base_color = scal[37:40]
    ambient = scal[40:43]

    hit = (w_val >= 0.0) & ~behind
    sh_bit = w_val >= 2048.0
    z_f = jnp.maximum(w_val - jnp.where(sh_bit, 2048.0, 0.0), 0.0)
    t_world = (z_f - eye_s) * voxel_size / d_s_n
    t_world = jnp.where(hit, t_world, 0.0)
    point = cam_pos[None, :] + dirs * t_world[:, None]

    p_in = point + dirs * (0.25 * voxel_size)
    center = grid_origin[None, :] + (
        jnp.floor((p_in - grid_origin[None, :]) / voxel_size) + 0.5
    ) * voxel_size
    nrm = point - center
    nlen = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = nrm / jnp.maximum(nlen, 1e-12)

    l = light_dir / jnp.linalg.norm(light_dir)
    ndotl = jnp.maximum(0.0, -(nrm * l[None, :]).sum(-1))
    color = base_color[None, :] * ndotl[:, None] + ambient[None, :]
    if has_shadow:
        color = jnp.where(sh_bit[:, None], ambient[None, :], color)
    color = jnp.where(hit[:, None], color, 0.0)
    rgba = jnp.concatenate(
        [color, jnp.ones((color.shape[0], 1), f32)], -1)
    return rgba.reshape(height, width, 4)


# --------------------------------------------------------------------------
# Orthographic shadow seed: conservative per-ray prune + start-t for the
# EXACT tracer's shadow bundle. All shadow rays of a directional light are
# parallel, so in a sheared "light space" every ray is a constant (a, b)
# column of one per-scene volume — the same factorization as
# :func:`_shadow_sweep`, but keeping a per-slab candidate BIT FIELD instead
# of cumulative occlusion, and over the DILATED occupancy so the
# sweep_seed conservativeness proof carries over:
#
#   * no set bit ahead of a ray's slab  =>  the ray hits nothing
#     (provably unoccluded, dead at step 0),
#   * the first set bit at travel slab o  =>  the first solid crossing is
#     no earlier than (o - m_p - margin) slabs ahead (a start-t lower
#     bound, skipping the provably-empty lead).
#
# Proof sketch (mirrors sweep_seed): if the ray crosses a solid voxel w in
# travel slab m, the ray's slab-center lateral position is within
# |slope|/2 <= 0.5 of the crossing (the dominant light axis bounds both
# lateral slopes by 1), the crossing within 1 cell of w, the column
# rounding within 0.5, and the shear's bilinear taps within 1 more — every
# tap lies within 3 cells of w, where the radius-3 dilation reads 1, so
# the resampled value is exactly 1 >= 0.5 and bit m is set.
# --------------------------------------------------------------------------


def first_set_from(bits, ptr):
    """Per row: the first set bit index >= ptr, as (has bool[m], o i32[m]).

    bits int32[m, W] little-endian 32-bit words (bit b of word w = slab
    w * 32 + b), ptr i32[m] the first slab still eligible.
    """
    i32 = jnp.int32
    W = bits.shape[1]
    wi = jnp.arange(W, dtype=i32)[None, :]
    wptr = ptr >> 5
    mask_word = jnp.left_shift(i32(-1), ptr & 31)           # bits >= ptr&31
    m = jnp.where(wi > wptr[:, None], bits,
                  jnp.where(wi == wptr[:, None],
                            bits & mask_word[:, None], 0))
    nz = m != 0
    has = nz.any(axis=1)
    fw = jnp.argmax(nz, axis=1).astype(i32)
    word = jnp.where(wi == fw[:, None], m, 0).sum(axis=1)
    lsb = word & -word
    b = i32(31) - jax.lax.clz(lsb)
    o = fw * 32 + jnp.maximum(b, 0)
    return has, o


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["bits2d"],
    meta_fields=["axis_world", "flip", "da", "db", "pa_lo", "pb_lo",
                 "S", "OA", "OB", "d_s_abs"],
)
@dataclasses.dataclass(frozen=True)
class ShadowSeed:
    """Per-(scene, light) sheared candidate bit field (see module note).

    Registered as a pytree (geometry fields are static metadata) so it can
    cross jit boundaries — e.g. as render_octree_image's ``shadow_seed``."""

    bits2d: jax.Array   # i32[OA * OB, C] travel-slab candidate words
    axis_world: int     # dominant |D| axis of the shadow direction (xyz)
    flip: bool          # True when the shadow direction descends the axis
    da: float           # lateral drift (a axis) per +1 travel slab
    db: float
    pa_lo: int
    pb_lo: int
    S: int              # travel-slab count (sweep extent of the volume)
    OA: int
    OB: int
    d_s_abs: float      # |D_s| of the UNIT shadow direction (world)


def build_shadow_seed(volume_dilated, to_light) -> ShadowSeed:
    """Build the seed for shadow rays travelling TOWARD ``to_light``.

    volume_dilated: from :func:`dilate_occupancy` (radius-3 padded).
    Once per (scene, light) — like :func:`shadow_volume`.
    """
    f32 = jnp.float32
    D = np.asarray(to_light, np.float64)
    D = D / np.linalg.norm(D)
    axis_world = int(np.argmax(np.abs(D)))
    sel = _AXIS_SELECTORS[axis_world]
    d_s = float(D @ np.asarray(sel[0], np.float64))
    d_a = float(D @ np.asarray(sel[1], np.float64))
    d_b = float(D @ np.asarray(sel[2], np.float64))
    flip = d_s < 0.0
    da = d_a / abs(d_s)   # per +1 slab along the travel direction
    db = d_b / abs(d_s)

    vol_zyx = jnp.asarray(volume_dilated, f32)
    if axis_world == 0:
        vol = jnp.transpose(vol_zyx, (2, 1, 0))
    elif axis_world == 1:
        vol = jnp.transpose(vol_zyx, (1, 2, 0))
    else:
        vol = jnp.transpose(vol_zyx, (0, 2, 1))
    S, A, B = vol.shape
    vols = vol[::-1] if flip else vol      # vols[m] = slab at travel step m

    pa_lo = int(math.ceil((S - 1) * max(da, 0.0))) + 1
    pa_hi = int(math.ceil((S - 1) * max(-da, 0.0))) + 1
    pb_lo = int(math.ceil((S - 1) * max(db, 0.0))) + 1
    pb_hi = int(math.ceil((S - 1) * max(-db, 0.0))) + 1
    # column coordinate of lateral a at travel step m: o = a - m*da + pa_lo
    # (constant along a ray) — _shadow_hats' sign convention needs -da.
    ma, mb, _, _ = _shadow_hats(S, A, B, -da, -db, pa_lo, pa_hi, pb_lo, pb_hi)
    sh = jnp.einsum("soa,sab->sob", ma, vols.astype(jnp.bfloat16),
                    preferred_element_type=f32)
    sh = jnp.einsum("sob,spb->sop", sh.astype(jnp.bfloat16), mb,
                    preferred_element_type=f32)   # [S, OA, OB]
    hits = sh >= 0.5
    OA, OB = hits.shape[1], hits.shape[2]
    C = -(-S // 32)
    pad = C * 32 - S
    if pad:
        hits = jnp.concatenate(
            [hits, jnp.zeros((pad, OA, OB), bool)], axis=0)
    hb = hits.reshape(C, 32, OA, OB).astype(jnp.int32)
    shifts = jnp.arange(32, dtype=jnp.int32)[None, :, None, None]
    words = (hb << shifts).sum(axis=1)             # [C, OA, OB]
    bits2d = jnp.transpose(words, (1, 2, 0)).reshape(OA * OB, C)
    return ShadowSeed(
        bits2d=jax.block_until_ready(bits2d),
        axis_world=axis_world, flip=bool(flip), da=float(da), db=float(db),
        pa_lo=pa_lo, pb_lo=pb_lo, S=S, OA=OA, OB=OB, d_s_abs=abs(d_s),
    )


def query_shadow_seed(seed: ShadowSeed, shadow_o, grid_origin, voxel_size):
    """Conservative (live bool[N], t_start f32[N]) for shadow origins.

    ``grid_origin``/``voxel_size`` are the ORIGINAL grid's (the dilation
    pad shift happens here, as in sweep_seed). live=False PROVES the ray
    hits nothing; t_start lower-bounds the first-hit t. Out-of-field rays
    conservatively stay live with t_start 0.
    """
    f32 = jnp.float32
    i32 = jnp.int32
    vs = jnp.asarray(voxel_size, f32)
    origin_p = (jnp.asarray(grid_origin, f32)
                - jnp.float32(SEED_DILATION) * vs)
    pv = (shadow_o - origin_p[None, :]) / vs       # dilated-volume voxels
    ax = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}[seed.axis_world]
    s_p = pv[:, ax[0]]
    a_p = pv[:, ax[1]]
    b_p = pv[:, ax[2]]
    m_p = (f32(seed.S) - s_p) if seed.flip else s_p
    col_a = jnp.round(a_p - m_p * f32(seed.da) + f32(seed.pa_lo)).astype(i32)
    col_b = jnp.round(b_p - m_p * f32(seed.db) + f32(seed.pb_lo)).astype(i32)
    in_range = ((col_a >= 0) & (col_a < seed.OA)
                & (col_b >= 0) & (col_b < seed.OB)
                & (m_p < f32(seed.S)))
    row = jnp.clip(col_a * seed.OB + col_b, 0, seed.OA * seed.OB - 1)
    words = seed.bits2d[row]                       # [N, C] row gather
    m_lo = jnp.clip(jnp.floor(m_p).astype(i32) - 1, 0, seed.S)
    has, o = first_set_from(words, m_lo)
    live = has | ~in_range
    # entry of the candidate slab minus a full-slab cushion, in world t
    t_seed = (o.astype(f32) - m_p - 1.25) * vs / f32(seed.d_s_abs)
    t_seed = jnp.where(has & in_range, jnp.maximum(t_seed, 0.0), 0.0)
    return live, t_seed
