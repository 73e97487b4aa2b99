"""Grid-wavefront triangle tracer for extracted Marching-Cubes meshes.

The production ray-*triangle* path for BASELINE configs[3] ("extracted MC
mesh -> trace 1080p primary+shadow"), replacing per-ray BVH traversal —
which on TPU is gather-bound at the ~8 ns/element scalar rate (see
trace/lbvh.py, kept as the exact general-mesh tracer and as this module's
test oracle) — with dense MXU work end to end.

Key insight: over a *binary* occupancy grid the reference's localMC
(OctreeVoxel.cpp:780-879) maps FILLED -> -1, EMPTY -> +1 with iso 0, so
every MC vertex is an exact cell-edge *midpoint* and the triangle set
within a cell is a pure function of its 8-bit corner case. The whole mesh
is therefore "the case grid + one 256-entry table", and ray-triangle
tracing factors into:

  1. a DETECTION slab sweep (the MXU shear-warp machinery of
     trace/slab_sweep.py, separable weighted 3-tap hats) that records,
     per table texel, a per-slab BIT field of exactly the slabs where the
     ray's lateral footprint contains a surface cell;
  2. per consumed crossing, a 3-element fetch from a {1,256,65536}-packed
     case volume (9 footprint cells' cases) and a one-hot
     [rays * k, 256] x [256, 45] MXU contraction fetching those cells'
     <= 5 triangles each (exact: one-hot weights and midpoint
     coordinates are both exact in bf16);
  3. exact Moller-Trumbore tests of the texel ray against those
     triangles (VPU elementwise);
  4. miss-continuation rounds: rays that crossed a surface cell without
     striking its triangles advance to their next stored crossing, until
     every ray resolves or the unresolved count drops below a tolerance.
     The sweep runs ONCE per frame — the bit field is exhaustive at slab
     granularity — and the rounds run on a compaction ladder: survivors
     (which decay ~2x per round) iterate at the narrowest row count that
     fits them (cheap row gathers off the row-major field).

This is the wavefront formulation of the reference's per-pixel traversal
loop (RayTracerBVH.cpp:239-327's octree walk, done here at triangle
exactness): the "ray queue" is the per-texel (prev, resolved) state, the
slab tests ride the sweep, and the intersection is genuine per-ray
Moller-Trumbore against the extracted mesh's triangles.

Known approximation (measured by tests/test_mesh_grid.py against the
exact LBVH tracer on identical rays): each sweep slab samples the ray's
*nearest* cell at the slab center, so a ray grazing through the corner of
a neighboring surface cell within one slab can skip it — silhouette-edge
texels only; everything the tracer does report is an exact triangle hit.

Pixel mapping: rays are the sheared-table texel rays (eye through texel
centers of the reference plane); pixels take their nearest texel's result
through the Pallas one-hot warp (trace/warp_kernel.py), with hit
distances carried at full f32 precision via the 3-plane split and shaded
colors as exact 24-bit packed RGB.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_octrees_tpu.ops import mc_tables as t
from ray_tracing_octrees_tpu.trace.slab_sweep import (
    first_set_from,
    _AXIS_SELECTORS,
    _frame_scalars_np,
    _layout_volume,
    _plan_warp_cfg,
    _sweep_geometry,
    _warp_setup,
    _SCAL_N,
)

_BIG = jnp.float32(3.0e38)


# --------------------------------------------------------------------------
# Case -> triangle tables (cell-local midpoint vertices)
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _case_tables_np() -> Tuple[np.ndarray, np.ndarray]:
    """(verts f32[256, 5, 3, 3] cell-local xyz in {0, .5, 1}, counts i32[256]).

    Padding triangles (beyond TRI_COUNTS[case]) collapse to a single point
    (edge 0's midpoint), giving det == 0 in Moller-Trumbore — never a hit.
    """
    off = np.asarray(t.CORNER_OFFSETS, np.float32)        # [8, 3] (x, y, z)
    mid = (off[t.EDGE_CORNERS[:, 0]] + off[t.EDGE_CORNERS[:, 1]]) * 0.5
    verts = mid[t.TRI_EDGES]                              # [256, 5, 3, 3]
    return verts, np.asarray(t.TRI_COUNTS, np.int32)


def case_triangle_table() -> jax.Array:
    """Device copy of the cell-local triangle table, f32[256, 45]."""
    verts, _ = _case_tables_np()
    return jnp.asarray(verts.reshape(256, 45))


# --------------------------------------------------------------------------
# Scene preparation
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MCMeshScene:
    """Traceable form of an extracted MC mesh: the case grid + tables."""

    case_vol: jax.Array          # f32[Zc, Yc, Xc]; case id where 1..254, else 0
    shadow_cell: Optional[jax.Array]  # f32[Zc, Yc, Xc] per-cell shadow term
    origin: jax.Array            # f32[3] world min corner (== grid origin)
    voxel_size: float


def _cell_case_grid(occ: jax.Array) -> jax.Array:
    """8-bit MC case per cell (the classification of _mc_classify)."""
    from ray_tracing_octrees_tpu.ops.marching_cubes import _cell_cases

    return _cell_cases(occ > 0)


def prepare_mc_scene(occ, grid_origin, voxel_size,
                     to_light=None) -> MCMeshScene:
    """Bind a binary occupancy grid's implied MC mesh for tracing.

    ``to_light``: optional world-space direction TOWARD the light; when
    given, a per-cell shadow term (cumulative occlusion along the light,
    trace/slab_sweep.py shadow_volume) rides the sweep so the image path
    shades shadows without per-pixel volume gathers.
    """
    case = _cell_case_grid(jnp.asarray(occ))
    ntri = jnp.asarray(t.TRI_COUNTS)[case]
    case_vol = jnp.where(ntri > 0, case, 0).astype(jnp.float32)
    shadow_cell = None
    if to_light is not None:
        from ray_tracing_octrees_tpu.trace.slab_sweep import shadow_volume

        sv = shadow_volume((jnp.asarray(occ) > 0).astype(jnp.float32), to_light)
        zc, yc, xc = case_vol.shape
        shadow_cell = sv[:zc, :yc, :xc]
    return MCMeshScene(
        case_vol=jax.block_until_ready(case_vol),
        shadow_cell=shadow_cell,
        origin=jnp.asarray(grid_origin, jnp.float32),
        voxel_size=float(voxel_size),
    )


# --------------------------------------------------------------------------
# Constrained nearest-cell sweep (one round)
# --------------------------------------------------------------------------


def _build_detect_hats(scal, sp: int, s_valid: int, a_size: int,
                       b_size: int, inter_h: int, inter_w: int, flip: bool):
    """Per-frame 3-tap NEIGHBOR-MASK hats + exact footprint masks.

    The round-2 sweep carried three packed case channels (lo/hi/center
    footprint hats, {1, 256, 65536} b-weights) — three full einsum chains
    per chunk, ~203 ms/frame on Calgary. Detection and fetch are now
    split; detection must be both CHEAP (one einsum chain, ~22 ms
    measured, tools/exp_detect_sweep.py) and EXACT (a box-dilated test
    fires a candidate whenever ANY of the 3x3 box is surface, and every
    false candidate costs a full Moller-Trumbore consume round — measured
    as the dominant frame cost).

    Both at once via a separable bitmask: the mask weight of lateral
    offset (da, db) is 8^(da+1) * 2^(db+1), so a single einsum chain with
    3-tap a-hats weighted {1, 8, 64} and b-hats weighted {1, 2, 4}
    (powers of two, bf16-exact; per-tap partial sums <= 73 < 2^8,
    bf16-exact; f32 accumulation, total <= 511) samples

        mask[o, texel] = sum_(da, db) 2^((da+1)*3 + db+1)
                         * occupied(ca + da, cb + db)

    — the full 3x3 neighborhood occupancy as 9 bits. The rank logic then
    tests it against the texel's exact footprint mask fm (also separable:
    A_mask * B_mask below), firing only when a cell the ray ACTUALLY
    crosSES in that slab is surface.

    Returns (ma_w bf16[sp, IH, A], mb_w bf16[sp, IW, B],
    am f32[sp, IH], bm f32[sp, IW]) where am/bm are the per-(slab, texel)
    footprint factor masks: am = 8 + (lo_a <= -1) + 64 * (hi_a >= 1) with
    lo/hi = floor(pa -+ half_a) - floor(pa) (in {-1, 0} / {0, 1} while
    |slope| <= 2), and fm = am * bm (disjoint bits, exact int product).
    """
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    eye_s, eye_a, eye_b, z0 = scal[0], scal[1], scal[2], scal[3]
    a_min, a_max, b_min, b_max = scal[4], scal[5], scal[6], scal[7]

    ua = a_min + (a_max - a_min) * (jnp.arange(inter_h, dtype=f32) + 0.5) / inter_h
    ub = b_min + (b_max - b_min) * (jnp.arange(inter_w, dtype=f32) + 0.5) / inter_w
    o_all = jnp.arange(sp, dtype=f32)
    k_all = (f32(s_valid) - 1.0 - o_all) if flip else o_all
    s_all = (z0 - eye_s) / (k_all + 0.5 - eye_s)
    pa_all = (ua[None, :] - eye_a) / s_all[:, None] + eye_a     # [sp, IH]
    pb_all = (ub[None, :] - eye_b) / s_all[:, None] + eye_b     # [sp, IW]
    half_a = 0.5 * jnp.abs((ua - eye_a) / (z0 - eye_s))         # [IH]
    half_b = 0.5 * jnp.abs((ub - eye_b) / (z0 - eye_s))         # [IW]

    def taps(p_all, size, w3):
        d = p_all[..., None] - jnp.arange(size, dtype=f32)
        m = jnp.zeros(d.shape, bf16)
        for off, w in zip((-1.0, 0.0, 1.0), w3):
            m = m + bf16(w) * ((d + off >= 0) & (d + off < 1)).astype(bf16)
        return m

    ma_w = taps(pa_all, a_size, (1.0, 8.0, 64.0))
    mb_w = taps(pb_all, b_size, (1.0, 2.0, 4.0))

    def fmask(p_all, half, base, wlo, whi):
        lo = jnp.floor(p_all - half[None, :]) - jnp.floor(p_all)
        hi = jnp.floor(p_all + half[None, :]) - jnp.floor(p_all)
        return (base + wlo * (lo <= -1.0).astype(f32)
                + whi * (hi >= 1.0).astype(f32))

    am = fmask(pa_all, half_a, 8.0, 1.0, 64.0)
    bm = fmask(pb_all, half_b, 2.0, 1.0, 4.0)
    return ma_w, mb_w, am, bm


def _detect_volume(case_sw: jax.Array) -> jax.Array:
    """Binarized case volume (0/1 bf16) in sweep layout [sp, A, B].

    Sampled by the 3-tap mask hats of :func:`_build_detect_hats`; the
    mask/footprint test replaces the round-2 lateral 3x3 DILATION (which
    detected box-conservatively and flooded the consume rounds with false
    candidates)."""
    return (case_sw > 0).astype(jnp.bfloat16)


def _build_packed_cases(case_sw: jax.Array) -> jax.Array:
    """{1, 256, 65536}-packed a-triples of the sweep-layout case volume.

    pk[o, a, b] = case[o, a-1, b] + 256*case[o, a, b]
                + 65536*case[o, a+1, b]  (zeros past the a edges), f32 —
    every value < 2^24, exactly representable. One element fetched at
    (o, a, b) yields the full a-triple of cases; the b-triple comes from
    the flat layout's b-adjacency (idx - 1, idx, idx + 1). Returned
    flattened [sp * A * B].
    """
    cs = case_sw.astype(jnp.float32)
    z = jnp.zeros_like(cs[:, :1])
    am1 = jnp.concatenate([z, cs[:, :-1]], axis=1)    # case at a-1
    ap1 = jnp.concatenate([cs[:, 1:], z], axis=1)     # case at a+1
    return (am1 + 256.0 * cs + 65536.0 * ap1).reshape(-1)


def _build_packed_cases4(case_sw: jax.Array) -> jax.Array:
    """Byte-packed 2x2 windows of the sweep-layout case volume, u32.

    pk4[o, a, b] = case(a, b) | case(a, b+1) << 8
                 | case(a+1, b) << 16 | case(a+1, b+1) << 24
    (zeros past the a/b edges). At ``kcells == 4`` (|slope| <= 1 poses)
    the ray's exact in-slab footprint cells {fa0, fa1} x {fb0, fb1} with
    fa1 - fa0, fb1 - fb0 in {0, 1} all sit inside the 2x2 window based at
    (fa0, fb0), so ONE u32 gather replaces the a-triple form's THREE f32
    gathers (:func:`_build_packed_cases`) plus its 3x3 -> slot one-hot
    select. Testing the full window is exact: MC triangles are cell-local
    and any genuine ray/triangle intersection inside slab o lies in a cell
    the ray's footprint crosses, so non-footprint window cells can never
    produce a hit. Returned flattened [sp * A * B].
    """
    cs = case_sw.astype(jnp.uint32)
    zb = jnp.zeros_like(cs[:, :, :1])
    c01 = jnp.concatenate([cs[:, :, 1:], zb], axis=2)     # case at b+1
    za = jnp.zeros_like(cs[:, :1, :])
    c10 = jnp.concatenate([cs[:, 1:, :], za], axis=1)     # case at a+1
    c11 = jnp.concatenate([c01[:, 1:, :], za], axis=1)    # case at a+1,b+1
    return (cs | (c01 << 8) | (c10 << 16) | (c11 << 24)).reshape(-1)



# The candidate field is a per-slab BIT field: bit o of word [N, o // 32]
# is "the ray's exact footprint in slab o contains a surface cell". It is
# trivially EXHAUSTIVE (one bit per slab), consumption order is the exact
# slab order (no subchunk rank approximation), and memory is N * sp / 8
# bytes (Calgary sp=256 at 1024^2 texels: 32 MB — the round-2 field was
# 4 GB of packed f32 channels). Selection is find-first-set >= ptr —
# a [N, sp/32] scan instead of the old [N, C] f32 masked reduction.
_MT_EPS = 1e-7


def exact_tap_words(sl, ma, mb, wide: bool):
    """Bit-exact weighted tap words det[c, h, w] = sum occ * wa * wb.

    ``wide`` (5-tap axes, weights to 4096): the a-contraction's partial
    sums reach 4681 — beyond bf16's 8-bit mantissa — and an einsum whose
    OTHER operand is bf16 silently demotes an f32 operand back to bf16
    (measured: hb 4105 -> 4096 inside the round-3 "exact_acc" path, the
    root cause of a ~0.1% candidate-field leak on Calgary that round-5
    found via the fast-exact frame's parity ensemble). The exact form
    splits the tap weights into two chains whose sums stay < 256
    (bf16-exact integers), contracts each in bf16, and recombines in
    f32: det = detL + 512 * detH — every partial value exact.
    """
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    if not wide:
        hb = jnp.einsum("cab,cha->cbh", sl, ma, preferred_element_type=bf16)
        return jnp.einsum("cbh,cwb->chw", hb, mb, preferred_element_type=f32)
    ma_f = ma.astype(f32)
    ma_lo = jnp.where(ma_f < 512.0, ma, 0).astype(bf16)
    ma_hi = jnp.where(ma_f >= 512.0, ma_f * (1.0 / 512.0), 0).astype(bf16)
    hbL = jnp.einsum("cab,cha->cbh", sl, ma_lo, preferred_element_type=bf16)
    hbH = jnp.einsum("cab,cha->cbh", sl, ma_hi, preferred_element_type=bf16)
    detL = jnp.einsum("cbh,cwb->chw", hbL, mb, preferred_element_type=f32)
    detH = jnp.einsum("cbh,cwb->chw", hbH, mb, preferred_element_type=f32)
    return detL + 512.0 * detH


def _sweep_candidates(detect_sw, hats, n_chunks: int,
                      s_valid: int, a_size: int, b_size: int,
                      inter_h: int, inter_w: int, flip: bool,
                      exact_acc: bool = False):
    """ONE detection sweep builds the whole frame's candidate field.

    A texel's ray moves laterally by a CONSTANT (slope_a, slope_b) =
    ((ua - eye_a), (ub - eye_b)) / (z0 - eye_s) voxels per slab (pa is
    linear in s for a fixed texel), so within one slab its footprint is
    the cell interval [pa - slope_a/2, pa + slope_a/2] per axis — at most
    the 3 cells {floor(lo), floor(center), floor(hi)} while |slope| <= 2
    (the residue above that is silhouette-edge texels of near-degenerate
    sweep axes; tests measure it). Detection samples the 9-bit 3x3
    neighborhood-occupancy MASK via one einsum chain of separable
    weighted 3-tap hats (:func:`_build_detect_hats`) and fires exactly
    when a cell INSIDE the footprint interval is surface — false box
    candidates (the dominant consume-round cost) never enter the field.
    The round-2 sweep instead carried the 9 footprint CASES as three
    24-bit packed channels (~203 ms/frame on Calgary vs 22 ms measured
    for the one-chain form, tools/exp_detect_sweep.py); cases are now
    fetched per CONSUMED candidate from the packed case volume
    (:func:`_build_packed_cases`) inside ``slab_pass``.

    The field is a per-slab bit field: bit (o & 31) of word [texel,
    o >> 5] says slab o's exact footprint contains a surface cell — one
    sweep stores EVERY crossing of every ray at exact slab granularity,
    so the Moller-Trumbore rounds consume it without ever re-sweeping.
    Returns bits int32[N, n_chunks]; row-major so straggler compaction is
    a cheap row gather.
    """
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    CH = 32
    N = inter_h * inter_w
    ma_w, mb_w, am_f, bm_f = hats

    def chunk(ci, bits):
        # einsum order per slab_sweep._sweep_all: the a-contraction emits
        # [c, b, h] so thin lateral axes (Calgary B = 29) pad to 8
        # SUBLANES instead of 128 LANES (4.4x MXU waste measured).
        ma = jax.lax.dynamic_slice_in_dim(ma_w, ci * CH, CH, 0)
        mb = jax.lax.dynamic_slice_in_dim(mb_w, ci * CH, CH, 0)
        sl = jax.lax.dynamic_slice_in_dim(detect_sw, ci * CH, CH, 0)
        amc = jax.lax.dynamic_slice_in_dim(am_f, ci * CH, CH, 0)
        bmc = jax.lax.dynamic_slice_in_dim(bm_f, ci * CH, CH, 0)
        det = exact_tap_words(sl, ma, mb, exact_acc)

        # 9-bit neighborhood mask AND the exact separable footprint mask
        fm = (amc[:, :, None] * bmc[:, None, :]).astype(jnp.int32)
        hits = (det.astype(jnp.int32) & fm) != 0            # [CH, IH, IW]

        word = jnp.zeros((inter_h, inter_w), jnp.int32)
        for k in range(CH):
            word = word | (hits[k].astype(jnp.int32) << k)
        return jax.lax.dynamic_update_slice(
            bits, word.reshape(N, 1), (0, ci))

    return jax.lax.fori_loop(0, n_chunks, chunk,
                             jnp.zeros((N, n_chunks), jnp.int32))


_first_set_from = first_set_from  # moved to slab_sweep (shared with the
# orthographic shadow seed); kept under its historical local name.


@functools.lru_cache(maxsize=1)
def _mt_selectors_np():
    """0/1 selector matrices that run the MT lane contractions on the MXU.

    The naive contraction ``(fk[:, :90].reshape(-1, 6, 15) * qa[:, :,
    None]).sum(1)`` pads its tiny last axis 15 -> 128 lanes on the VPU
    (measured ~9-49 ns/row isolated, `tools/exp_mt_forms.py`); the same
    math as two selector matmuls — expand qa to lane space (``qa @ R``)
    and block-reduce (``(fk * qe) @ G``) — runs at ~4 ns/row with
    bit-identical triangle selection (products are exact f32 under
    HIGHEST precision; sums reassociate by <= 1 ulp).

    Returns (R [6,90], G [90,15], R2 [4,20], G2 [20,5], K5 [5,15],
    H [15,3]) — the last two expand a 5-way triangle select to the
    15-lane normal block and reduce it to 3 components.
    """
    R = np.zeros((6, 90), np.float32)
    for i in range(6):
        R[i, i * 15:(i + 1) * 15] = 1.0
    G = np.zeros((90, 15), np.float32)
    for i in range(6):
        for j in range(15):
            G[i * 15 + j, j] = 1.0
    R2 = np.zeros((4, 20), np.float32)
    for i in range(4):
        R2[i, i * 5:(i + 1) * 5] = 1.0
    G2 = np.zeros((20, 5), np.float32)
    for i in range(4):
        for j in range(5):
            G2[i * 5 + j, j] = 1.0
    K5 = np.zeros((5, 15), np.float32)
    for t in range(5):
        K5[t, t * 3:t * 3 + 3] = 1.0
    H = np.zeros((15, 3), np.float32)
    for t in range(5):
        for c in range(3):
            H[t * 3 + c, c] = 1.0
    return R, G, R2, G2, K5, H


@functools.lru_cache(maxsize=4)
def _mt_const_np(axis_world: int) -> np.ndarray:
    """[256, 128] packed Moller-Trumbore dot-constant table (bf16-exact).

    With the ray in CELL-LOCAL sweep coordinates (ro' = ro_sab - cell,
    w = ro' x rd) every MT quantity is a dot of a per-(case, triangle)
    constant with a per-row q-vector (standard triple-product
    identities)::

        det     = rd . (e2 x e1)
        u * det = e2 . w  - rd . (e2 x v0)
        v * det = -e1 . w - rd . (v0 x e1)
        t * det = n . ro' - n . v0            (n = e1 x e2)

    so the whole 5-triangle MT for one cell is ONE one-hot MXU fetch of
    this table plus a 6-term weighted lane sum — no [m, K, 3, 3]
    geometry intermediates (those tile at ~40x their bytes on TPU).
    Lane layout:

    - 0..89    six 15-lane j-blocks (j = rd_s, rd_a, rd_b, w_s, w_a,
               w_b), each block det*5 | ud*5 | vd*5
    - 90..109  four 5-lane j-blocks (j = ro'_s, ro'_a, ro'_b, 1): td*5
    - 110..124 n[tri * 3 + comp] (unnormalized cross(e1, e2))

    Every entry is a multiple of 1/8 bounded by ~3 — EXACT in bf16
    (asserted), so the bf16 one-hot fetch reproduces the constants
    bit-exactly. Triangle vertices are the same case table as the
    geometric path, permuted xyz -> (s, a, b) for ``axis_world``.
    """
    verts, _ = _case_tables_np()                    # [256, 5, 3, 3] xyz
    perm = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}[axis_world]
    v = verts[..., perm].astype(np.float64)         # (s, a, b) coords
    v0, v1, v2 = v[:, :, 0], v[:, :, 1], v[:, :, 2]
    e1 = v1 - v0
    e2 = v2 - v0
    n = np.cross(e1, e2)
    k_det = np.cross(e2, e1)
    k_u_rd = -np.cross(e2, v0)
    k_u_w = e2
    k_v_rd = -np.cross(v0, e1)
    k_v_w = -e1
    k_t_ro = n
    k_t_1 = -(n * v0).sum(-1)

    tab = np.zeros((256, 128), np.float64)
    for j in range(3):                              # rd j-blocks
        b = j * 15
        tab[:, b:b + 5] = k_det[..., j]
        tab[:, b + 5:b + 10] = k_u_rd[..., j]
        tab[:, b + 10:b + 15] = k_v_rd[..., j]
    for j in range(3):                              # w j-blocks
        b = (3 + j) * 15
        tab[:, b + 5:b + 10] = k_u_w[..., j]
        tab[:, b + 10:b + 15] = k_v_w[..., j]
    for j in range(3):                              # ro' j-blocks (td)
        tab[:, 90 + j * 5:95 + j * 5] = k_t_ro[..., j]
    tab[:, 105:110] = k_t_1
    for t in range(5):
        tab[:, 110 + t * 3:113 + t * 3] = n[:, t]

    rt = tab.astype(jnp.bfloat16).astype(np.float64)
    if not np.array_equal(rt, tab):
        raise AssertionError("MT dot-constant table not bf16-exact")
    return tab.astype(jnp.bfloat16)


@functools.partial(
    jax.jit,
    static_argnames=("n_chunks", "s_valid", "a_size", "b_size", "inter_h",
                     "inter_w", "flip", "axis_world", "max_rounds",
                     "tol_texels", "has_shadow", "kcells", "ladder"),
)
def _trace_texels(case_sw, shadow_sw, scal,
                  n_chunks: int, s_valid: int, a_size: int, b_size: int,
                  inter_h: int, inter_w: int, flip: bool, axis_world: int,
                  max_rounds: int, tol_texels: int, has_shadow: bool,
                  kcells: int = 9, ladder=None):
    """Full texel-space trace: rounds of (slot sweep + chained MT passes).

    Each round: one sweep collects up to _SLOTS candidate slabs per texel;
    the slabs are then resolved IN ORDER by cheap one-hot fetch + exact
    Moller-Trumbore passes (top-2 nonzero footprint cells per slab). A
    slot's result only stands if every earlier slot of the round missed
    AND had no untested candidates hiding behind it (subchunk `extra` bit,
    third-cell `dropped` bit); otherwise the texel re-enters the next
    round from the failed slab, preserving exact first-hit order.

    Returns dict of per-texel arrays (flattened [IH*IW]): hit, t (world),
    normal [N,3], point, shadow, case, tri, rounds, unresolved, ray_o/d.
    """
    f32 = jnp.float32
    IH, IW = inter_h, inter_w
    N = IH * IW
    eye_s, eye_a, eye_b, z0 = scal[0], scal[1], scal[2], scal[3]
    a_min, a_max, b_min, b_max = scal[4], scal[5], scal[6], scal[7]
    voxel_size = scal[10]
    grid_origin = scal[12:15]
    cam_pos = scal[15:18]

    sel = _AXIS_SELECTORS[axis_world]
    sel_s = jnp.asarray(sel[0], f32)
    sel_a = jnp.asarray(sel[1], f32)
    sel_b = jnp.asarray(sel[2], f32)

    # Texel rays: eye -> reference-plane texel center (world space).
    ua = a_min + (a_max - a_min) * (jnp.arange(IH, dtype=f32) + 0.5) / IH
    ub = b_min + (b_max - b_min) * (jnp.arange(IW, dtype=f32) + 0.5) / IW
    uag, ubg = jnp.meshgrid(ua, ub, indexing="ij")      # [IH, IW]
    uaf = uag.reshape(-1)
    ubf = ubg.reshape(-1)
    p_ref_vox = (z0 * sel_s[None, :]
                 + uaf[:, None] * sel_a[None, :]
                 + ubf[:, None] * sel_b[None, :])
    p_ref_world = grid_origin[None, :] + p_ref_vox * voxel_size
    ro = jnp.broadcast_to(cam_pos[None, :], (N, 3))
    rd = p_ref_world - ro                               # unnormalized
    rd_len = jnp.linalg.norm(rd, axis=-1)
    # the same ray in sweep (s, a, b) voxel coordinates: MT runs there
    # (cells are unit cubes; t is parametrization-identical)
    ro_sab = jnp.stack([jnp.broadcast_to(eye_s, (N,)),
                        jnp.broadcast_to(eye_a, (N,)),
                        jnp.broadcast_to(eye_b, (N,))], 1)
    rd_sab = jnp.stack([jnp.broadcast_to(z0 - eye_s, (N,)),
                        uaf - eye_a, ubf - eye_b], 1)

    # per-texel lateral half-spans (constant along the ray)
    half_a = 0.5 * jnp.abs((uaf - eye_a) / (z0 - eye_s))
    half_b = 0.5 * jnp.abs((ubf - eye_b) / (z0 - eye_s))

    # round-invariant detection hats + derived volumes, hoisted out of
    # the round loop (all camera-dependent but ROUND-invariant)
    hats = _build_detect_hats(scal, case_sw.shape[0], s_valid, a_size,
                              b_size, IH, IW, flip)
    detect_sw = _detect_volume(case_sw)
    pk = (_build_packed_cases4(case_sw) if kcells == 4
          else _build_packed_cases(case_sw))
    npk = pk.shape[0]

    det_sign = -1.0 if axis_world == 1 else 1.0

    cand_bits = _sweep_candidates(
        detect_sw, hats, n_chunks, s_valid, a_size, b_size, IH, IW, flip,
    )
    case_iota = jnp.arange(256, dtype=jnp.int32)
    mtc = jnp.asarray(_mt_const_np(axis_world))         # [256, 128] bf16

    def slab_pass(o_j, geo):
        """Resolve one candidate slab per row: packed case fetch + exact MT.

        Returns (anyhit, t_min (|rd| units), normal_sab [m,3], wcase,
        wtri, wca, wcb). A Pallas realization of this pass (MXU one-hot
        case fetch in VMEM) measured 186 ms/Mrow against this form's
        ~70 ns/row and was removed — the dot-constant MT plus packed
        gathers is the faster mapping on v5e (git history:
        trace/mesh_round_kernel.py)."""
        uaf_, ubf_, half_a_, half_b_, ro_sab_, rd_sab_, _ = geo
        k = (f32(s_valid) - 1.0 - o_j) if flip else o_j
        s_scale = (z0 - eye_s) / (k + 0.5 - eye_s)
        pa = (uaf_ - eye_a) / s_scale + eye_a
        pb = (ubf_ - eye_b) / s_scale + eye_b
        ca = jnp.floor(pa)
        cb = jnp.floor(pb)

        if kcells == 4:
            # |slope| <= 1: the footprint's corner cells {fa0, fa1} x
            # {fb0, fb1} sit inside the 2x2 window at (fa0, fb0); ONE u32
            # gather from the byte-packed windows fetches all 4 cases
            # (see _build_packed_cases4 — testing the whole window is
            # exact). Clipping the base keeps every IN-RANGE footprint
            # cell covered; out-of-range cells are empty anyway.
            fa0 = jnp.clip(jnp.floor(pa - half_a_), 0.0, f32(a_size - 2))
            fb0 = jnp.clip(jnp.floor(pb - half_b_), 0.0, f32(b_size - 2))
            fi4 = ((o_j * a_size + fa0) * b_size + fb0).astype(jnp.int32)
            p4 = jnp.take(pk, jnp.clip(fi4, 0, npk - 1))
            slot_list = []
            for j, (da, db) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
                cse = ((p4 >> (8 * j)) & jnp.uint32(0xFF)).astype(jnp.int32)
                slot_list.append((cse, fa0 + da, fb0 + db))
        else:
            fi = ((o_j * a_size + ca) * b_size + cb).astype(jnp.int32)

            def fetch(off):
                v = jnp.take(pk, jnp.clip(fi + off, 0, npk - 1))
                ok = (cb + off >= 0) & (cb + off <= b_size - 1)
                return jnp.where(ok, v, 0.0)

            def unpack3(p):
                c_ap1 = jnp.floor(p / 65536.0)
                r = p - c_ap1 * 65536.0
                c_a = jnp.floor(r / 256.0)
                return r - c_a * 256.0, c_a, c_ap1  # cases at a-1, a, a+1

            u3 = [unpack3(fetch(off)) for off in (-1, 0, 1)]    # [db][da]
            cases9 = jnp.stack(
                [u3[db][da] for da in range(3) for db in range(3)], axis=1,
            ).astype(jnp.int32)                         # [m, 9] a-slow
            # test the whole 3x3 footprint (complete for |slope| <= 2)
            slot_list = [(cases9[:, j], ca + f32(j // 3 - 1),
                          cb + f32(j % 3 - 1)) for j in range(9)]

        # Dot-constant MT (see _mt_const_np): per footprint cell, ONE
        # one-hot MXU fetch of the packed table + the qa contraction as
        # selector MATMULS (see _mt_selectors_np — the naive tiny-lane
        # VPU form measured 2-10x slower) give det / u*det / v*det /
        # t*det for all 5 triangles — exact MT semantics with no
        # [m, K, 3, 3] HBM geometry.
        rd_s = jnp.broadcast_to(z0 - eye_s, pa.shape)
        rd_a = uaf_ - eye_a
        rd_b = ubf_ - eye_b
        eps = jnp.float32(_MT_EPS)
        best_tt = jnp.full(pa.shape, _BIG)
        best_case = jnp.zeros(pa.shape, jnp.int32)
        best_tri = jnp.zeros(pa.shape, jnp.int32)
        best_ca = jnp.zeros(pa.shape, f32)
        best_cb = jnp.zeros(pa.shape, f32)
        hi = jax.lax.Precision.HIGHEST
        selR, selG, selR2, selG2, _, _ = (jnp.asarray(x)
                                          for x in _mt_selectors_np())

        for cse, cell_a, cell_b in slot_list:
            ro_s = eye_s - k
            ro_a = eye_a - cell_a
            ro_b = eye_b - cell_b
            w_s = ro_a * rd_b - ro_b * rd_a
            w_a = ro_b * rd_s - ro_s * rd_b
            w_b = ro_s * rd_a - ro_a * rd_s
            oh = (cse[:, None] == case_iota[None, :]).astype(jnp.bfloat16)
            fk = jnp.einsum("nc,cl->nl", oh, mtc,
                            preferred_element_type=f32)  # [m, 128]
            qa = jnp.stack([rd_s, rd_a, rd_b, w_s, w_a, w_b], 1)
            mt = jax.lax.dot(fk[:, :90] * jax.lax.dot(qa, selR,
                                                      precision=hi),
                             selG, precision=hi)         # [m, 15]
            det, ud, vd = mt[:, 0:5], mt[:, 5:10], mt[:, 10:15]
            qb = jnp.stack([ro_s, ro_a, ro_b, jnp.ones_like(ro_s)], 1)
            td = jax.lax.dot(fk[:, 90:110] * jax.lax.dot(qb, selR2,
                                                         precision=hi),
                             selG2, precision=hi)        # [m, 5]
            sgn = jnp.sign(det)
            ok = jnp.abs(det) > eps
            tt = td / jnp.where(ok, det, 1.0)
            hit5 = (ok & (ud * sgn >= 0) & (vd * sgn >= 0)
                    & ((ud + vd - det) * sgn <= 0) & (tt > eps))
            ttm = jnp.where(hit5, tt, _BIG)
            t_slot = ttm.min(axis=1)
            tri_slot = jnp.argmin(ttm, axis=1).astype(jnp.int32)
            better = t_slot < best_tt
            best_tt = jnp.where(better, t_slot, best_tt)
            best_case = jnp.where(better, cse, best_case)
            best_tri = jnp.where(better, tri_slot, best_tri)
            best_ca = jnp.where(better, cell_a, best_ca)
            best_cb = jnp.where(better, cell_b, best_cb)

        anyhit = best_tt < _BIG
        # winner normal deferred: ONE post-ladder fetch from (case, tri)
        # at full width replaces a per-round fetch at every ladder stage.
        return (anyhit, best_tt, best_case, best_tri, best_ca, best_cb)

    def consume_round(st, c_bits, geo):
        """Test each row's next untested crossing slab; advance or
        resolve. Selection is find-first-set >= ptr over the bit field —
        exact slab order, so accepted hits are the true first hits
        (up to the in-slab 3x3 cell superset, bounded by oracle tests)."""
        rd_len_ = geo[6]
        ptr, resolved = st["ptr"], st["resolved"]
        has, o_i = _first_set_from(c_bits, ptr)
        act = ~resolved & has
        o_f = o_i.astype(f32)
        anyhit, t_min, wcase, wtri_i, wca, wcb = slab_pass(o_f, geo)
        fi_cell = ((o_f * a_size + wca) * b_size + wcb).astype(jnp.int32)
        newly = act & anyhit
        miss = act & ~anyhit
        exh = ~resolved & ~has
        return dict(
            ptr=jnp.where(miss, o_i + 1, ptr),
            resolved=resolved | newly | exh,
            hit=st["hit"] | newly,
            t=jnp.where(newly, t_min * rd_len_, st["t"]),
            fi=jnp.where(newly, fi_cell, st["fi"]),
            case=jnp.where(newly, wcase, st["case"]),
            tri=jnp.where(newly, wtri_i, st["tri"]),
        )

    def init_state(m, ptr, resolved):
        return dict(
            ptr=ptr, resolved=resolved,
            hit=jnp.zeros(m, bool), t=jnp.zeros(m, f32),
            fi=jnp.zeros(m, jnp.int32),
            case=jnp.zeros(m, jnp.int32), tri=jnp.zeros(m, jnp.int32),
        )

    # ---- compaction LADDER (gather-only) ----
    # Round cost is linear in the row count while the surviving-texel
    # count decays ~2x per round (hist), so work always runs at the
    # narrowest width that fits the survivors. TPU result SCATTERS and
    # repeated full-width nonzero/vector-gathers are the pathological
    # ops here (profiled at ~2/3 of the round-2 frame, ~9 ns/elem), so
    # this ladder (a) compacts each stage FROM the previous stage's
    # already-narrow rows, (b) packs the per-row carry into one i32
    # matrix so compaction is a row-major gather (~30x the per-element
    # rate of vector gathers on v5e), and (c) folds results back up with
    # cumsum-rank GATHER merges — the only scatter anywhere is one iota
    # scatter per stage to build the compaction index list. Survivors
    # that exceed a stage width stay behind unresolved (preserved by the
    # reverse merge) and surface in the `overflow` stat.
    geoA = (uaf, ubf, half_a, half_b, ro_sab, rd_sab, rd_len)
    no_cand = ~(cand_bits != 0).any(axis=1)
    g = init_state(N, jnp.zeros(N, jnp.int32), no_cand)
    hist = jnp.zeros(max_rounds, jnp.int32)
    rounds_t = jnp.zeros((), jnp.int32)
    overflow = jnp.zeros((), jnp.int32)

    if ladder is not None:
        # explicit stage widths (fractions of N or absolute counts);
        # monotone-decreasing, floored at 128 rows
        widths, w = [], N
        for lw in ladder:
            w2 = int(lw * N) if isinstance(lw, float) else int(lw)
            w2 = max(128, min(w2, N))
            if w2 < w:
                widths.append(w2)
                w = w2
    else:
        # default widths tuned to the measured per-round survivor decay
        # (first round resolves ~20%, later rounds ~50%; see
        # tools/exp_mesh_fixed / LADDER_r03): each stage fits after ONE
        # round of its predecessor at the bench pose while the while-cond
        # keeps correctness for slower-decaying poses. (A tighter
        # 0.36-headed schedule was measured 50 ms SLOWER at 1080p — the
        # smaller stage targets force extra rounds at WIDER widths and
        # overflow ~2k texels; do not re-tighten without re-measuring.)
        widths, w = [], N
        for fr in (0.5, 0.38, 0.2, 0.1, 0.05, 0.025, 0.0125):
            w2 = max(128, int(N * fr))
            if w2 < w:
                widths.append(w2)
                w = w2
    targets = widths + [tol_texels]

    def run_stage(carry, width, next_target, geo_s, c_bits_s, ptr_s, dead):
        st_l = init_state(width, ptr_s, dead)
        st_l["rounds_t"], st_l["hist"] = carry

        def cond(s):
            return ((s["rounds_t"] < max_rounds)
                    & (jnp.sum(~s["resolved"]) > next_target))

        def body(s):
            s2 = consume_round(s, c_bits_s, geo_s)
            s2["rounds_t"] = s["rounds_t"] + 1
            s2["hist"] = s["hist"].at[s["rounds_t"]].set(
                jnp.sum(~s2["resolved"]))
            return s2

        return jax.lax.while_loop(cond, body, st_l)

    i32 = jnp.int32
    as_i32 = lambda x: jax.lax.bitcast_convert_type(x, i32)
    as_f32 = lambda x: jax.lax.bitcast_convert_type(x, f32)

    def geo_of(uaf_, ubf_):
        """Rebuild the geo tuple from (uaf, ubf) — bit-identical to the
        full-width forms (same expressions), so compaction only needs to
        carry the two texel coordinates."""
        m = uaf_.shape[0]
        p_vox = (z0 * sel_s[None, :] + uaf_[:, None] * sel_a[None, :]
                 + ubf_[:, None] * sel_b[None, :])
        rdw = grid_origin[None, :] + p_vox * voxel_size - cam_pos[None, :]
        return (uaf_, ubf_,
                0.5 * jnp.abs((uaf_ - eye_a) / (z0 - eye_s)),
                0.5 * jnp.abs((ubf_ - eye_b) / (z0 - eye_s)),
                jnp.stack([jnp.broadcast_to(eye_s, (m,)),
                           jnp.broadcast_to(eye_a, (m,)),
                           jnp.broadcast_to(eye_b, (m,))], 1),
                jnp.stack([jnp.broadcast_to(z0 - eye_s, (m,)),
                           uaf_ - eye_a, ubf_ - eye_b], 1),
                jnp.linalg.norm(rdw, axis=-1))

    # stage 0 runs at full width inside the same machinery (covers the
    # "survivors still exceed widths[0]" overflow rounds)
    st0 = run_stage((rounds_t, hist), N, targets[0] if widths else tol_texels,
                    geoA, cand_bits, g["ptr"], g["resolved"])
    rounds_t, hist = st0["rounds_t"], st0["hist"]
    for k in ("ptr", "resolved", "hit", "t", "fi", "case", "tri"):
        upd = st0[k]
        if k in ("ptr", "resolved"):
            g[k] = upd
        else:
            g[k] = jnp.where(st0["hit"], upd, g[k])

    # The carry per row is just (texel id, ptr): uaf/ubf rebuild from the
    # texel id with the SAME closed forms (bit-identical), and each stage
    # re-gathers its bit rows from the full field at ITS width — packing
    # the C bit words + coords through every compaction cost a [N, 3+C]
    # concat + wide row gather. Compaction itself is a stable SORT
    # (live-first), measured 2.9 ms vs 6.7 for the iota-scatter at 1M
    # rows (see trace/sweep_exact.py's ladder).
    prev = dict(resolved=g["resolved"], ptr=g["ptr"],
                tex=jnp.arange(N, dtype=i32), width=N)
    entries = []
    for si, M in enumerate(widths):
        unres = ~prev["resolved"]
        n_unres = jnp.sum(unres)
        overflow = overflow + jnp.maximum(n_unres - M, 0)
        rank = jnp.cumsum(unres.astype(i32)) - 1        # [W_prev]
        # fused-key sort: the live flag and the index share one u32 key
        # (half the byte movement of key+payload; widths are <= 2^27)
        pw_ = prev["width"]
        fused = jnp.where(unres, 0, 1 << 27) | jnp.arange(pw_, dtype=i32)
        idxs = jax.lax.sort(fused) & ((1 << 27) - 1)
        idxs = idxs[:M] if M <= prev["width"] else jnp.pad(
            idxs, (0, M - prev["width"]))
        if si == 0:
            tex_s = idxs
            ptr_s = prev["ptr"][idxs]
        else:
            packed = jnp.concatenate(
                [prev["tex"][:, None], prev["ptr"][:, None]], axis=1)
            rows = packed[idxs]
            tex_s, ptr_s = rows[:, 0], rows[:, 1]
        bits_s = cand_bits[tex_s]
        ti_s = (tex_s // inter_w).astype(f32)
        tj_s = (tex_s % inter_w).astype(f32)
        uaf_s = a_min + (a_max - a_min) * (ti_s + 0.5) / inter_h
        ubf_s = b_min + (b_max - b_min) * (tj_s + 0.5) / inter_w
        row_valid = jnp.arange(M) < jnp.minimum(n_unres, M)
        st_l = run_stage((rounds_t, hist), M, targets[si + 1],
                         geo_of(uaf_s, ubf_s), bits_s, ptr_s, ~row_valid)
        rounds_t, hist = st_l["rounds_t"], st_l["hist"]
        entries.append(dict(unres=unres, rank=rank, M=M, st=st_l))
        prev = dict(resolved=st_l["resolved"], ptr=st_l["ptr"],
                    tex=tex_s, width=M)

    def merge_back(dst, unres_in, rank_in, src, m_src):
        """Fold src (width m_src) into the wider dst it was compacted
        from: row r of dst with unres & rank < m_src took row rank[r] of
        src. Pure rank gathers — no scatter."""
        take = unres_in & (rank_in < m_src)
        packed = jnp.concatenate(
            [src["hit"].astype(i32)[:, None], as_i32(src["t"])[:, None],
             src["fi"][:, None], src["case"][:, None],
             src["tri"][:, None], src["ptr"][:, None],
             src["resolved"].astype(i32)[:, None]], axis=1)  # [m_src, 7]
        rows = packed[jnp.clip(jnp.where(take, rank_in, 0), 0, m_src - 1)]
        s_hit = take & (rows[:, 0] != 0)
        out = dict(dst)
        out["hit"] = dst["hit"] | s_hit
        out["t"] = jnp.where(s_hit, as_f32(rows[:, 1]), dst["t"])
        out["fi"] = jnp.where(s_hit, rows[:, 2], dst["fi"])
        out["case"] = jnp.where(s_hit, rows[:, 3], dst["case"])
        out["tri"] = jnp.where(s_hit, rows[:, 4], dst["tri"])
        out["ptr"] = jnp.where(take, rows[:, 5], dst["ptr"])
        out["resolved"] = jnp.where(take, rows[:, 6] != 0, dst["resolved"])
        return out

    if entries:
        merged = entries[-1]["st"]
        for i in range(len(entries) - 2, -1, -1):
            merged = merge_back(entries[i]["st"], entries[i + 1]["unres"],
                                entries[i + 1]["rank"], merged,
                                entries[i + 1]["M"])
        g = merge_back(g, entries[0]["unres"], entries[0]["rank"], merged,
                       entries[0]["M"])

    hit, t = g["hit"], g["t"]

    # Deferred winner normal: ONE one-hot fetch from (case, tri) at full
    # width (0.85 ns/row) replaces the per-round fetch the ladder ran at
    # every stage; the 15->3 reduction rides the same selector matmuls.
    _, _, _, _, selK5, selH = (jnp.asarray(x) for x in _mt_selectors_np())
    hi = jax.lax.Precision.HIGHEST
    ohw = (g["case"][:, None] == case_iota[None, :]).astype(jnp.bfloat16)
    fkn = jnp.einsum("nc,cl->nl", ohw, mtc, preferred_element_type=f32)
    tri5 = jnp.arange(5, dtype=jnp.int32)
    wse = jax.lax.dot((g["tri"][:, None] == tri5[None, :]).astype(f32),
                      selK5, precision=hi)              # [N, 15]
    nrm_sab = jax.lax.dot(fkn[:, 110:125] * wse, selH, precision=hi)

    nrm_w = det_sign * (
        nrm_sab[:, 0:1] * sel_s[None, :]
        + nrm_sab[:, 1:2] * sel_a[None, :]
        + nrm_sab[:, 2:3] * sel_b[None, :])
    nl = jnp.linalg.norm(nrm_w, axis=-1, keepdims=True)
    nrm_w = jnp.where(hit[:, None], nrm_w / jnp.maximum(nl, 1e-30), 0.0)

    # Shadow term at the struck cell: ONE post-round fetch from the
    # sweep-layout shadow volume (the round-2 sweep instead carried a
    # shadow channel through every candidate — a full extra einsum chain
    # per chunk for a bit only ever read at the accepted hit).
    if has_shadow:
        shf = shadow_sw.reshape(-1).astype(f32)
        sh_at = jnp.take(shf, jnp.clip(g["fi"], 0, shf.shape[0] - 1))
        sh = jnp.where(hit, (sh_at > 0.5).astype(f32), 0.0)
    else:
        sh = jnp.zeros(N, f32)

    point = ro + rd * jnp.where(hit, t / jnp.maximum(rd_len, 1e-30),
                                0.0)[:, None]
    return dict(
        hit=hit, t=jnp.where(hit, t, 0.0), normal=nrm_w,
        point=point, shadow=sh, case=g["case"], tri=g["tri"],
        rounds=rounds_t, unresolved=jnp.sum(~g["resolved"]),
        overflow=overflow, blocked=jnp.zeros((), jnp.int32),
        hist=hist, ray_o=ro, ray_d=rd,
    )


# --------------------------------------------------------------------------
# Public APIs
# --------------------------------------------------------------------------


def _scene_sweep_setup(scene: MCMeshScene, camera_pos, view,
                       fov_deg: float, aspect: float,
                       inter_h: int, inter_w: int):
    axis_world, flip, (S, A, B), eyes, window, crop_lo = _sweep_geometry(
        scene.case_vol, np.asarray(scene.origin), scene.voxel_size,
        camera_pos, view,
    )
    case_sw = _layout_volume(scene.case_vol, axis_world, flip, S, A, B,
                             crop_lo)
    shadow_sw = None
    if scene.shadow_cell is not None:
        from ray_tracing_octrees_tpu.trace.slab_sweep import _shadow_relayout

        shadow_sw = _shadow_relayout(scene.shadow_cell, axis_world,
                                     bool(flip), case_sw.shape[0], A, B,
                                     crop_lo=crop_lo, s_keep=S)
    origin_c = np.asarray(scene.origin, np.float32) + np.asarray(
        _AXIS_SELECTORS[axis_world][0], np.float32
    ) * (crop_lo * float(scene.voxel_size))
    scal_np = _frame_scalars_np(
        *eyes[:3], eyes[3], *window, fov_deg, aspect,
        float(scene.voxel_size), S,
        origin_c,
        np.asarray(camera_pos, np.float32), view,
    )
    # static footprint width: |slope| <= 1 everywhere -> 2x2 (4 distinct
    # cells, top-4 complete); else the full 3x3 (complete to |slope| <= 2)
    eye_s, eye_a, eye_b, z0 = eyes
    a_min, a_max, b_min, b_max = window
    denom = abs(z0 - eye_s)
    smax = max(abs(a_min - eye_a), abs(a_max - eye_a),
               abs(b_min - eye_b), abs(b_max - eye_b)) / max(denom, 1e-12)
    kcells = 4 if smax <= 1.0 else 9
    return (axis_world, flip, (S, A, B), case_sw, shadow_sw, scal_np,
            kcells)


def trace_mc_mesh_texels(
    scene: MCMeshScene,
    camera_pos,
    view,
    fov_deg: float = 45.0,
    aspect: float = 1.0,
    inter_h: int = 1024,
    inter_w: int = 1024,
    max_rounds: int = 16,
    tol_texels: int = 0,
    ladder=None,
) -> dict:
    """Texel-space trace (the raw wavefront): one ray per table texel.

    The per-texel rays (``ray_o``, ``ray_d``) are returned so tests can
    feed the IDENTICAL ray set to the exact LBVH tracer and compare 1:1.
    """
    (axis_world, flip, (S, A, B), case_sw, shadow_sw, scal_np, kcells) = \
        _scene_sweep_setup(scene, camera_pos, view, fov_deg, aspect,
                           inter_h, inter_w)
    return _trace_texels(
        case_sw, shadow_sw, jnp.asarray(scal_np),
        case_sw.shape[0] // 32, S, A, B, inter_h, inter_w, bool(flip),
        axis_world, max_rounds, tol_texels, shadow_sw is not None,
        kcells=kcells, ladder=ladder,
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_chunks", "s_valid", "a_size", "b_size", "inter_h",
                     "inter_w", "flip", "axis_world", "width", "height",
                     "max_rounds", "tol_texels", "has_shadow", "warp_cfg",
                     "kcells", "ladder"),
)
def _mesh_frame_fused(case_sw, shadow_sw, scal,
                      n_chunks: int, s_valid: int, a_size: int, b_size: int,
                      inter_h: int, inter_w: int, flip: bool,
                      axis_world: int, width: int, height: int,
                      max_rounds: int, tol_texels: int, has_shadow: bool,
                      warp_cfg, kcells: int, ladder=None):
    """Whole triangle-traced frame in one program: rounds, shade, warp."""
    f32 = jnp.float32
    res = _trace_texels(
        case_sw, shadow_sw, scal, n_chunks, s_valid, a_size,
        b_size, inter_h, inter_w, flip, axis_world, max_rounds, tol_texels,
        has_shadow, kcells=kcells, ladder=ladder,
    )
    # Texel-space Lambert shade (shade(), RayTracerBVH.cpp:331-336; the
    # directional light makes shading view-independent, so per-texel
    # colors are exact for their pixels up to the nearest-texel mapping).
    # MC triangle winding (the reference's triTable with FILLED -> -1)
    # yields normals facing the filled side; shade two-sided with the
    # viewer-facing orientation, as GL rasterization of the same mesh
    # effectively does (test.frag lights the visible face).
    light_dir = scal[34:37]
    base_color = scal[37:40]
    ambient = scal[40:43]
    nrm = res["normal"]
    facing = (nrm * res["ray_d"]).sum(-1, keepdims=True)
    nrm = jnp.where(facing > 0, -nrm, nrm)
    l = light_dir / jnp.linalg.norm(light_dir)
    ndotl = jnp.maximum(0.0, -(nrm * l[None, :]).sum(-1))
    color = base_color[None, :] * ndotl[:, None] + ambient[None, :]
    if has_shadow:
        color = jnp.where((res["shadow"] > 0.5)[:, None],
                          jnp.broadcast_to(ambient[None, :], color.shape),
                          color)
    rgb8 = jnp.clip(jnp.round(color * 255.0), 0.0, 255.0)
    packed = rgb8[:, 0] * 65536.0 + rgb8[:, 1] * 256.0 + rgb8[:, 2]
    packed = jnp.where(res["hit"], packed, -1.0)
    packed = packed.reshape(inter_h, inter_w)

    lin, behind, _, _ = _warp_setup(scal, axis_world, inter_h, inter_w,
                                    width, height)
    w_val = _warp_values_packed(packed, lin, inter_h, inter_w, width, height,
                                warp_cfg)
    hit = (w_val >= 0.0) & ~behind
    r = jnp.floor(w_val / 65536.0)
    g = jnp.floor((w_val - r * 65536.0) / 256.0)
    b = w_val - r * 65536.0 - g * 256.0
    rgb = jnp.stack([r, g, b], -1) / 255.0
    rgb = jnp.where(hit[:, None], rgb, 0.0)
    rgba = jnp.concatenate([rgb, jnp.ones((rgb.shape[0], 1), f32)], -1)
    return rgba.reshape(height, width, 4), res["rounds"], res["unresolved"]


def _warp_values_packed(packed, lin, inter_h: int, inter_w: int,
                        width: int, height: int, warp_cfg):
    """Per-pixel lookup of a 24-bit packed channel (exact 3-plane warp)."""
    if warp_cfg is None:
        w = jnp.take(packed.reshape(-1), jnp.maximum(lin, 0))
        return jnp.where(lin < 0, -1.0, w)
    from ray_tracing_octrees_tpu.trace.warp_kernel import (
        split_hi_mid_lo,
        warp_lookup,
    )

    ty, tx, win = warp_cfg
    t_hml = split_hi_mid_lo(packed)
    lin2 = lin.reshape(height, width)
    ph, pw = (-height) % ty, (-width) % tx
    if ph or pw:
        lin2 = jnp.pad(lin2, ((0, ph), (0, pw)), constant_values=-1)
    out = warp_lookup(t_hml, lin2, ty, tx, win, n_planes=3)
    return out[:height, :width].reshape(-1)


def render_mc_mesh_frame(
    scene: MCMeshScene,
    camera_pos,
    view,
    fov_deg: float,
    aspect: float,
    width: int,
    height: int,
    light_dir=(-1.0, -1.0, -1.0),
    base_color=(1.0, 0.8, 0.6),
    ambient=(0.1, 0.1, 0.1),
    inter_h: int = 1024,
    inter_w: int = 1024,
    max_rounds: int = 8,
    tol_texels: int = 512,
    with_stats: bool = False,
    ladder=None,
):
    """Triangle-traced frame of the extracted MC mesh, Lambert + shadow.

    ``tol_texels``: the round loop stops when fewer than this many table
    texels remain unresolved (they shade as miss); 512 of 1M texels
    bounds the error at < 0.05 % of rays while capping tail rounds.
    """
    (axis_world, flip, (S, A, B), case_sw, shadow_sw, scal_np, kcells) = \
        _scene_sweep_setup(scene, camera_pos, view, fov_deg, aspect,
                           inter_h, inter_w)
    scal_np = scal_np.copy()
    scal_np[34:37] = light_dir
    scal_np[37:40] = base_color
    scal_np[40:43] = ambient
    warp_cfg = _plan_warp_cfg(scal_np, axis_world, inter_h, inter_w,
                              width, height)
    img, rounds, unresolved = _mesh_frame_fused(
        case_sw, shadow_sw, jnp.asarray(scal_np),
        case_sw.shape[0] // 32, S, A, B, inter_h, inter_w, bool(flip),
        axis_world, width, height, max_rounds, tol_texels,
        shadow_sw is not None, warp_cfg, kcells, ladder,
    )
    if with_stats:
        return img, dict(rounds=rounds, unresolved=unresolved)
    return img
