"""Stackless wavefront octree ray tracing.

TPU-native replacement for the reference's per-pixel stack traversal
(``intersectOctreeIterative``, RayTracerBVH.cpp:239-327: ``int stack[128]``
DFS with slab tests and a 512-visit cap). Per-thread stacks and divergent
DFS are hostile to a SIMD machine, so the traversal is reformulated as
*hierarchical DDA with restart*: every ray repeatedly

  1. locates the octree leaf containing its current point by descending the
     occupancy pyramid (a fixed ``log2(S)`` ladder of gathers — no stack),
  2. terminates if that leaf is solid (hit at the leaf box's entry t, normal
     ``normalize(p - leafCenter)`` exactly as RayTracerBVH.cpp:283-287),
  3. otherwise advances t past the leaf box's exit plane and repeats.

All rays run in lockstep under ``lax.while_loop``; each iteration skips an
entire uniform empty region, so step counts are bounded by leaf crossings
(the analog of MAX_TRAVERSAL_STEPS = 512, RayTracerBVH.cpp:192).

Unlike the reference kernel — whose DFS pops children in a fixed order and
``break``s on the *first* solid hit found, occasionally returning a farther
hit — this traversal is front-to-back by construction and always returns
the true nearest hit.

Frustum culling: the reference compacts the flat node array on the CPU and
remaps child pointers (``updateNodesWithFrustumCulling``,
RayTracerBVH.cpp:725-813). Array equivalents here: ``cull_pyramid`` masks
the occupancy pyramid against the frustum (culled space reads as empty, so
rays skip it) and ``compact_visible_nodes`` reproduces the node-buffer
compaction itself (old->new index remap with children of culled nodes set
to -1) as a jittable prefix-sum pass.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_octrees_tpu.core.octree import (
    LinearOctree,
    OccupancyPyramid,
    decode_skip_radius,
)
from ray_tracing_octrees_tpu.render.frustum import frustum_planes, test_aabb


_BIG = jnp.float32(1e30)


def _safe_inv(d):
    eps = jnp.float32(1e-12)
    return 1.0 / jnp.where(jnp.abs(d) < eps, jnp.where(d < 0, -eps, eps), d)


def _degenerate_axes(d):
    """Axes the ray effectively does not move along (relative to |d|)."""
    mx = jnp.max(jnp.abs(d), axis=-1, keepdims=True)
    return jnp.abs(d) <= mx * jnp.float32(1e-7)


def _slab(o, inv_d, deg, bmin, bmax):
    """Ray-AABB slab test (intersectAABB, RayTracerBVH.cpp:226-236).

    Degenerate axes (``deg``) are handled explicitly: the interval is
    (-inf, inf) when the origin lies within the slab and empty otherwise.
    The usual 1/eps trick mis-signs the exit plane when the origin sits
    *exactly on* a cell boundary with a denormal-direction component,
    yielding t_far <= t_near and stalling the DDA.

    Returns (t_near, t_far); hit iff t_near <= t_far and t_far > 0.
    """
    t1 = (bmin - o) * inv_d
    t2 = (bmax - o) * inv_d
    inside = (o >= bmin) & (o <= bmax)
    lo = jnp.where(deg, jnp.where(inside, -_BIG, _BIG), jnp.minimum(t1, t2))
    hi = jnp.where(deg, jnp.where(inside, _BIG, -_BIG), jnp.maximum(t1, t2))
    t_near = lo.max(axis=-1)
    t_far = hi.min(axis=-1)
    return t_near, t_far


@functools.partial(jax.jit, static_argnames=("max_steps",))
def trace_octree(
    pyramid: OccupancyPyramid,
    origins: jax.Array,     # f32[N, 3] world
    directions: jax.Array,  # f32[N, 3] world (normalized)
    grid_origin: jax.Array,  # f32[3]
    voxel_size: jax.Array,   # f32[]
    max_steps: int = 512,
) -> dict:
    """Nearest solid-leaf hit for each ray.

    Returns dict with hit (bool[N]), t (f32[N]), point (f32[N,3] world),
    normal (f32[N,3]), steps (int32[N]).
    """
    n_levels = pyramid.num_levels
    root_size = jnp.float32(pyramid.root_size)

    # Voxel-space ray: p_vox = (p_world - origin) / voxel_size. The world
    # ray parameter t is preserved by scaling the direction, not the origin.
    o = (origins - grid_origin[None, :]) / voxel_size
    d = directions / voxel_size
    inv_d = _safe_inv(d)
    deg = _degenerate_axes(d)

    t_root_near, t_root_far = _slab(o, inv_d, deg, jnp.float32(0.0), root_size)
    alive0 = (t_root_near <= t_root_far) & (t_root_far > 0)
    t0 = jnp.maximum(t_root_near, 0.0)

    n = origins.shape[0]
    f32 = jnp.float32

    # Epsilon that advances the sample point ~1e-3 voxels along the ray
    # (|d_world| = 1, so dt of voxel_size crosses exactly one voxel), floored
    # by float32 ulp at the current t.
    eps_t = f32(1e-3) * voxel_size

    def nudge(t):
        return t + jnp.maximum(eps_t, jnp.abs(t) * f32(2e-6))

    def find_leaf(p):
        """Leaf containing voxel floor(p): (level, solid, cell_min, cell_size).

        The leaf is the coarsest uniform cell on the root-to-voxel path;
        uniformity is monotone downward so it's the max level whose cell is
        uniform. Size-1 cells are trivially uniform -> always terminates.
        """
        v = jnp.floor(p).astype(jnp.int32)
        leaf_level = jnp.zeros(p.shape[0], jnp.int32)
        solid = jnp.zeros(p.shape[0], jnp.bool_)
        found = jnp.zeros(p.shape[0], jnp.bool_)
        # Walk from the root down; record the first uniform cell.
        for k in range(n_levels - 1, -1, -1):
            cx = v[:, 0] >> k
            cy = v[:, 1] >> k
            cz = v[:, 2] >> k
            code = pyramid.cell_code(k, cx, cy, cz)
            uniform = code != 1
            c_all = code == 2
            take = uniform & (~found)
            leaf_level = jnp.where(take, k, leaf_level)
            solid = jnp.where(take, c_all, solid)
            found = found | uniform
        size = (jnp.int32(1) << leaf_level).astype(f32)
        cell_min = ((v >> leaf_level[:, None]) << leaf_level[:, None]).astype(f32)
        return solid, cell_min, size

    def body(state):
        t, alive, hit, t_hit, cmin_out, csize_out, steps = state
        p = o + d * nudge(t)[:, None]
        solid, cmin, csize = find_leaf(p)
        t_near, t_far = _slab(o, inv_d, deg, cmin, cmin + csize[:, None])

        new_hit = alive & solid
        hit = hit | new_hit
        t_hit = jnp.where(new_hit, jnp.maximum(t_near, 0.0), t_hit)
        cmin_out = jnp.where(new_hit[:, None], cmin, cmin_out)
        csize_out = jnp.where(new_hit, csize, csize_out)

        # advance empty-leaf rays past the cell exit
        t = jnp.where(alive & ~solid, jnp.maximum(t_far, nudge(t)), t)
        alive = alive & ~solid & (t < t_root_far)
        steps = steps + alive.astype(jnp.int32)
        return t, alive, hit, t_hit, cmin_out, csize_out, steps

    def cond(state):
        _, alive, _, _, _, _, steps = state
        return jnp.any(alive) & (steps.max() < max_steps)

    state = (
        t0,
        alive0,
        jnp.zeros(n, jnp.bool_),
        jnp.zeros(n, f32),
        jnp.zeros((n, 3), f32),
        jnp.zeros(n, f32),
        jnp.zeros(n, jnp.int32),
    )
    t, alive, hit, t_hit, cmin, csize, steps = jax.lax.while_loop(cond, body, state)

    # Hit point and sphere-ish leaf normal in world space
    # (RayTracerBVH.cpp:283-287: normalize(p - nodeCenter)).
    point = origins + directions * t_hit[:, None]
    center_vox = cmin + 0.5 * csize[:, None]
    center_world = grid_origin[None, :] + center_vox * voxel_size
    nrm = point - center_world
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-30)
    nrm = jnp.where(hit[:, None], nrm, 0.0)
    return dict(hit=hit, t=t_hit, point=point, normal=nrm, steps=steps)


@functools.partial(
    jax.jit, static_argnames=("max_steps", "ball_skip", "ladder",
                              "const_origin", "const_dir", "safety_cap"))
def trace_octree_fast(
    leaf_vol: jax.Array,    # u8[S, S, S] from core.octree.build_leaf_volume
    origins: jax.Array,     # f32[N, 3] world
    directions: jax.Array,  # f32[N, 3] world (normalized)
    grid_origin: jax.Array,  # f32[3]
    voxel_size: jax.Array,   # f32[]
    max_steps: int = 512,
    ball_skip: bool = False,
    ladder: tuple = (),
    t_start=None,      # f32[N]: conservative per-ray start t (world units)
    live_mask=None,    # bool[N]: rays proven to miss start dead
    const_origin: bool = False,  # all rays share origins[0] (pinhole bundle)
    const_dir: bool = False,     # all rays share directions[0] (directional)
    safety_cap: int = 0,  # post-ladder overflow stage width (0 = off)
) -> dict:
    """:func:`trace_octree` with the pyramid descent folded into ONE gather.

    ``find_leaf``'s root-to-voxel walk (``num_levels`` gathers per ray per
    step — the measured 0.22 Mrays/s bottleneck) is precomputed per voxel
    into ``leaf_vol`` (core/octree.py::build_leaf_volume), so each DDA step
    performs a single u8 gather. With ``ball_skip=False`` the advance rule,
    the sampled point sequence, and therefore every output are IDENTICAL to
    :func:`trace_octree` by construction (same floats, same ops), asserted
    by tests/test_octree_trace.py.

    ``ball_skip=True`` additionally advances empty rays past the packed
    Chebyshev empty ball [v - r, v + r + 1) when it reaches farther than the
    leaf box — a strictly solid-free region, so hits cannot be skipped, but
    the sample sequence (and thus rare nudge-epsilon corner cases) may
    differ from the reference stepping; kept opt-in for that reason.

    ``ladder``: compaction schedule, e.g. ((6, N//8), (8, N//32)) — run 6
    lockstep steps at full width, gather survivors into an N//8 buffer,
    run 8 more, gather into N//32, finish there (wavefront compaction:
    most rays finish in a few steps — Calgary bench pose p50 = 7 — while
    the lockstep while pays full frame width for the tail). Per-ray step
    math is width-agnostic, so outputs are unchanged; the only semantic
    caveat is the ``max_steps`` workload cap, which applies per phase
    rather than as one global lockstep cut (identical whenever no ray
    reaches the cap, as on every real scene: Calgary max = 50 of 512).

    ``const_origin`` / ``const_dir``: caller's promise that every row of
    ``origins`` / ``directions`` equals row 0 (a pinhole primary bundle /
    a directional shadow bundle). The shared component becomes a scalar —
    identical float ops via broadcasting — and ladder compactions stop
    carrying its 3 columns.

    ``safety_cap``: width of an extra post-ladder compaction stage that
    retires cap-overflow stragglers; without it they fall through to the
    full-width cleanup loop (full-frame cost per step — the measured
    280 ms failure mode when a stage cap was sized below the live count).

    Reference anchor: intersectOctreeIterative (RayTracerBVH.cpp:239-327)
    runs one node fetch per visit on a GL compute unit; this is the
    TPU-native equivalent of that per-visit cost.
    """
    S = leaf_vol.shape[0]
    top = int(np.log2(S))
    root_size = jnp.float32(S)
    n = origins.shape[0]
    f32 = jnp.float32
    i32 = jnp.int32

    # SoA throughout: a trailing size-3 axis tiles to T(8,128) on TPU —
    # 42x the logical bytes — and the loop-invariant o/d/inv_d plus the
    # cmin carry were all [N,3], making every DDA step HBM-bound on
    # padding (measured 7.7 ms/step at 518k rays; per-axis [N] forms are
    # the same float ops in the same order, so outputs are bit-identical).
    # ``const_origin`` (pinhole primary bundle: every ray starts at the
    # eye) and ``const_dir`` (directional shadow bundle) shrink the
    # shared components to scalars — same float ops via broadcasting, and
    # the ladder stops carrying those columns through its compactions.
    if const_origin:
        o3 = tuple((origins[0, a] - grid_origin[a]) / voxel_size
                   for a in range(3))
    else:
        o3 = tuple((origins[:, a] - grid_origin[a]) / voxel_size
                   for a in range(3))
    if const_dir:
        d3 = tuple(directions[0, a] / voxel_size for a in range(3))
    else:
        d3 = tuple(directions[:, a] / voxel_size for a in range(3))

    def safe_inv3(dv):
        return tuple(_safe_inv(dv[a]) for a in range(3))

    def deg_axes3(dv):
        mx = jnp.maximum(jnp.maximum(jnp.abs(dv[0]), jnp.abs(dv[1])),
                         jnp.abs(dv[2]))
        return tuple(jnp.abs(dv[a]) <= mx * f32(1e-7) for a in range(3))

    def slab3(o_, inv_, deg_, bmin3, bmax3):
        """Per-axis _slab: same ops, nested max/min (exact) reductions."""
        lo = []
        hi = []
        for a in range(3):
            t1 = (bmin3[a] - o_[a]) * inv_[a]
            t2 = (bmax3[a] - o_[a]) * inv_[a]
            inside = (o_[a] >= bmin3[a]) & (o_[a] <= bmax3[a])
            lo.append(jnp.where(deg_[a], jnp.where(inside, -_BIG, _BIG),
                                jnp.minimum(t1, t2)))
            hi.append(jnp.where(deg_[a], jnp.where(inside, _BIG, -_BIG),
                                jnp.maximum(t1, t2)))
        t_near = jnp.maximum(jnp.maximum(lo[0], lo[1]), lo[2])
        t_far = jnp.minimum(jnp.minimum(hi[0], hi[1]), hi[2])
        return t_near, t_far

    inv3 = safe_inv3(d3)
    deg3 = deg_axes3(d3)
    zero3 = (f32(0.0),) * 3
    root3 = (root_size,) * 3
    t_root_near, t_root_far = slab3(o3, inv3, deg3, zero3, root3)
    alive0 = (t_root_near <= t_root_far) & (t_root_far > 0)
    t0 = jnp.maximum(t_root_near, 0.0)
    # state carries must be [n] even when both bundle components are
    # shared scalars
    t0 = jnp.broadcast_to(t0, (n,))
    alive0 = jnp.broadcast_to(alive0, (n,))
    # Conservative seeds (slab_sweep.sweep_seed): skip provably-empty
    # leading space / provably-missing rays. Sampled points change only
    # across solid-free regions, so outputs match the unseeded trace up to
    # the nudge-epsilon grazing class (tests measure equality).
    if t_start is not None:
        t0 = jnp.maximum(t0, t_start)
    if live_mask is not None:
        alive0 = alive0 & live_mask

    eps_t = f32(1e-3) * voxel_size

    def nudge(t):
        return t + jnp.maximum(eps_t, jnp.abs(t) * f32(2e-6))

    def find_leaf(p3):
        v3 = tuple(jnp.floor(p3[a]).astype(i32) for a in range(3))
        inb = (
            (v3[0] >= 0) & (v3[1] >= 0) & (v3[2] >= 0)
            & (v3[0] < S) & (v3[1] < S) & (v3[2] < S)
        )
        vc = tuple(jnp.clip(v3[a], 0, S - 1) for a in range(3))
        lv = leaf_vol[vc[2], vc[1], vc[0]].astype(i32)
        # Out-of-cube voxels resolve at the root level, uniform-empty —
        # exactly find_leaf's topmost-level cell_code fallback.
        level = jnp.where(inb, (lv >> 1) & 0xF, top)
        solid = inb & ((lv & 1) > 0)
        size = (i32(1) << level).astype(f32)
        cmin3 = tuple(((v3[a] >> level) << level).astype(f32)
                      for a in range(3))
        radius = jnp.where(inb, decode_skip_radius(lv >> 5), 0)
        return solid, cmin3, size, v3, radius

    def make_body(o_, d_, inv_, deg_, t_root_far_):
        """The DDA step over a given row set — per-ray float ops are
        identical at every width, so compaction cannot change outputs."""

        def body(state):
            t, alive, hit, t_hit, cm0, cm1, cm2, csize_out, steps = state
            tn = nudge(t)
            p3 = tuple(o_[a] + d_[a] * tn for a in range(3))
            solid, cmin3, csize, v3, radius = find_leaf(p3)
            t_near, t_far = slab3(
                o_, inv_, deg_, cmin3,
                tuple(cmin3[a] + csize for a in range(3)))

            new_hit = alive & solid
            hit = hit | new_hit
            t_hit = jnp.where(new_hit, jnp.maximum(t_near, 0.0), t_hit)
            cm0 = jnp.where(new_hit, cmin3[0], cm0)
            cm1 = jnp.where(new_hit, cmin3[1], cm1)
            cm2 = jnp.where(new_hit, cmin3[2], cm2)
            csize_out = jnp.where(new_hit, csize, csize_out)

            if ball_skip:
                bmin3 = tuple((v3[a] - radius).astype(f32) for a in range(3))
                bmax3 = tuple((v3[a] + radius).astype(f32) + 1.0
                              for a in range(3))
                _, t_far_ball = slab3(o_, inv_, deg_, bmin3, bmax3)
                t_far = jnp.maximum(t_far, t_far_ball)

            t = jnp.where(alive & ~solid, jnp.maximum(t_far, nudge(t)), t)
            alive = alive & ~solid & (t < t_root_far_)
            steps = steps + alive.astype(i32)
            return t, alive, hit, t_hit, cm0, cm1, cm2, csize_out, steps

        return body

    def phase(o_, d_, t_root_far_, st, iters):
        """Run the DDA on one row set: ``iters`` bounded steps, or to
        completion when ``iters`` is None."""
        body = make_body(o_, d_, safe_inv3(d_), deg_axes3(d_), t_root_far_)
        if iters is None:
            def cond(s):
                return jnp.any(s[1]) & (s[8].max() < max_steps)

            return jax.lax.while_loop(cond, body, st)

        def cond(ks):
            k, s = ks
            return (k < iters) & jnp.any(s[1]) & (s[8].max() < max_steps)

        def bodyk(ks):
            k, s = ks
            return k + 1, body(s)

        return jax.lax.while_loop(cond, bodyk, (jnp.int32(0), st))[1]

    def init_state(m, t_i, alive_i, steps_i):
        z = jnp.zeros(m, f32)
        return (t_i, alive_i, jnp.zeros(m, jnp.bool_), z, z, z, z, z,
                steps_i)

    state = init_state(n, t0, alive0, jnp.zeros(n, i32))

    if not ladder:
        state = phase(o3, d3, t_root_far, state, None)
    else:
        # Compaction ladder: most rays finish within a few steps; the
        # lockstep while otherwise pays full frame width for the tail.
        # After each bounded phase, gather the surviving rows into a
        # narrow buffer — as ONE row-major gather of a packed i32 matrix
        # (vector gathers run ~9 ns/elem on v5e; row gathers ~30x that
        # rate) — finish them there, and scatter results back. Per-ray
        # step math is width-agnostic, so results are bit-identical;
        # survivors beyond a stage cap stay in the full-width state and
        # the final cleanup loop (normally 0 trips) finishes them.
        as_i32 = lambda x: jax.lax.bitcast_convert_type(x, i32)
        as_f32 = lambda x: jax.lax.bitcast_convert_type(x, f32)
        state = phase(o3, d3, t_root_far, state, ladder[0][0])

        def roots_of(o_, d_):
            """t_root_far recomputed from (o, d) — same floats, same ops
            as the top-level slab, so bit-identical to carrying it."""
            return slab3(o_, safe_inv3(d_), deg_axes3(d_), zero3, root3)[1]

        def compact(prev, cap):
            """Gather prev's alive rows into a cap-row stage. Shared
            bundle components (const origin / direction) are scalars and
            are not carried; t_root_far is recomputed from (o, d)."""
            (t_f, alive_f, hit_f, th_f, cm0_f, cm1_f, cm2_f, cs_f,
             steps_f) = prev["st"]
            w_prev = prev["width"]
            na = jnp.sum(alive_f.astype(i32))
            rank = jnp.cumsum(alive_f.astype(i32)) - 1
            sel = alive_f & (rank < cap)
            slot = jnp.where(sel, rank, cap)
            ids = jnp.zeros(cap + 1, i32).at[slot].set(
                jnp.arange(w_prev, dtype=i32), mode="drop")[:cap]
            valid = jnp.arange(cap) < jnp.minimum(na, cap)
            cols = []
            if not const_origin:
                cols += [as_i32(prev["o"][a]) for a in range(3)]
            if not const_dir:
                cols += [as_i32(prev["d"][a]) for a in range(3)]
            cols += [as_i32(t_f), steps_f, alive_f.astype(i32)]
            rows = jnp.stack(cols, axis=1)[ids]     # [cap, <=9] row gather
            ci = 0
            if const_origin:
                o_c = prev["o"]
            else:
                o_c = tuple(as_f32(rows[:, ci + a]) for a in range(3))
                ci += 3
            if const_dir:
                d_c = prev["d"]
            else:
                d_c = tuple(as_f32(rows[:, ci + a]) for a in range(3))
                ci += 3
            st_c = init_state(cap, as_f32(rows[:, ci]),
                              (rows[:, ci + 2] != 0) & valid,
                              rows[:, ci + 1])
            return sel, rank, o_c, d_c, st_c

        # Stages CHAIN: each compacts from the previous (already narrow)
        # stage's rows, and results fold back up at the end with rank
        # gathers — the only scatter is one iota scatter per stage for
        # the compaction index list.
        prev = dict(st=state, o=o3, d=d3, width=n)
        entries = []
        for si, (_, cap) in enumerate(ladder):
            sel, rank, o_c, d_c, st_c = compact(prev, cap)
            nxt = ladder[si + 1][0] if si + 1 < len(ladder) else None
            st_c = phase(o_c, d_c, roots_of(o_c, d_c), st_c, nxt)
            entries.append(dict(sel=sel, rank=rank, cap=cap, st=st_c))
            prev = dict(st=st_c, o=o_c, d=d_c, width=cap)

        def merge_back(dst, sel, rank, src, cap):
            """Fold a narrow stage's state into the row set it was
            compacted from: row r with sel[r] took narrow row rank[r].
            One packed row gather + flat wheres — no scatters."""
            (t_s, al_s, hit_s, th_s, c0_s, c1_s, c2_s, cs_s,
             st_s) = src
            packedr = jnp.stack(
                [as_i32(t_s), al_s.astype(i32), hit_s.astype(i32),
                 as_i32(th_s), as_i32(c0_s), as_i32(c1_s), as_i32(c2_s),
                 as_i32(cs_s), st_s], axis=1)
            rowsr = packedr[jnp.clip(jnp.where(sel, rank, 0), 0, cap - 1)]
            (t_d, al_d, hit_d, th_d, c0_d, c1_d, c2_d, cs_d,
             st_d) = dst
            pick = lambda col, old, cast=as_f32: jnp.where(
                sel, cast(rowsr[:, col]), old)
            return (
                pick(0, t_d),
                jnp.where(sel, rowsr[:, 1] != 0, al_d),
                jnp.where(sel, rowsr[:, 2] != 0, hit_d),
                pick(3, th_d), pick(4, c0_d), pick(5, c1_d),
                pick(6, c2_d), pick(7, cs_d),
                jnp.where(sel, rowsr[:, 8], st_d),
            )

        merged = entries[-1]["st"]
        for i in range(len(entries) - 2, -1, -1):
            merged = merge_back(entries[i]["st"], entries[i + 1]["sel"],
                                entries[i + 1]["rank"], merged,
                                entries[i + 1]["cap"])
        state = merge_back(state, entries[0]["sel"], entries[0]["rank"],
                           merged, entries[0]["cap"])
        if safety_cap:
            # Overflow insurance: rays whose rank exceeded a stage cap sat
            # idle in their stage buffer and are still alive here. Without
            # this stage they'd finish in the full-width cleanup loop
            # below at full-frame cost per step (the measured 280 ms
            # failure mode); one more narrow stage retires them at
            # safety_cap width instead.
            sel_s, rank_s, o_s, d_s, st_s = compact(
                dict(st=state, o=o3, d=d3, width=n), safety_cap)
            st_s = phase(o_s, d_s, roots_of(o_s, d_s), st_s, None)
            state = merge_back(state, sel_s, rank_s, st_s, safety_cap)
        # overflow cleanup (rays beyond every cap; normally 0 trips)
        state = phase(o3, d3, t_root_far, state, None)

    t, alive, hit, t_hit, cm0, cm1, cm2, csize, steps = state

    # Epilogue in AoS, verbatim from trace_octree — it runs ONCE per
    # trace (the [N,3] tiling cost only matters inside the step loop),
    # and linalg.norm's reduction must match bit-for-bit.
    cmin = jnp.stack([cm0, cm1, cm2], axis=1)
    point = origins + directions * t_hit[:, None]
    center_vox = cmin + 0.5 * csize[:, None]
    center_world = grid_origin[None, :] + center_vox * voxel_size
    nrm = point - center_world
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-30)
    nrm = jnp.where(hit[:, None], nrm, 0.0)
    return dict(hit=hit, t=t_hit, point=point, normal=nrm, steps=steps)


def cull_pyramid(
    pyramid: OccupancyPyramid,
    grid_origin,
    voxel_size,
    view_proj,
    margin: float,
) -> OccupancyPyramid:
    """Frustum-cull the scene by blanking occupancy outside the frustum.

    Mirrors the *effect* of updateNodesWithFrustumCulling
    (RayTracerBVH.cpp:725-813, margin 150): space outside the (inflated)
    frustum becomes empty, so traversal skips it. Culling is applied at the
    finest level and re-reduced, keeping any/all levels consistent.
    """
    planes = frustum_planes(view_proj)
    occ = pyramid.code_levels[0] > 0
    dz, dy, dx = occ.shape
    origin = jnp.asarray(grid_origin, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)
    xs = origin[0] + jnp.arange(dx, dtype=jnp.float32) * vs
    ys = origin[1] + jnp.arange(dy, dtype=jnp.float32) * vs
    zs = origin[2] + jnp.arange(dz, dtype=jnp.float32) * vs
    # Separable p-vertex test: a voxel is outside iff for some plane
    # (a,b,c,d) the positive vertex satisfies a*px+b*py+c*pz+d < -margin,
    # and px depends only on x (px = x + vs when a > 0), so each plane's
    # distance field is a sum of three 1-D terms — evaluated by broadcast,
    # never materializing a [Z,Y,X,3] corner grid (12 GB at the reference's
    # 1000^3 ingest clamp; this form peaks at one [Z,Y,X] bool).
    visible = jnp.ones(occ.shape, bool)
    for p in range(6):
        a, b, c, d = planes[p, 0], planes[p, 1], planes[p, 2], planes[p, 3]
        px = a * (xs + jnp.where(a > 0, vs, 0.0))
        py = b * (ys + jnp.where(b > 0, vs, 0.0))
        pz = c * (zs + jnp.where(c > 0, vs, 0.0))
        dist = px[None, None, :] + py[None, :, None] + pz[:, None, None] + d
        # test_aabb inflates the box by margin per axis; along the plane
        # normal that is margin * (|a|+|b|+|c|), reproduced exactly here.
        infl = margin * (jnp.abs(a) + jnp.abs(b) + jnp.abs(c))
        visible &= dist >= -infl
    from ray_tracing_octrees_tpu.core.octree import build_pyramid

    return build_pyramid(occ & visible)


@jax.jit
def compact_visible_nodes(tree: LinearOctree, visible: jax.Array):
    """Node-buffer compaction with child remap (RayTracerBVH.cpp:765-813).

    visible: bool[N]. Returns (tree2, new_count) where tree2 has the visible
    nodes moved to the front in original relative order, children of culled
    nodes set to -1, and trailing slots zero-padded (static shape N).
    """
    n = tree.num_nodes
    vis = visible & jnp.ones(n, bool)
    vis = vis.at[0].set(True)  # root always kept (reference keeps index 0)
    new_idx = jnp.cumsum(vis.astype(jnp.int32)) - 1
    new_count = vis.sum()
    slots = jnp.where(vis, new_idx, n)

    def scatter(a, fill=0):
        out = jnp.full((n,) + a.shape[1:], fill, a.dtype)
        return out.at[slots].set(a, mode="drop")

    # Child remap: old child -> new index if that child is visible else -1.
    child = tree.children
    child_ok = (child >= 0) & vis[jnp.clip(child, 0, n - 1)]
    remapped = jnp.where(child_ok, new_idx[jnp.clip(child, 0, n - 1)], -1)

    tree2 = dataclasses.replace(
        tree,
        x=scatter(tree.x),
        y=scatter(tree.y),
        z=scatter(tree.z),
        size=scatter(tree.size),
        is_leaf=scatter(tree.is_leaf),
        is_solid=scatter(tree.is_solid),
        is_uniform=scatter(tree.is_uniform),
        children=scatter(remapped, fill=-1),
        level=scatter(tree.level),
    )
    return tree2, new_count
