"""Multi-chip sharded tracing: GSPMD and explicit-collective paths.

Two idioms, both producing identical images:

1. ``render_image_sharded`` — the GSPMD recipe: annotate input/output
   shardings on a single jitted program (rays over ``dp``, grid Z-slabs
   over ``tp``) and let XLA insert the collectives.

2. ``trace_shardmap`` — explicit ``shard_map``: each device all-gathers the
   grid Z-slabs over ``tp`` (the ICI collective), rebuilds the local
   pyramid, and traces its private slab of rays; results concatenate over
   ``dp`` with zero communication.

The Z-slab decomposition deliberately mirrors the reference's partial
Z-slab cache loads (CacheUtils.cpp:60-111) — the on-disk layout IS the
shard layout, so multi-host loading streams each shard directly.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ray_tracing_octrees_tpu.core.octree import build_pyramid
from ray_tracing_octrees_tpu.trace.octree_trace import trace_octree
from ray_tracing_octrees_tpu.models.octree_raytracer import lambert_shade


def _pad_to_multiple(a: jax.Array, axis: int, m: int) -> jax.Array:
    pad = (-a.shape[axis]) % m
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


def trace_sharded(
    mesh: Mesh,
    occ: jax.Array,          # uint8[Z, Y, X]
    origins: jax.Array,      # f32[N, 3]
    directions: jax.Array,   # f32[N, 3]
    grid_origin,
    voxel_size,
    max_steps: int = 512,
):
    """GSPMD-sharded trace: rays over dp, occupancy Z-slabs over tp.

    XLA inserts the all-gather of the grid (tp) and keeps ray state local
    (dp). Returns the trace result dict with dp-sharded leaves.
    """
    dp = mesh.shape["dp"]
    tp = mesh.shape["tp"]
    occ = _pad_to_multiple(jnp.asarray(occ), 0, tp)
    origins = _pad_to_multiple(origins, 0, dp)
    directions = _pad_to_multiple(directions, 0, dp)

    occ_s = jax.device_put(occ, NamedSharding(mesh, P("tp", None, None)))
    o_s = jax.device_put(origins, NamedSharding(mesh, P("dp", None)))
    d_s = jax.device_put(directions, NamedSharding(mesh, P("dp", None)))

    @functools.partial(jax.jit, static_argnames=("max_steps",))
    def step(occ_in, o_in, d_in, g0, vs, max_steps):
        pyr = build_pyramid(occ_in)
        return trace_octree(pyr, o_in, d_in, g0, vs, max_steps=max_steps)

    return step(
        occ_s,
        o_s,
        d_s,
        jnp.asarray(grid_origin, jnp.float32),
        jnp.asarray(voxel_size, jnp.float32),
        max_steps,
    )


def trace_shardmap(
    mesh: Mesh,
    occ: jax.Array,
    origins: jax.Array,
    directions: jax.Array,
    grid_origin,
    voxel_size,
    max_steps: int = 512,
):
    """Explicit shard_map trace: all_gather grid over tp, private rays on dp."""
    dp = mesh.shape["dp"]
    tp = mesh.shape["tp"]
    occ = _pad_to_multiple(jnp.asarray(occ), 0, tp)
    origins = _pad_to_multiple(origins, 0, dp)
    directions = _pad_to_multiple(directions, 0, dp)
    g0 = jnp.asarray(grid_origin, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)

    def local(occ_slab, o_loc, d_loc):
        # ICI collective: reassemble the full grid from Z-slabs.
        occ_full = jax.lax.all_gather(occ_slab, "tp", axis=0, tiled=True)
        pyr = build_pyramid(occ_full)
        return trace_octree(pyr, o_loc, d_loc, g0, vs, max_steps=max_steps)

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("tp", None, None), P("dp", None), P("dp", None)),
        out_specs=dict(
            hit=P("dp"), t=P("dp"), point=P("dp", None),
            normal=P("dp", None), steps=P("dp"),
        ),
        check_rep=False,
    )
    return jax.jit(f)(occ, origins, directions)


def render_image_sharded(
    mesh: Mesh,
    occ: jax.Array,
    origins: jax.Array,
    directions: jax.Array,
    grid_origin,
    voxel_size,
    light_dir=(-1.0, -1.0, -1.0),
    base_color=(1.0, 0.8, 0.6),
    ambient=(0.1, 0.1, 0.1),
    max_steps: int = 512,
    shadows: bool = True,
):
    """Full sharded render step (trace + shadow + shade), GSPMD style.

    This is the multi-chip "training step" analog: grid Z-sharded over tp,
    rays/pixels sharded over dp, one jitted program end to end.
    """
    dp = mesh.shape["dp"]
    tp = mesh.shape["tp"]
    n_rays = origins.shape[0]
    occ = _pad_to_multiple(jnp.asarray(occ), 0, tp)
    origins = _pad_to_multiple(origins, 0, dp)
    directions = _pad_to_multiple(directions, 0, dp)

    occ_s = jax.device_put(occ, NamedSharding(mesh, P("tp", None, None)))
    o_s = jax.device_put(origins, NamedSharding(mesh, P("dp", None)))
    d_s = jax.device_put(directions, NamedSharding(mesh, P("dp", None)))
    out_sharding = NamedSharding(mesh, P("dp", None))

    @functools.partial(
        jax.jit,
        static_argnames=("max_steps", "shadows"),
        out_shardings=out_sharding,
    )
    def step(occ_in, o_in, d_in, g0, vs, max_steps, shadows):
        pyr = build_pyramid(occ_in)
        res = trace_octree(pyr, o_in, d_in, g0, vs, max_steps=max_steps)
        color = lambert_shade(
            res["normal"], res["hit"], light_dir, base_color, ambient
        )
        if shadows:
            l = jnp.asarray(light_dir, jnp.float32)
            l = l / jnp.linalg.norm(l)
            so = res["point"] + res["normal"] * (vs * 2.0)
            sd = jnp.broadcast_to(-l[None, :], so.shape)
            sres = trace_octree(pyr, so, sd, g0, vs, max_steps=max_steps)
            occl = sres["hit"] & res["hit"]
            amb = jnp.asarray(ambient, jnp.float32)
            color = jnp.where(occl[:, None], jnp.broadcast_to(amb, color.shape), color)
        return jnp.concatenate(
            [color, jnp.ones((color.shape[0], 1), jnp.float32)], axis=-1
        )

    img = step(
        occ_s,
        o_s,
        d_s,
        jnp.asarray(grid_origin, jnp.float32),
        jnp.asarray(voxel_size, jnp.float32),
        max_steps,
        shadows,
    )
    return img[:n_rays]


def trace_segmented(
    mesh: Mesh,
    occ: jax.Array,
    origins: jax.Array,
    directions: jax.Array,
    grid_origin,
    voxel_size,
    max_steps: int = 512,
):
    """Sequence-parallel tracing: rays split into per-device Z-SEGMENTS.

    The SP analog from SURVEY §2.8: each device holds only its Z-slab of the
    grid and traces every ray through *its own segment*; first-hit combines
    across devices with an associative min over entry-t (front-to-back
    "over" compositing degenerates to nearest-hit for opaque voxels). The
    grid never leaves its shard — memory per device is 1/tp of the scene —
    and the only communication is one tiny per-ray min-reduction.

    Returns the trace dict with dp-sharded rays; hit/t/point/normal combined
    across tp.
    """
    dp = mesh.shape["dp"]
    tp = mesh.shape["tp"]
    occ = _pad_to_multiple(jnp.asarray(occ), 0, tp)
    origins = _pad_to_multiple(origins, 0, dp)
    directions = _pad_to_multiple(directions, 0, dp)
    g0 = jnp.asarray(grid_origin, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)
    slab_z = occ.shape[0] // tp
    big = jnp.float32(3e38)

    def local(occ_slab, o_loc, d_loc):
        zi = jax.lax.axis_index("tp")
        # local slab grid: origin shifted by the slab's Z offset
        local_origin = g0 + jnp.array([0.0, 0.0, 1.0]) * (
            zi.astype(jnp.float32) * slab_z * vs
        )
        pyr = build_pyramid(occ_slab)
        res = trace_octree(pyr, o_loc, d_loc, local_origin, vs, max_steps=max_steps)
        t = jnp.where(res["hit"], res["t"], big)
        # nearest segment hit wins (associative min over the ring)
        t_min = jax.lax.pmin(t, "tp")
        won = res["hit"] & (t == t_min)
        hit_any = t_min < big

        def pick(x):
            x = jnp.where(won.reshape((-1,) + (1,) * (x.ndim - 1)), x, 0)
            return jax.lax.psum(x, "tp")

        return dict(
            hit=hit_any,
            t=jnp.where(hit_any, t_min, 0.0),
            point=pick(res["point"]),
            normal=pick(res["normal"]),
            steps=jax.lax.psum(res["steps"], "tp"),
        )

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("tp", None, None), P("dp", None), P("dp", None)),
        out_specs=dict(
            hit=P("dp"), t=P("dp"), point=P("dp", None),
            normal=P("dp", None), steps=P("dp"),
        ),
        check_rep=False,
    )
    return jax.jit(f)(occ, origins, directions)


def sweep_packed_segmented(
    mesh: Mesh,
    volume,             # f32[Z, Y, X]
    shadow_vol,         # f32[Z, Y, X] from slab_sweep.shadow_volume, or None
    grid_origin,
    voxel_size,
    camera_pos,
    view,
    fov_deg: float,
    aspect: float,
    inter_h=None,
    inter_w=None,
    axis: str = "sp",
    light_dir=(-1.0, -1.0, -1.0),
    base_color=(1.0, 0.8, 0.6),
    ambient=(0.1, 0.1, 0.1),
):
    """The PRODUCTION slab-sweep first-hit, slab-segmented across chips.

    The SP decomposition of the headline fast frame (trace/slab_sweep.py):
    each device holds 1/n of the sweep-layout slab rows (the same Z-slab
    partitioning as the reference's partial cache loads,
    CacheUtils.cpp:62-111, rotated into sweep order), sweeps ONLY its
    segment with the global row offset ``o_base``, and the global first
    hit per texel is the plain ``pmin`` of per-device first-hit rows
    (ray order == layout row order; the miss sentinel s_valid + 1 loses
    every min). The winning segment's shadow sample follows via the
    pick-and-psum trick (row indices are globally unique, so exactly one
    device can win). Returns (packed field as _sweep_all, scal, geometry
    statics) — bit-identical to the single-device sweep by construction,
    asserted by tests/test_parallel.py.
    """
    from ray_tracing_octrees_tpu.trace import slab_sweep as ss

    ndev = mesh.shape[axis]
    axis_world, flip, (S, A, B), eyes, window, crop_lo = ss._sweep_geometry(
        volume, np.asarray(grid_origin), float(voxel_size), camera_pos, view)
    auto_h, auto_w = ss._auto_inter(window)
    inter_h = auto_h if inter_h is None else inter_h
    inter_w = auto_w if inter_w is None else inter_w
    vol_bf = ss._layout_volume(volume, axis_world, flip, S, A, B, crop_lo)
    sp = vol_bf.shape[0]
    sp_pad = (-sp) % (32 * ndev)
    if sp_pad:
        vol_bf = jnp.concatenate(
            [vol_bf, jnp.zeros((sp_pad, A, B), vol_bf.dtype)], 0)
    sp_t = sp + sp_pad
    sp_l = sp_t // ndev

    origin_c = np.asarray(grid_origin, np.float32) + np.asarray(
        ss._AXIS_SELECTORS[axis_world][0], np.float32
    ) * (crop_lo * float(voxel_size))
    scal_np = ss._frame_scalars_np(
        *eyes[:3], eyes[3], *window, fov_deg, aspect, float(voxel_size), S,
        origin_c, np.asarray(camera_pos, np.float32), view,
        light_dir, base_color, ambient,
    )
    scal = jnp.asarray(scal_np)
    has_shadow = shadow_vol is not None
    shv = ss._shadow_relayout(
        shadow_vol, axis_world, bool(flip), sp_t, A, B,
        crop_lo=crop_lo, s_keep=S,
    ) if has_shadow else jnp.zeros((sp_t, 1, 1), jnp.bfloat16)

    vol_s = jax.device_put(vol_bf, NamedSharding(mesh, P(axis, None, None)))
    shv_s = jax.device_put(shv, NamedSharding(mesh, P(axis, None, None)))

    def local(vol_slab, shv_slab, scal_r):
        ob = jax.lax.axis_index(axis) * sp_l
        first_o, sh_first = ss._sweep_core(
            vol_slab, scal_r, sp_l // 32, S, A, B, inter_h, inter_w,
            bool(flip), shadow_sw=shv_slab if has_shadow else None,
            o_base=ob,
        )
        fo = jax.lax.pmin(first_o, axis)
        if has_shadow:
            won = (first_o == fo) & (fo < jnp.float32(S))
            shw = jax.lax.psum(jnp.where(won, sh_first, 0.0), axis)
        else:
            shw = jnp.zeros_like(fo)
        return fo, shw

    @jax.jit
    def run(vol_in, shv_in, scal_in):
        fo, shw = shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis, None, None), P(axis, None, None), P()),
            out_specs=(P(None, None), P(None, None)),
            check_rep=False,
        )(vol_in, shv_in, scal_in)
        return ss._pack_first_o(fo, shw, S, bool(flip), has_shadow)

    packed = run(vol_s, shv_s, scal)
    return packed, scal, dict(
        axis_world=axis_world, flip=bool(flip), S=S, A=A, B=B,
        inter_h=inter_h, inter_w=inter_w, has_shadow=has_shadow,
        scal_np=scal_np,
    )


def sweep_frame_segmented(
    mesh: Mesh,
    volume,
    shadow_vol,
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
    inter_h=None,
    inter_w=None,
    axis: str = "sp",
):
    """Full fast frame (sweep + warp + Lambert/shadow shade) with the
    sweep slab-segmented across the mesh — the multi-chip variant of
    slab_sweep.render_fast_frame(fused=False). The packed table comes
    back replicated from the pmin combine, and the per-pixel warp + shade
    run as ordinary replicated jit (per-pixel work is ~2 ms/frame — the
    sweep is the part worth scaling)."""
    from ray_tracing_octrees_tpu.trace import slab_sweep as ss

    packed, scal, meta = sweep_packed_segmented(
        mesh, volume, shadow_vol, grid_origin, voxel_size, camera_pos,
        view, fov_deg, aspect, inter_h=inter_h, inter_w=inter_w, axis=axis,
        light_dir=light_dir, base_color=base_color, ambient=ambient,
    )
    ih, iw = meta["inter_h"], meta["inter_w"]
    lin, behind, dirs, d_s_n = ss._warp_setup(
        scal, meta["axis_world"], ih, iw, width, height)
    # Pallas one-hot warp on TPU (the headline's per-pixel lookup rate);
    # _plan_warp_cfg returns None on CPU, keeping the XLA gather there.
    warp_cfg = ss._plan_warp_cfg(
        meta["scal_np"], meta["axis_world"], ih, iw, width, height)
    w_val = ss._warp_values(packed, lin, ih, iw, width, height, warp_cfg)
    return ss._finish_shade(w_val, behind, dirs, d_s_n, scal, width, height,
                            meta["has_shadow"])


def volume_frame_segmented(
    mesh: Mesh,
    scene,             # trace.raymarch_sweep.VolumeSweepScene
    grid_origin,
    camera_pos,
    view,
    fov_deg: float,
    aspect: float,
    width: int,
    height: int,
    time_value: float = 0.0,
    axis: str = "sp",
):
    """The VOLUME_RAYCAST fast frame, slab-segmented across chips.

    The SP analog SURVEY §2.8 calls for on the raymarch loop: each device
    holds 1/n of the sweep-layout slab rows of the detection and packed
    field volumes, sweeps only its segment (``_volume_sweep_core`` with a
    global row offset), the global first hit is one ``pmin``, and the
    winning segment's field values follow by pick-and-psum (globally
    unique rows => exactly one winner). Warp + shading epilogue run
    replicated (per-pixel closed forms). Matches single-device
    ``render_volume_frame`` bit-for-bit by construction; asserted by
    tests/test_parallel.py.
    """
    from ray_tracing_octrees_tpu.trace import raymarch_sweep as rs

    ndev = mesh.shape[axis]
    det_bf, cats, scal_np, m = rs._volume_frame_inputs(
        scene, grid_origin, camera_pos, view, fov_deg, aspect)
    S, A, B = m["S"], m["A"], m["B"]
    ih, iw, nf, flip = m["inter_h"], m["inter_w"], m["nf"], m["flip"]
    axis_world = m["axis_world"]
    sp = det_bf.shape[0]
    sp_pad = (-sp) % (32 * ndev)
    if sp_pad:
        det_bf = jnp.concatenate(
            [det_bf, jnp.zeros((sp_pad, A, B), det_bf.dtype)], 0)
        cats = [jnp.concatenate(
            [c, jnp.zeros((sp_pad,) + c.shape[1:], c.dtype)], 0)
            for c in cats]
    sp_t = det_bf.shape[0]
    sp_l = sp_t // ndev

    sh = NamedSharding(mesh, P(axis, None, None))
    det_s = jax.device_put(det_bf, sh)
    cats_s = tuple(jax.device_put(c, sh) for c in cats)
    scal = jnp.asarray(scal_np)

    def local(det_l, cats_l, scal_r):
        ob = jax.lax.axis_index(axis) * sp_l
        fo, vals = rs._volume_sweep_core(
            det_l, cats_l, scal_r, sp_l // 32, S, A, B, ih, iw, flip, nf,
            o_base=ob)
        fo_g = jax.lax.pmin(fo, axis)
        won = (fo == fo_g) & (fo_g < jnp.float32(S))
        vals_g = tuple(
            jax.lax.psum(jnp.where(won, v, 0.0), axis) for v in vals)
        return fo_g, vals_g

    @jax.jit
    def run(det_in, cats_in, scal_in, tv):
        fo, vals = shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis, None, None),
                      tuple(P(axis, None, None) for _ in cats_in), P()),
            out_specs=(P(None, None),
                       tuple(P(None, None) for _ in cats_in)),
            check_rep=False,
        )(det_in, cats_in, scal_in)
        packed, flat_vals = rs._pack_volume_first_o(fo, vals, S, flip)
        lin, behind, dirs, d_s_n = rs._warp_setup(
            scal_in, axis_world, ih, iw, width, height)
        safe = jnp.maximum(lin, 0)
        w_depth = jnp.where(lin < 0, -1.0, jnp.take(packed, safe))
        w_vals = tuple(
            jnp.where(lin < 0, 0.0, jnp.take(v, safe)) for v in flat_vals)
        return rs._shade_pixels(w_depth, w_vals, behind, dirs, d_s_n,
                                scal_in, tv, width, height)

    return run(det_s, cats_s, scal, jnp.asarray(time_value, jnp.float32))


def marching_cubes_halo(
    mesh: Mesh,
    occ: jax.Array,
    grid_origin,
    voxel_size,
    max_triangles_per_shard: int,
):
    """Tensor-parallel Marching Cubes on Z-slab-resident grids.

    SURVEY §2.8's TP row made concrete: the grid lives sharded in Z-slabs
    over ``tp`` (mirroring loadVoxelGridPartial's slab layout,
    CacheUtils.cpp:62-111) and never all-gathers. Each MC cell reads a +1
    lattice halo in Z, so every shard ppermutes its FIRST occupancy layer
    to its -Z neighbor once per extraction — the only communication; the
    last shard's halo is EMPTY padding, and cells at global z >= Z-1 are
    masked so the output equals dense single-device MC exactly.

    Returns (verts f32[tp * cap, 3, 3], normals f32[tp * cap, 3],
    counts i32[tp]) — shard s's triangles occupy verts[s*cap : s*cap +
    counts[s]].
    """
    from ray_tracing_octrees_tpu.core.grid import VoxelGrid
    from ray_tracing_octrees_tpu.ops.marching_cubes import marching_cubes_grid

    tp = mesh.shape["tp"]
    occ = jnp.asarray(occ)
    Z = occ.shape[0]
    occ = _pad_to_multiple(occ, 0, tp)
    zl = occ.shape[0] // tp
    g0 = jnp.asarray(grid_origin, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)
    cap = max_triangles_per_shard

    def local(occ_slab):
        zi = jax.lax.axis_index("tp")
        # +Z halo: every shard sends its FIRST layer one step down the ring
        halo = jax.lax.ppermute(
            occ_slab[:1], "tp",
            [(i, (i - 1) % tp) for i in range(tp)],
        )
        halo = jnp.where(zi == tp - 1, jnp.zeros_like(halo), halo)
        occ_ext = jnp.concatenate([occ_slab, halo], axis=0)  # [zl+1, Y, X]

        local_origin = g0 + jnp.array([0.0, 0.0, 1.0]) * (
            zi.astype(jnp.float32) * zl * vs
        )
        lgrid = VoxelGrid(occ=occ_ext, origin=local_origin, voxel_size=vs)
        # mask cells whose GLOBAL z has no dense-MC counterpart
        cz = jnp.arange(zl)[:, None, None] + zi * zl
        cell_mask = jnp.broadcast_to(
            cz < Z - 1, (zl, occ_ext.shape[1] - 1, occ_ext.shape[2] - 1)
        )
        verts, normals, count = marching_cubes_grid(
            lgrid, max_triangles=cap, cell_mask=cell_mask
        )
        return verts, normals, count.reshape(1).astype(jnp.int32)

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("tp", None, None),),
        out_specs=(P("tp", None, None), P("tp", None), P("tp")),
        check_rep=False,
    )
    return jax.jit(f)(occ)
