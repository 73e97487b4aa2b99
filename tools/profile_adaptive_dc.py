"""Phase-attributed timing of the warm adaptive-DC Calgary extraction.

Runs adaptive_dual_contouring once to compile, then times warm full calls
(host-output and device_out, with and without the node-id volume) plus
each internal phase separately.

Usage: python tools/profile_adaptive_dc.py
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
from ray_tracing_octrees_tpu.core.grid import recenter_filled_voxels, host_fetch
from ray_tracing_octrees_tpu.core.octree import (
    build_linear_octree,
    build_node_id_volume,
)
from ray_tracing_octrees_tpu.ops import dual_contouring as dc
from ray_tracing_octrees_tpu.ops.dual_contouring import (
    adaptive_dual_contouring,
    tree_host_meta,
)


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out) if out is not None else None
    dt = time.perf_counter() - t0
    print(f"{label:46s} {dt*1e3:10.1f} ms", flush=True)
    return out


def main():
    g = recenter_filled_voxels(load_voxel_grid("/root/reference/sceneCache.bin"))
    tree = t("build_linear_octree", lambda: build_linear_octree(g.occ))
    id_vol = t("build_node_id_volume", lambda: build_node_id_volume(tree))
    meta = t("tree_host_meta", lambda: tree_host_meta(tree))
    accel = dict(node_id_vol=id_vol, tree_meta=meta)

    t0 = time.perf_counter()
    v, n, c = adaptive_dual_contouring(g, tree, **accel)
    print(f"{'cold full extraction':46s} {(time.perf_counter()-t0)*1e3:10.1f} ms"
          f"  ({c} tris)", flush=True)

    for rep in range(2):
        t0 = time.perf_counter()
        v, n, c = adaptive_dual_contouring(g, tree, **accel)
        print(f"{'warm full (host out, accel)':46s} "
              f"{(time.perf_counter()-t0)*1e3:10.1f} ms", flush=True)
    for rep in range(2):
        t0 = time.perf_counter()
        vd, nd, cd = adaptive_dual_contouring(g, tree, device_out=True, **accel)
        jax.block_until_ready(vd)
        print(f"{'warm full (device out, accel)':46s} "
              f"{(time.perf_counter()-t0)*1e3:10.1f} ms  ({cd} tris)",
              flush=True)
    assert int(cd) == int(c)

    # phase-attributed warm pass (mirror of adaptive_dual_contouring)
    qef_cfg = dc.QEFConfig()
    dc_cfg = dc.DCConfig()
    leaf, level = meta
    n_nodes = tree.num_nodes

    def _pad_pow2(ids, lo=64):
        n_ = len(ids)
        p = max(lo, 1 << int(np.ceil(np.log2(max(1, n_)))))
        return np.concatenate([ids, np.full(p - n_, ids[0], ids.dtype)]), n_

    levels_present = sorted(set(level[leaf].tolist()))
    print("levels:", levels_present,
          [int((leaf & (level == k)).sum()) for k in levels_present],
          flush=True)

    surface_by_level = {}
    need_vertex = jnp.zeros((n_nodes,), bool)
    adj_by_level = {}
    t0 = time.perf_counter()
    for k in levels_present:
        ids = np.nonzero(leaf & (level == k))[0].astype(np.int32)
        if len(ids) == 0:
            continue
        tk = time.perf_counter()
        ids, n_real = _pad_pow2(ids)
        ids_j = jnp.asarray(ids)
        s = 1 << k
        surf, adj, need_vertex = dc._pass0_level(
            g, tree, id_vol, ids_j, jnp.int32(n_real), None, need_vertex,
            s=s, max_ratio=float(dc_cfg.max_size_ratio))
        jax.block_until_ready(surf)
        print(f"  pass0 level {k} ({len(ids)} ids)"
              f"{'':20s} {(time.perf_counter()-tk)*1e3:10.1f} ms", flush=True)
        surface_by_level[k] = (ids_j, surf)
        adj_by_level[k] = adj
    print(f"{'pass0 total':46s} {(time.perf_counter()-t0)*1e3:10.1f} ms",
          flush=True)

    vertex = dc._node_centers(tree, g)
    need_np = t("host_fetch need_vertex", lambda: host_fetch(need_vertex)).astype(bool)
    t0 = time.perf_counter()
    for k in levels_present:
        ids = np.nonzero(leaf & (level == k) & need_np)[0].astype(np.int32)
        if len(ids) == 0:
            continue
        tk = time.perf_counter()
        ids, _ = _pad_pow2(ids)
        ids_j = jnp.asarray(ids)
        s = 1 << k
        stride = (dc_cfg.stride_large_cell
                  if s > dc_cfg.stride_switch_size else 1)
        vertex = dc._pass1_level(g, tree, vertex, ids_j, s, stride, qef_cfg)
        jax.block_until_ready(vertex)
        print(f"  pass1 level {k} ({len(ids)} ids)"
              f"{'':20s} {(time.perf_counter()-tk)*1e3:10.1f} ms", flush=True)
    print(f"{'pass1 total':46s} {(time.perf_counter()-t0)*1e3:10.1f} ms",
          flush=True)

    out_verts, out_normals = [], []
    emitted_any = jnp.zeros((n_nodes,), bool)
    lvls2 = [k for k in levels_present if k in adj_by_level]
    t0 = time.perf_counter()
    ids_cat = jnp.concatenate([surface_by_level[k][0] for k in lvls2])
    adj_cat = []
    for d in range(3):
        crossing = jnp.concatenate([adj_by_level[k][d][0] for k in lvls2])
        infos = []
        for j in range(3):
            nid = jnp.concatenate([adj_by_level[k][d][1][j][0] for k in lvls2])
            ok = jnp.concatenate([adj_by_level[k][d][1][j][1] for k in lvls2])
            infos.append((nid, ok))
        adj_cat.append((crossing, infos))
    v_f, n_f, k_f, emitted_any = dc._pass2_level(
        tree, vertex, ids_cat, adj_cat, emitted_any,
        area_eps=float(dc_cfg.degenerate_area_eps))
    jax.block_until_ready(k_f)
    print(f"{'pass2 (one fused call)':46s} {(time.perf_counter()-t0)*1e3:10.1f} ms",
          flush=True)
    out_verts.append((v_f, k_f))
    out_normals.append(n_f)

    t0 = time.perf_counter()
    fan = dc._boundary_face_fans(g, tree, vertex, surface_by_level,
                                 emitted_any, dc_cfg, _pad_pow2,
                                 id_vol=id_vol)
    jax.block_until_ready(fan[0]) if fan[0] is not None else None
    print(f"{'pass3 boundary fans':46s} {(time.perf_counter()-t0)*1e3:10.1f} ms",
          flush=True)

    if fan[0] is not None:
        out_verts.append((fan[0], fan[2]))
        out_normals.append(fan[1])
    k_list = [kk for _, kk in out_verts]
    t0 = time.perf_counter()
    total = int(host_fetch(dc._count_tris(k_list)))
    print(f"{'count fetch':46s} {(time.perf_counter()-t0)*1e3:10.1f} ms",
          flush=True)
    out_cap = max(4096, -(-max(total, 1) // 65536) * 65536)
    t0 = time.perf_counter()
    v_rows, n_rows = dc._compact_gather(
        [v for v, _ in out_verts], out_normals, k_list, out_cap=out_cap)
    jax.block_until_ready(v_rows)
    print(f"{'compact gather (device)':46s} {(time.perf_counter()-t0)*1e3:10.1f} ms",
          flush=True)
    t0 = time.perf_counter()
    verts = host_fetch(v_rows)[:total]
    normals = host_fetch(n_rows)[:total]
    print(f"{'final host fetch':46s} {(time.perf_counter()-t0)*1e3:10.1f} ms"
          f"  ({total} tris, cap {out_cap})", flush=True)


if __name__ == "__main__":
    main()
