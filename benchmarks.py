"""The BASELINE.json config ladder — one JSON line per configuration.

  1. sphere 64^3 -> octree -> Marching Cubes mesh + triangle count
  2. sphere 128^3 volume raycast (DDA march) at 512x512, depth+normal
  3. Calgary voxelize -> adaptive Dual Contouring with QEF solves
  4. extracted MC mesh -> LBVH build -> wavefront trace 1080p primary+shadow
  5. full Calgary scene: octree + frustum-culled 4K fly-through

Usage: python benchmarks.py [config-numbers...]  (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _bench(fn, sync, iters=3):
    import jax

    out = fn()
    jax.block_until_ready(sync(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(sync(out))
    return out, (time.perf_counter() - t0) / iters


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def config1():
    import jax.numpy as jnp
    from ray_tracing_octrees_tpu.core.grid import make_sphere_grid
    from ray_tracing_octrees_tpu.core.octree import build_linear_octree
    from ray_tracing_octrees_tpu.ops.marching_cubes import (
        marching_cubes_grid, count_mc_triangles,
    )

    g = make_sphere_grid(64)
    tree = build_linear_octree(g.occ)
    total = int(count_mc_triangles(g))
    out, dt = _bench(
        lambda: marching_cubes_grid(g, max_triangles=total + 16),
        lambda o: o[0],
    )
    _emit(
        config="sphere64_mc",
        triangles=total,
        octree_nodes=tree.num_nodes,
        extract_ms=round(dt * 1e3, 3),
        tris_per_s=round(total / dt, 1),
    )


def config2():
    import jax.numpy as jnp
    from ray_tracing_octrees_tpu.core.grid import make_sphere_grid
    from ray_tracing_octrees_tpu.core.octree import build_pyramid
    from ray_tracing_octrees_tpu.models.octree_raytracer import render_octree_image
    from ray_tracing_octrees_tpu.render.camera import Camera, generate_rays
    from ray_tracing_octrees_tpu.trace.octree_trace import trace_octree

    g = make_sphere_grid(128)
    pyr = build_pyramid(g.occ)
    cam = Camera(theta=0.4, phi=0.8, radius=2.0)
    o, d = generate_rays(
        512, 512, jnp.asarray(cam.get_pos(), jnp.float32),
        jnp.asarray(cam.get_view(), jnp.float32), 45.0, 1.0,
    )
    out, dt = _bench(
        lambda: trace_octree(pyr, o, d, g.origin, g.voxel_size),
        lambda r: r["t"],
    )
    hits = int(np.asarray(out["hit"]).sum())

    # fast slab-sweep variant of the same depth buffer
    from ray_tracing_octrees_tpu.trace.slab_sweep import sweep_first_hit

    vol = (jnp.asarray(g.occ) > 0).astype(jnp.float32)
    out2, dt2 = _bench(
        lambda: sweep_first_hit(
            vol, g.origin, g.voxel_size, cam.get_pos(), cam.get_view(),
            45.0, 1.0, 512, 512,
        ),
        lambda r: r[1],
    )
    _emit(
        config="sphere128_raycast_512_depth_normal",
        rays=512 * 512,
        hits=hits,
        frame_ms=round(dt * 1e3, 3),
        mrays_per_s=round(512 * 512 / dt / 1e6, 3),
        sweep_frame_ms=round(dt2 * 1e3, 3),
        sweep_mrays_per_s=round(512 * 512 / dt2 / 1e6, 3),
    )


def config3():
    from ray_tracing_octrees_tpu.core.cache import load_voxel_grid
    from ray_tracing_octrees_tpu.core.grid import recenter_filled_voxels
    from ray_tracing_octrees_tpu.core.octree import build_linear_octree
    from ray_tracing_octrees_tpu.ops.dual_contouring import adaptive_dual_contouring

    path = "/root/reference/sceneCache.bin"
    if not os.path.exists(path):
        _emit(config="calgary_adaptive_dc", skipped="scene cache missing")
        return
    import jax

    from ray_tracing_octrees_tpu.core.octree import build_node_id_volume
    from ray_tracing_octrees_tpu.ops.dual_contouring import tree_host_meta

    g = recenter_filled_voxels(load_voxel_grid(path))
    tree = build_linear_octree(g.occ)
    # scene preprocessing, like g_octreeMap registered during the octree
    # build (OctreeVoxel.cpp:552-554): one-gather neighbor lookups + host
    # tree metadata for the per-pose extractions below
    id_vol = jax.block_until_ready(build_node_id_volume(tree))
    meta = tree_host_meta(tree)
    accel = dict(node_id_vol=id_vol, tree_meta=meta)
    t0 = time.perf_counter()
    verts, normals, count = adaptive_dual_contouring(g, tree, **accel)
    dt = time.perf_counter() - t0
    # warm pass: programs compiled, caches primed — the steady-state
    # per-pose extraction cost (VERDICT r2 task 6 target: < 2 s)
    t0 = time.perf_counter()
    verts2, _, count2 = adaptive_dual_contouring(g, tree, **accel)
    dt_warm = time.perf_counter() - t0
    assert int(count2) == int(count)
    # device-resident variant: triangles stay on chip for the rasterizer
    # (the reference's analog hands the vector straight to a VBO) — the
    # host round trip above is ~16 MB through the tunnel
    v_d, n_d, c_d = adaptive_dual_contouring(g, tree, device_out=True, **accel)
    jax.block_until_ready(v_d)
    t0 = time.perf_counter()
    v_d, n_d, c_d = adaptive_dual_contouring(g, tree, device_out=True, **accel)
    jax.block_until_ready(v_d)
    dt_dev = time.perf_counter() - t0
    assert int(c_d) == int(count)
    _emit(
        config="calgary_adaptive_dc_qef",
        triangles=int(count),
        octree_nodes=tree.num_nodes,
        extract_ms=round(dt * 1e3, 1),
        warm_extract_ms=round(dt_warm * 1e3, 1),
        warm_device_out_ms=round(dt_dev * 1e3, 1),
        tris_per_s=round(int(count) / dt_warm, 1),
    )


def config4():
    import jax.numpy as jnp
    from ray_tracing_octrees_tpu.core.cache import load_voxel_grid
    from ray_tracing_octrees_tpu.core.grid import (
        make_sphere_grid, recenter_filled_voxels, building_center,
    )
    from ray_tracing_octrees_tpu.ops.marching_cubes import (
        marching_cubes_grid, count_mc_triangles,
    )
    from ray_tracing_octrees_tpu.trace.lbvh import build_lbvh, trace_lbvh
    from ray_tracing_octrees_tpu.render.camera import Camera, generate_rays

    path = "/root/reference/sceneCache.bin"
    if os.path.exists(path):
        g = recenter_filled_voxels(load_voxel_grid(path))
        scene = "calgary"
    else:
        g = make_sphere_grid(128)
        scene = "sphere128"
    total = int(count_mc_triangles(g))
    verts, _, count = marching_cubes_grid(g, max_triangles=total)
    tris = jnp.asarray(verts)[: int(count)]
    t0 = time.perf_counter()
    bvh = build_lbvh(tris)
    import jax

    jax.block_until_ready(bvh.aabb_min)
    build_ms = (time.perf_counter() - t0) * 1e3

    extent = float(np.max(np.asarray(g.world_max) - np.asarray(g.world_min)))
    center = np.asarray(building_center(g))

    # Production path: the grid-wavefront MC-mesh tracer (trace/mesh_grid)
    # — MXU candidate sweep + exact Moller-Trumbore — at full 1080p with
    # a distinct camera pose per timed frame.
    from ray_tracing_octrees_tpu.trace.mesh_grid import (
        prepare_mc_scene, render_mc_mesh_frame,
    )

    to_light = (0.5, 0.9, 0.4)
    mscene = prepare_mc_scene(g.occ, g.origin, g.voxel_size,
                              to_light=to_light)
    W, H = 1920, 1088

    def mesh_frame(i):
        cam = Camera(theta=0.9 + 0.013 * i, phi=0.8 - 0.007 * i,
                     radius=0.75 * extent)
        cam.set_target(center)
        return render_mc_mesh_frame(
            mscene, cam.get_pos(), cam.get_view(), 45.0, W / H, W, H,
            light_dir=tuple(-c for c in to_light),
        )

    import jax as _jax

    img = mesh_frame(0)
    _jax.block_until_ready(img)
    n_frames = 10
    t0 = time.perf_counter()
    outs = [mesh_frame(1 + i) for i in range(n_frames)]
    _jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / n_frames
    hit_frac = float((np.asarray(outs[0][..., :3]).max(axis=-1) > 0).mean())
    _emit(
        config="mc_mesh_grid_trace",
        scene=scene,
        resolution=f"{W}x{H}",
        triangles=int(count),
        frame_ms=round(dt * 1e3, 1),
        mrays_per_s=round(W * H * 2 / dt / 1e6, 3),
        hit_fraction=round(hit_frac, 4),
    )

    # Exact general-mesh oracle (escape-link LBVH traversal) — scoped as
    # the correctness ORACLE, not a tracer (docs/PARITY.md: per-ray tree
    # traversal is gather-bound at a measured hardware floor two orders
    # under the config-4 bar; mesh_grid above is the production tracer).
    # Measured at a small frame so the oracle row costs ~20 s, not 97.
    Wq, Hq = 480, 270
    cam = Camera(theta=0.9, phi=0.8, radius=0.75 * extent)
    cam.set_target(center)
    o, d = generate_rays(
        Wq, Hq, jnp.asarray(cam.get_pos(), jnp.float32),
        jnp.asarray(cam.get_view(), jnp.float32), 45.0, Wq / Hq,
    )

    def frame():
        res = trace_lbvh(bvh, o, d, max_steps=4096)
        l = jnp.asarray([0.5, 0.9, 0.4])
        so = res["point"] + res["normal"] * 1e-3
        sd = jnp.broadcast_to(l / jnp.linalg.norm(l), so.shape)
        sres = trace_lbvh(bvh, so, sd, max_steps=4096)
        return res, sres

    out, dt = _bench(frame, lambda r: r[0]["t"], iters=1)
    _emit(
        config="mc_mesh_lbvh_trace_oracle",
        scene=scene,
        resolution=f"{Wq}x{Hq}",
        triangles=int(count),
        lbvh_build_ms=round(build_ms, 1),
        frame_ms=round(dt * 1e3, 1),
        mrays_per_s=round(Wq * Hq * 2 / dt / 1e6, 3),
        hit_fraction=round(float(np.asarray(out[0]["hit"]).mean()), 4),
    )


def config5():
    import jax.numpy as jnp
    from ray_tracing_octrees_tpu.core.cache import load_voxel_grid
    from ray_tracing_octrees_tpu.core.grid import (
        make_sphere_grid, recenter_filled_voxels, building_center,
    )
    from ray_tracing_octrees_tpu.trace.slab_sweep import (
        render_fast_frame, shadow_volume,
    )
    from ray_tracing_octrees_tpu.render.camera import Camera

    path = "/root/reference/sceneCache.bin"
    if os.path.exists(path):
        g = recenter_filled_voxels(load_voxel_grid(path))
        scene = "calgary"
    else:
        g = make_sphere_grid(128)
        scene = "sphere128"
    vol = (jnp.asarray(g.occ) > 0).astype(jnp.float32)
    to_light = (0.5, 0.9, 0.4)
    light = tuple(-c for c in to_light)
    sv = shadow_volume(vol, to_light)

    extent = float(np.max(np.asarray(g.world_max) - np.asarray(g.world_min)))
    W, H = 3840, 2160  # 4K fly-through
    import jax

    center = np.asarray(building_center(g))
    wmin = np.asarray(g.world_min)
    wmax = np.asarray(g.world_max)

    def measure(poses, label):
        # Sustained fly-through: pipelined enqueues over the pose set
        # (every frame a DISTINCT pose; programs cached after warmup).
        # Timing single frames instead pays the ~25 ms tunnel RTT per
        # frame — that measures the link, not the chip.
        def f(cam):
            return render_fast_frame(
                vol, sv, g.origin, g.voxel_size,
                cam.get_pos(), cam.get_view(), 45.0, W / H, W, H,
                light_dir=light,
            )

        for cam in poses:  # warm every pose's program
            jax.block_until_ready(f(cam))
        reps = 4
        t0 = time.perf_counter()
        outs = []
        for k in range(reps):
            for cam in poses:
                cam.phi += 1e-4
                outs.append(f(cam))
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / (reps * len(poses))
        _emit(
            config=f"calgary_4k_flythrough_{label}",
            scene=scene,
            resolution=f"{W}x{H}",
            frame_ms=round(dt * 1e3, 1),
            fps=round(1.0 / dt, 2),
            mrays_per_s=round(W * H * 2 / dt / 1e6, 1),
        )
        return dt

    ext_poses = []
    for i in range(4):
        cam = Camera(theta=0.8 + 0.05 * i, phi=0.5 + 0.4 * i, radius=0.8 * extent)
        cam.set_target(center)
        ext_poses.append(cam)
    measure(ext_poses, "exterior")

    # fly-THROUGH: eyes inside the scene bounds (forward half-volume sweep)
    int_poses = []
    for i in range(2):
        tgt = center + np.array([0.25 * extent, 0.0, 0.0], np.float32)
        cam = Camera(theta=0.04, phi=1.45 + 0.02 * i, radius=0.22 * extent,
                     target=tgt.astype(np.float32))
        pos = cam.get_pos()
        inside = bool(((pos > wmin) & (pos < wmax)).all())
        if inside:
            int_poses.append(cam)
    if int_poses:
        measure(int_poses, "interior")


def config6():
    """VOLUME_RAYCAST mode (the reference's busiest kernel, raycastFS.glsl):
    full raymarch_volume with mip skipping, shadows, AO, TAA jitter."""
    import jax
    import jax.numpy as jnp
    from ray_tracing_octrees_tpu.config import DEFAULT_CONFIG
    from ray_tracing_octrees_tpu.core.cache import load_voxel_grid
    from ray_tracing_octrees_tpu.core.grid import (
        make_sphere_grid, recenter_filled_voxels, building_center,
    )
    from ray_tracing_octrees_tpu.core.octree import build_pyramid
    from ray_tracing_octrees_tpu.models.volume_raycaster import (
        VolumeRaycastRenderer,
    )
    from ray_tracing_octrees_tpu.render.camera import Camera

    path = "/root/reference/sceneCache.bin"
    if os.path.exists(path):
        g = recenter_filled_voxels(load_voxel_grid(path))
        scene = "calgary"
    else:
        g = make_sphere_grid(128)
        scene = "sphere128"
    rc = VolumeRaycastRenderer(DEFAULT_CONFIG).init(g, build_pyramid(g.occ))
    extent = float(np.max(np.asarray(g.world_max) - np.asarray(g.world_min)))
    center = np.asarray(building_center(g))

    # The production path is the sweep-space restructuring
    # (trace/raymarch_sweep.py, via draw_fast): first-hit detection sweep
    # + packed field fetch + closed-form shading epilogue. The per-ray
    # port (draw) stays as the reference-semantics oracle — it runs at
    # the TPU scalar-gather floor (26.6 s/frame at 256x512 on Calgary in
    # round 2) so it is measured small, for the record.
    for W, H in ((256, 256), (512, 512), (1920, 1080)):
        def frame_fast(i):
            cam = Camera(theta=0.9 + 0.01 * i, phi=0.8 - 0.005 * i,
                         radius=0.75 * extent)
            cam.set_target(center)
            return rc.draw_fast(cam, W, H, W / H)["color"]

        jax.block_until_ready(frame_fast(0))
        n = 20
        t0 = time.perf_counter()
        outs = [frame_fast(1 + i) for i in range(n)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / n
        _emit(
            config="volume_raymarch_sweep",
            scene=scene,
            resolution=f"{W}x{H}",
            frame_ms=round(dt * 1e3, 1),
            fps=round(1.0 / dt, 4),
            mrays_per_s=round(W * H / dt / 1e6, 4),
        )

    for W, H in ((128, 128), (256, 256)):
        def frame(i):
            cam = Camera(theta=0.9 + 0.01 * i, phi=0.8 - 0.005 * i,
                         radius=0.75 * extent)
            cam.set_target(center)
            return rc.draw(cam, W, H, W / H)["color"]

        img = frame(0)
        jax.block_until_ready(img)
        n = 2
        t0 = time.perf_counter()
        outs = [frame(1 + i) for i in range(n)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / n
        _emit(
            config="volume_raymarch_oracle",
            scene=scene,
            resolution=f"{W}x{H}",
            frame_ms=round(dt * 1e3, 1),
            fps=round(1.0 / dt, 4),
            mrays_per_s=round(W * H / dt / 1e6, 4),
        )

    # 512^2 oracle via the banded+segmented program (round 5: the
    # monolithic program's long dispatches kill the remote TPU worker —
    # trace/raymarch.py::raymarch_volume_banded) + sweep agreement, with
    # the skip-scale attribution: the reference's own distance-scaled
    # skipping (raycastFS.glsl:506, mix(0.001, 12.0, nd^3.5)) saturates
    # at Calgary's world scale and over-skips thin buildings; the
    # production sweep renders the unskipped integral (skips-off
    # agreement 98.6% at 128^2, tools/exp_oracle512.py measurements).
    try:
        from ray_tracing_octrees_tpu.trace.raymarch import (
            raymarch_volume_banded,
        )
        from ray_tracing_octrees_tpu.trace.raymarch_sweep import (
            prepare_volume_scene, render_volume_frame,
        )

        W = H = 512
        cam = Camera(theta=0.9, phi=0.8, radius=0.75 * extent)
        cam.set_target(center)
        inv_view = np.linalg.inv(np.asarray(cam.get_view(), np.float64))
        inv_proj = np.linalg.inv(np.asarray(cam.get_proj(1.0), np.float64))
        t0 = time.perf_counter()
        ref = raymarch_volume_banded(
            rc.textures, jnp.asarray(cam.get_pos(), jnp.float32),
            jnp.asarray(inv_view, jnp.float32),
            jnp.asarray(inv_proj, jnp.float32), W, H, band_rows=32,
            max_steps=800, segment_steps=100)
        dt = time.perf_counter() - t0
        vscene = prepare_volume_scene(
            rc.textures, float(np.asarray(g.voxel_size)))
        out = render_volume_frame(
            vscene, g.origin, cam.get_pos(), cam.get_view(), 45.0, 1.0,
            W, H)
        hs = np.asarray(out["alpha"]) >= 0.1
        hr = np.asarray(ref["alpha"]) >= 0.1
        _emit(
            config="volume_raymarch_oracle_512",
            scene=scene,
            resolution=f"{W}x{H}",
            frame_s=round(dt, 1),
            sweep_hit_agreement=round(float((hs == hr).mean()), 4),
            note="divergence is the reference's own far-field skip scale "
                 "(raycastFS.glsl:506) which the sweep does not reproduce; "
                 "skips-off agreement 98.6% at 128^2",
        )
    except Exception as e:
        _emit(config="volume_raymarch_oracle_512", error=repr(e))


def main():
    from ray_tracing_octrees_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    picks = [int(a) for a in sys.argv[1:]] or [1, 2, 3, 4, 5, 6]
    fns = {1: config1, 2: config2, 3: config3, 4: config4, 5: config5,
           6: config6}
    for p in picks:
        try:
            fns[p]()
        except Exception as e:  # keep the ladder running
            _emit(config=f"config{p}", error=f"{type(e).__name__}: {e}"[:200])


if __name__ == "__main__":
    main()
