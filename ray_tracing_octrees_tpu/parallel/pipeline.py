"""Pipeline-parallel frame rendering with donated inter-stage buffers.

The reference pipelines frames by re-blitting cached FBOs while heavy
modes re-render every Nth frame (main.cpp:1204, 1348). The TPU-native
analog splits the fast frame into two jitted STAGES — (1) the MXU sweep
producing the packed depth+shadow table, (2) the per-pixel warp + shade —
and software-pipelines a pose sequence: stage 1 of pose i+1 is enqueued
while stage 2 of pose i is still in flight (async dispatch overlaps them
on device), and every inter-stage table buffer is DONATED to stage 2, so
XLA reuses its memory instead of holding one table per in-flight frame.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_octrees_tpu.trace import slab_sweep as ss


@functools.partial(
    jax.jit,
    static_argnames=("n_chunks", "s_valid", "a_size", "b_size", "inter_h",
                     "inter_w", "flip", "axis_world", "crop_lo", "s_keep",
                     "has_shadow"),
)
def _stage_sweep(vol_bf, shadow_native, scal, n_chunks, s_valid, a_size,
                 b_size, inter_h, inter_w, flip, axis_world, crop_lo, s_keep,
                 has_shadow):
    shv = ss._relayout_sweep(shadow_native, axis_world, flip,
                             vol_bf.shape[0], a_size, b_size,
                             crop_lo, s_keep) \
        if has_shadow else None
    return ss._sweep_all(vol_bf, scal, n_chunks, s_valid, a_size, b_size,
                         inter_h, inter_w, flip, shadow_sw=shv)


@functools.partial(
    jax.jit,
    static_argnames=("axis_world", "inter_h", "inter_w", "width", "height",
                     "has_shadow", "warp_cfg"),
    donate_argnums=(0,),   # the packed table is consumed exactly once
)
def _stage_finish(packed, scal, axis_world, inter_h, inter_w, width, height,
                  has_shadow, warp_cfg):
    lin, behind, dirs, d_s_n = ss._warp_setup(
        scal, axis_world, inter_h, inter_w, width, height)
    w_val = ss._warp_values(packed, lin, inter_h, inter_w, width, height,
                            warp_cfg)
    return ss._finish_shade(w_val, behind, dirs, d_s_n, scal, width, height,
                            has_shadow)


def render_fast_frames_pipelined(
    volume,
    shadow_vol,
    grid_origin,
    voxel_size,
    poses: Sequence[Tuple[np.ndarray, np.ndarray]],  # (cam_pos, view) pairs
    fov_deg: float,
    aspect: float,
    width: int,
    height: int,
    light_dir=(-1.0, -1.0, -1.0),
    base_color=(1.0, 0.8, 0.6),
    ambient=(0.1, 0.1, 0.1),
    inter_h: int = 1024,
    inter_w: int = 1024,
) -> List[jax.Array]:
    """Render a pose sequence as a 2-stage pipeline; returns RGBA frames.

    Output equals per-pose ``render_fast_frame(..., fused=False)``; the
    difference is scheduling (stage-1 of the next pose enqueues before
    stage-2 of the current) and memory (each packed table is donated into
    its finish stage). Note: the shadow relayout inside stage 1 assumes a
    fixed sweep axis across the sequence when shadows are on; poses whose
    axis changes re-trigger a compile, exactly like render_fast_frame.
    """
    has_shadow = shadow_vol is not None
    sh_arg = shadow_vol if has_shadow else jnp.zeros((1, 1, 1), jnp.float32)
    prepared = []
    for cam_pos, view in poses:
        (axis_world, flip, (S, A, B), eyes, window, crop_lo) = \
            ss._sweep_geometry(volume, grid_origin, voxel_size, cam_pos, view)
        vol_bf = ss._layout_volume(volume, axis_world, flip, S, A, B, crop_lo)
        origin_c = np.asarray(grid_origin, np.float32) + np.asarray(
            ss._AXIS_SELECTORS[axis_world][0], np.float32
        ) * (crop_lo * float(voxel_size))
        scal_np = ss._frame_scalars_np(
            *eyes[:3], eyes[3], *window, fov_deg, aspect, float(voxel_size),
            S, origin_c, np.asarray(cam_pos, np.float32), view, light_dir,
            base_color, ambient,
        )
        warp_cfg = ss._plan_warp_cfg(scal_np, axis_world, inter_h, inter_w,
                                     width, height)
        prepared.append((axis_world, flip, S, A, B, crop_lo,
                         vol_bf, jnp.asarray(scal_np), warp_cfg))

    frames: List[jax.Array] = []
    pending = None   # (packed, meta) of pose i while pose i+1's sweep runs
    for i, (axis_world, flip, S, A, B, crop_lo, vol_bf, scal,
            warp_cfg) in enumerate(prepared):
        packed = _stage_sweep(
            vol_bf, sh_arg, scal, vol_bf.shape[0] // 32, S, A, B,
            inter_h, inter_w, bool(flip), axis_world, crop_lo, S, has_shadow,
        )
        if pending is not None:
            frames.append(_stage_finish(*pending))
        pending = (packed, scal, axis_world, inter_h, inter_w, width,
                   height, has_shadow, warp_cfg)
    if pending is not None:
        frames.append(_stage_finish(*pending))
    return frames
