"""Interactive carving: radiation splatting and mouse picking.

Ports of the radiation splat compute kernel (pointRadComputeSrc,
VolumeRaycastRenderer.cpp:308-462: sharpened cubic B-spline weights with a
16-entry jitter table, accumulated additively into the radiation volume),
its dispatch policy (dispatchRadiationCompute, :495-631: radius clamp 6),
and the CPU picking ray march (intersectBuildingVoxel, main.cpp:209-334).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_octrees_tpu.core.grid import VoxelGrid

_JITTER_OFFSETS = np.array(
    [
        [-0.4, -0.4, -0.4], [0.4, -0.4, -0.4], [-0.4, 0.4, -0.4], [0.4, 0.4, -0.4],
        [-0.4, -0.4, 0.4], [0.4, -0.4, 0.4], [-0.4, 0.4, 0.4], [0.4, 0.4, 0.4],
        [-0.2, -0.2, -0.2], [0.2, -0.2, -0.2], [-0.2, 0.2, -0.2], [0.2, 0.2, -0.2],
        [-0.2, -0.2, 0.2], [0.2, -0.2, 0.2], [-0.2, 0.2, 0.2], [0.2, 0.2, 0.2],
    ],
    np.float32,
)


def bspline_1d(x):
    """Sharper cubic B-spline (pointRadComputeSrc:343-351)."""
    x = jnp.abs(x)
    inner = (2.0 / 3.0) + 0.7 * x * x * (x - 2.0)
    t = 1.6 - x
    outer = (t * t * t) / 5.0
    return jnp.where(x < 0.7, inner, jnp.where(x < 1.6, outer, 0.0))


@jax.jit
def splat_radiation(
    radiation: jax.Array,   # f32[Z, Y, X]
    world_pos: jax.Array,   # f32[3]
    radius: jax.Array,      # f32[]
    box_min: jax.Array,
    box_max: jax.Array,
):
    """Additively splat one radiation point into the volume.

    The shader's jittered dual-evaluation: w = 0.5 * (B(nd) + B(nd + j*0.05))
    where j indexes the 16-entry table by (x + 4y + 16z) mod 16
    (pointRadComputeSrc:398-428). Radius is clamped to 6 by the dispatcher
    (dispatchRadiationCompute, VolumeRaycastRenderer.cpp:497-505).
    """
    dz, dy, dx = radiation.shape
    radius = jnp.minimum(jnp.asarray(radius, jnp.float32), 6.0)
    size = box_max - box_min
    dims = jnp.array([dx, dy, dz], jnp.float32)
    center = (world_pos - box_min) / size * dims  # voxel-space float coords

    xs = jnp.arange(dx, dtype=jnp.float32)
    ys = jnp.arange(dy, dtype=jnp.float32)
    zs = jnp.arange(dz, dtype=jnp.float32)
    nd_x = (xs - center[0]) / radius
    nd_y = (ys - center[1]) / radius
    nd_z = (zs - center[2]) / radius

    w = (
        bspline_1d(nd_z)[:, None, None]
        * bspline_1d(nd_y)[None, :, None]
        * bspline_1d(nd_x)[None, None, :]
    )

    ji = (
        jnp.arange(dx)[None, None, :]
        + jnp.arange(dy)[None, :, None] * 4
        + jnp.arange(dz)[:, None, None] * 16
    ) % 16
    jit = jnp.asarray(_JITTER_OFFSETS)[ji] * 0.05  # [Z, Y, X, 3]
    w2 = (
        bspline_1d(nd_x[None, None, :] + jit[..., 0])
        * bspline_1d(nd_y[None, :, None] + jit[..., 1])
        * bspline_1d(nd_z[:, None, None] + jit[..., 2])
    )
    final_w = 0.5 * (w + w2)

    dist = jnp.sqrt(
        nd_x[None, None, :] ** 2 + nd_y[None, :, None] ** 2 + nd_z[:, None, None] ** 2
    )
    final_w = jnp.where((dist <= 1.6) & (final_w > 1e-4), final_w, 0.0)
    return radiation + final_w


@functools.partial(jax.jit, static_argnames=("max_steps",))
def pick_voxel(
    grid: VoxelGrid,
    ray_origin,
    ray_dir,
    box_min,
    box_max,
    max_steps: int = 8000,
):
    """First filled voxel along a ray (intersectBuildingVoxel, main.cpp:209-334).

    Marches at voxelSize/2 steps with quarter steps near surfaces (the 3^3
    neighbor probe); returns (hit bool, pos f32[3] — offset one tenth of a
    step back toward the camera, as the reference places the splat).
    """
    f32 = jnp.float32
    ro = jnp.asarray(ray_origin, f32)
    rd = jnp.asarray(ray_dir, f32)
    box_min = jnp.asarray(box_min, f32)
    box_max = jnp.asarray(box_max, f32)

    inv = 1.0 / jnp.where(jnp.abs(rd) < 1e-12, 1e-12, rd)
    t1 = (box_min - ro) * inv
    t2 = (box_max - ro) * inv
    t_near = jnp.maximum(jnp.minimum(t1, t2).max(), 0.0)
    t_far = jnp.maximum(t1, t2).min()

    step = grid.voxel_size * 0.5
    dims = jnp.array(grid.dims_xyz, f32)

    def body(state):
        i, t, hit, pos = state
        p = ro + rd * t
        uvw = (p - box_min) / (box_max - box_min)
        inside = ((uvw >= 0.0) & (uvw < 1.0)).all()
        v = jnp.clip((uvw * dims).astype(jnp.int32), 0, jnp.array(grid.dims_xyz) - 1)
        filled = inside & (grid.occ[v[2], v[1], v[0]] > 0)

        # 3^3 neighbor probe for adaptive stepping (main.cpp:310-331)
        near_surface = jnp.zeros((), bool)
        for ddz in (-1, 0, 1):
            for ddy in (-1, 0, 1):
                for ddx in (-1, 0, 1):
                    near_surface = near_surface | (
                        grid.sample_safe(v[0] + ddx, v[1] + ddy, v[2] + ddz) > 0
                    )
        adv = jnp.where(inside, jnp.where(near_surface, step * 0.25, step), step)
        new_hit = hit | filled
        hit_pos = p - rd * (step * 0.1)
        pos = jnp.where(filled & ~hit, hit_pos, pos)
        t = jnp.where(new_hit, t, t + adv)
        return i + 1, t, new_hit, pos

    def cond(state):
        i, t, hit, _ = state
        return (i < max_steps) & (t <= t_far) & (~hit)

    init = (jnp.int32(0), t_near, (t_near > t_far), jnp.zeros(3, f32))
    # note: if the box was missed entirely, hit starts "True" to stop the
    # loop; mask it out below.
    missed = t_near > t_far
    _, _, hit, pos = jax.lax.while_loop(cond, body, init)
    return hit & ~missed, pos
