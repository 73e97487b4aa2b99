"""Volume precompute passes: Sobel gradients, edge factors, AO, indirect
light, and the low-res skip-distance texture.

Array ports of the reference's precompute compute shader
(VolumeRaycastRenderer.cpp:633-769), the neighborhood-density AO bake
(createAmbientOcclusionTexture, :1824-1880), the indirect-bounce kernel
(indirectLightingComputeSrc, :1695-1791) and the heightmap-based
skip-distance texture (buildSkipDistanceTexture, :1201-1331).

All passes are dense jittable stencils over [Z, Y, X] float volumes —
XLA fuses the shifted reads; no scatter/atomics needed.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_octrees_tpu.ops.sampling import sample_trilinear


def _shift_sample(vol: jax.Array, dx: int, dy: int, dz: int) -> jax.Array:
    """vol sampled at (x+dx, y+dy, z+dz) with out-of-range -> 0.

    Matches the shader's sampleVolume returning 0 outside the box.
    """
    dzs, dys, dxs = vol.shape
    p = max(abs(dx), abs(dy), abs(dz), 1)
    pad = jnp.pad(vol, ((p, p), (p, p), (p, p)))
    return pad[p + dz : p + dz + dzs, p + dy : p + dy + dys, p + dx : p + dx + dxs]


@jax.jit
def sobel_gradient(volume: jax.Array, radiation: jax.Array) -> jax.Array:
    """3D Sobel gradient, radiation-aware, negated to point solid -> empty.

    computeSobelGradient (VolumeRaycastRenderer.cpp:664-698): 27 taps with
    weights w=(1,2,1) per axis; taps whose radiation exceeds 0.5 are
    attenuated by max(0, 1-rad). Returns f32[Z, Y, X, 3].
    """
    s = np.array([-1.0, 0.0, 1.0], np.float32)
    w = np.array([1.0, 2.0, 1.0], np.float32)
    dz_, dy_, dx_ = volume.shape
    vol_p = jnp.pad(volume, 1)
    rad_p = jnp.pad(radiation, 1)

    def shift(a, dx, dy, dz):
        return jax.lax.dynamic_slice(
            a, (1 + dz, 1 + dy, 1 + dx), (dz_, dy_, dx_)
        )

    gx = jnp.zeros(volume.shape, jnp.float32)
    gy = jnp.zeros(volume.shape, jnp.float32)
    gz = jnp.zeros(volume.shape, jnp.float32)
    for iz in range(3):
        for iy in range(3):
            for ix in range(3):
                weight = float(w[ix] * w[iy] * w[iz])
                dx, dy, dz = int(s[ix]), int(s[iy]), int(s[iz])
                rad = shift(rad_p, dx, dy, dz)
                wgt = jnp.where(rad > 0.5, weight * jnp.maximum(0.0, 1.0 - rad), weight)
                val = shift(vol_p, dx, dy, dz) * wgt
                if s[ix] != 0:
                    gx = gx + val * float(s[ix])
                if s[iy] != 0:
                    gy = gy + val * float(s[iy])
                if s[iz] != 0:
                    gz = gz + val * float(s[iz])
    return -jnp.stack([gx, gy, gz], axis=-1)


@jax.jit
def precompute_volume(volume: jax.Array, radiation: jax.Array):
    """The full precompute pass: (gradient magnitude, normal, edge factor).

    Ports the shader main + detectEdges (VolumeRaycastRenderer.cpp:703-769):
      edge = iso-proximity*0.7 + norm-grad-mag*0.2 + tangent-curvature*0.1,
    with carve-boundary enhancement from the radiation volume.

    The shader samples at world positions offset by one voxel; on the texel
    lattice those offsets are exactly +-1 texel, so shifted-array reads
    reproduce its samples.
    """
    grad = sobel_gradient(volume, radiation)
    grad_mag = jnp.linalg.norm(grad, axis=-1)
    normal = jnp.where(
        (grad_mag > 0.001)[..., None],
        grad / jnp.maximum(grad_mag[..., None], 1e-30),
        jnp.array([0.0, 1.0, 0.0], jnp.float32),
    )

    center = volume
    iso = 0.5
    edge_thresh = 0.1
    dist_to_iso = jnp.abs(center - iso)
    edge_factor = 1.0 - jnp.clip(dist_to_iso / edge_thresh, 0.0, 1.0) ** 1  # smoothstep approx below
    # true smoothstep(0, edgeThreshold, distToIso)
    tt = jnp.clip(dist_to_iso / edge_thresh, 0.0, 1.0)
    edge_factor = 1.0 - (tt * tt * (3.0 - 2.0 * tt))

    norm_grad_mag = jnp.minimum(1.0, grad_mag / 10.0)

    # tangent-curvature term: density variation along two tangents of the
    # normal; tangent offsets are +-1 voxel in world space, i.e. fractional
    # texel offsets along arbitrary directions -> trilinear samples.
    up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    alt = jnp.array([1.0, 0.0, 0.0], jnp.float32)
    t1 = jnp.cross(normal, jnp.broadcast_to(up, normal.shape))
    t1_len = jnp.linalg.norm(t1, axis=-1, keepdims=True)
    t1_alt = jnp.cross(normal, jnp.broadcast_to(alt, normal.shape))
    t1 = jnp.where(t1_len < 0.1, t1_alt, t1)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-30)
    t2 = jnp.cross(normal, t1)

    dz, dy, dx = volume.shape
    dims = jnp.array([dx, dy, dz], jnp.float32)
    zz, yy, xx = jnp.meshgrid(
        jnp.arange(dz, dtype=jnp.float32),
        jnp.arange(dy, dtype=jnp.float32),
        jnp.arange(dx, dtype=jnp.float32),
        indexing="ij",
    )
    uvw = jnp.stack([(xx + 0.5) / dx, (yy + 0.5) / dy, (zz + 0.5) / dz], -1)
    texel = 1.0 / dims

    def vol_at(offset_vec):
        return sample_trilinear(volume, jnp.clip(uvw + offset_vec * texel, 0.0, 1.0))

    s1 = vol_at(t1)
    s2 = vol_at(-t1)
    s3 = vol_at(t2)
    s4 = vol_at(-t2)
    curvature = (
        jnp.abs(s1 - center) + jnp.abs(s2 - center)
        + jnp.abs(s3 - center) + jnp.abs(s4 - center)
    ) / 4.0

    # carve-boundary enhancement
    r0 = radiation
    r1 = sample_trilinear(radiation, jnp.clip(uvw + normal * texel, 0.0, 1.0))
    rmax = jnp.maximum(r0, r1)
    tt2 = jnp.clip(rmax / 0.3, 0.0, 1.0)
    carve_edge = tt2 * tt2 * (3.0 - 2.0 * tt2)
    edge_factor = jnp.where(
        (r1 > 0.1) | (r0 > 0.1), jnp.maximum(edge_factor, carve_edge), edge_factor
    )

    edge = edge_factor * 0.7 + norm_grad_mag * 0.2 + curvature * 0.1
    return grad_mag, normal, edge


@jax.jit
def ambient_occlusion(occ: jax.Array) -> jax.Array:
    """26-neighbor density AO (createAmbientOcclusionTexture, :1833-1867).

    ao = (filled neighbors / 26) * 0.7 for interior voxels; the one-voxel
    border stays 0 exactly as the reference's loop bounds leave it.
    """
    f = (jnp.asarray(occ) > 0).astype(jnp.float32)
    acc = jnp.zeros_like(f)
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0 and dz == 0:
                    continue
                acc = acc + _shift_sample(f, dx, dy, dz)
    ao = acc / 26.0 * 0.7
    border = jnp.zeros_like(ao)
    ao = border.at[1:-1, 1:-1, 1:-1].set(ao[1:-1, 1:-1, 1:-1])
    return ao


@functools.partial(jax.jit, static_argnames=("radius",))
def indirect_lighting(
    volume: jax.Array,
    normals: jax.Array,
    radiation: jax.Array,
    light_dir,
    light_color,
    strength: float = 1.0,
    radius: int = 6,
) -> jax.Array:
    """Bounce-light gather (indirectLightingComputeSrc, :1713-1790).

    For empty/carved voxels, sums light from directly-lit solid neighbors
    within ``radius``: falloff 1/(1+d^2) times the bounce cosine
    max(0, dot(n_neighbor, -dir_neighbor_to_voxel)). Returns [Z, Y, X, 3].
    """
    l = jnp.asarray(light_dir, jnp.float32)
    l = l / jnp.linalg.norm(l)
    lc = jnp.asarray(light_color, jnp.float32)

    ndotl = (normals * l).sum(-1)
    lit = (ndotl > 0.0) & (volume > 0.5) & (radiation < 0.1)
    receiver = (volume < 0.5) | (radiation > 0.1)

    out = jnp.zeros(volume.shape + (3,), jnp.float32)
    for dz in range(-radius, radius + 1):
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                dist = float(np.sqrt(dx * dx + dy * dy + dz * dz))
                if dist > radius or (dx == 0 and dy == 0 and dz == 0):
                    continue
                # neighbor at p + (dx,dy,dz); bounce direction neighbor->p
                bounce = -jnp.array([dx, dy, dz], jnp.float32) / dist
                n_lit = _shift_sample(lit.astype(jnp.float32), dx, dy, dz)
                n_nrm = jnp.stack(
                    [
                        _shift_sample(normals[..., 0], dx, dy, dz),
                        _shift_sample(normals[..., 1], dx, dy, dz),
                        _shift_sample(normals[..., 2], dx, dy, dz),
                    ],
                    -1,
                )
                bounce_factor = jnp.maximum(0.0, -(n_nrm * bounce).sum(-1))
                falloff = 1.0 / (1.0 + dist * dist)
                out = out + (n_lit * bounce_factor * falloff)[..., None] * lc
    out = out * strength
    return jnp.where(receiver[..., None], out, 0.0)


def build_skip_distance(occ: jax.Array, voxel_size, box_min, box_max, factor: int = 8):
    """Low-res skip-distance volume (buildSkipDistanceTexture, :1201-1331).

    Downsampled dims max(dim/8, 16); per column (x, z) the first solid
    sample height bounds a vertical empty run; voxels above solid space get
    a fixed one-block skip. Values are normalized distances.
    """
    occ = jnp.asarray(occ) > 0
    dz, dy, dx = occ.shape
    sx = max(dx // factor, 16)
    sy = max(dy // factor, 16)
    sz = max(dz // factor, 16)

    # sample the original grid at mapped coordinates (integer division map)
    ox = (jnp.arange(sx) * dx) // sx
    oy = (jnp.arange(sy) * dy) // sy
    oz = (jnp.arange(sz) * dz) // sz
    sub = occ[oz[:, None, None], oy[None, :, None], ox[None, None, :]]  # [sz, sy, sx]

    # heightmap: first y with a solid sample, scanning upward (0 if none)
    ys = jnp.arange(sy)
    first_solid = jnp.where(
        sub.any(axis=1),
        jnp.argmax(sub, axis=1),  # first True along y
        0,
    )  # [sz, sx]

    vsize = jnp.asarray(voxel_size, jnp.float32)
    box_min = jnp.asarray(box_min, jnp.float32)
    box_max = jnp.asarray(box_max, jnp.float32)
    y_extent = box_max[1] - box_min[1]
    max_extent = jnp.max(box_max - box_min)

    below = ys[None, :, None] < first_solid[:, None, :]  # [sz, sy, sx]
    empty_height = (
        (first_solid[:, None, :] - ys[None, :, None]).astype(jnp.float32)
        * (dy / sy)
        * vsize
    )
    skip_below = empty_height * 0.8 / y_extent

    is_empty = ~sub
    block = vsize * (dx / sx)
    skip_empty = block / max_extent

    skip = jnp.where(below, skip_below, jnp.where(is_empty, skip_empty, 0.0))
    return skip.astype(jnp.float32)
