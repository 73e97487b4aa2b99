"""Batched quadric-error-function dual-vertex solves.

Vectorized port of ``QEFSolver`` and ``generateDualVertex``
(AdaptiveDualContouringRenderer.cpp:46-161, 1146-1234): regularized 3x3
normal-equation solve with relaxation and masspoint mixing, preceded by the
"architectural snapping" path that projects the cell center onto the
dominant axis plane when the average hermite normal is nearly axis-aligned.

Everything operates on fixed-capacity per-cell hermite point arrays
(positions, normals, valid mask) so a single ``vmap``/broadcast handles all
cells of a batch at once — the TPU replacement for the per-cell scalar
solver behind ``std::vector<HermitePoint>``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ray_tracing_octrees_tpu.config import QEFConfig

_DEFAULT = QEFConfig()


def _normalize(v, eps=1e-30):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def qef_accumulate(points, normals, mask):
    """AtA, Atb, masspoint, count from masked hermite sets.

    points/normals: f32[..., K, 3]; mask: bool[..., K].
    Normals are normalized per point (QEFSolver::addPoint,
    AdaptiveDualContouringRenderer.cpp:49-75); d = -dot(n, p).
    """
    m = mask[..., None].astype(jnp.float32)
    n = _normalize(normals) * m
    p = points * m
    ata = jnp.einsum("...ki,...kj->...ij", n, n)
    d = -(n * points).sum(-1)  # n already masked
    atb = (n * d[..., None]).sum(-2)
    count = mask.sum(-1)
    psum = p.sum(-2)
    masspoint = psum / jnp.maximum(count[..., None].astype(jnp.float32), 1.0)
    return ata, atb, masspoint, count


def _inverse_3x3(m):
    """Adjugate-based inverse and determinant (glm::inverse semantics)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    co00 = e * i - f * h
    co01 = -(d * i - f * g)
    co02 = d * h - e * g
    det = a * co00 + b * co01 + c * co02
    adj = jnp.stack(
        [
            jnp.stack([co00, -(b * i - c * h), b * f - c * e], -1),
            jnp.stack([co01, a * i - c * g, -(a * f - c * d)], -1),
            jnp.stack([co02, -(a * h - b * g), a * e - b * d], -1),
        ],
        -2,
    )
    inv = adj / det[..., None, None]
    return inv, det


def qef_solve(ata, atb, masspoint, count, cell_center, cell_size, cfg: QEFConfig = _DEFAULT):
    """QEFSolver::solve (AdaptiveDualContouringRenderer.cpp:84-148).

    Vectorized over leading dims. Returns the dual position.
    """
    reg = jnp.eye(3, dtype=jnp.float32) * cfg.regularization
    a = ata + reg
    inv, det = _inverse_3x3(a)
    bad_inv = (
        (jnp.abs(det) < 1e-10)
        | jnp.isnan(inv).any((-2, -1))
        | jnp.isinf(inv).any((-2, -1))
        | (jnp.abs(inv) > 1e6).any((-2, -1))
    )
    solution = jnp.einsum("...ij,...j->...i", inv, atb)
    solution = masspoint + cfg.relaxation * (solution - masspoint)
    nan_sol = jnp.isnan(solution).any(-1)
    dist_sq = ((solution - masspoint) ** 2).sum(-1)
    ok = (
        (~bad_inv)
        & (~nan_sol)
        & (dist_sq < cell_size * cell_size)
        & (count >= cfg.min_points_for_solve)
    )
    mixed = solution * (1.0 - cfg.masspoint_mix) + masspoint * cfg.masspoint_mix
    fallback = jnp.where(
        (count > 0)[..., None], masspoint, cell_center
    )  # numPoints==0 -> cellCenter
    return jnp.where(ok[..., None], mixed, fallback)


def generate_dual_vertex(
    points, normals, mask, cell_center, cell_size, cfg: QEFConfig = _DEFAULT
):
    """generateDualVertex (AdaptiveDualContouringRenderer.cpp:1146-1234).

    points/normals f32[..., K, 3], mask bool[..., K]; cell_center f32[..., 3];
    cell_size f32[...]. Cells with no hermite data return their center.
    """
    ata, atb, masspoint, count = qef_accumulate(points, normals, mask)
    has_data = count > 0

    half = (cell_size * 0.5)[..., None]
    inset = (cell_size * cfg.bounds_inset_factor)[..., None]
    min_b = cell_center - half + inset
    max_b = cell_center + half - inset

    # --- architectural snapping path ------------------------------------------
    m = mask[..., None].astype(jnp.float32)
    avg_n = (normals * m).sum(-2)  # unnormalized sum, as the reference
    avg_len = jnp.linalg.norm(avg_n, axis=-1)
    avg_unit = avg_n / jnp.maximum(avg_len[..., None], 1e-30)
    abs_n = jnp.abs(avg_unit)
    max_comp = abs_n.max(-1)
    # axis priority x, y, z on exact ties (the if/else chain at :1197-1206)
    is_x = abs_n[..., 0] == max_comp
    is_y = (~is_x) & (abs_n[..., 1] == max_comp)
    axis_idx = jnp.where(is_x, 0, jnp.where(is_y, 1, 2))
    sign = jnp.sign(
        jnp.take_along_axis(avg_unit, axis_idx[..., None], axis=-1)[..., 0]
    )
    sign = jnp.where(sign == 0, 1.0, sign)
    snapped = jax.nn.one_hot(axis_idx, 3, dtype=jnp.float32) * sign[..., None]

    # plane points: hermite points whose unit normal aligns with the axis
    pn_unit = _normalize(normals)
    align = (pn_unit * snapped[..., None, :]).sum(-1)
    plane_mask = mask & (align > cfg.plane_alignment_threshold)
    plane_count = plane_mask.sum(-1)
    plane_point = (points * plane_mask[..., None]).sum(-2) / jnp.maximum(
        plane_count[..., None].astype(jnp.float32), 1.0
    )
    d = -(snapped * plane_point).sum(-1)
    t = -((snapped * cell_center).sum(-1) + d)
    projected = cell_center + t[..., None] * snapped
    projected = jnp.clip(projected, min_b, max_b)

    snap_ok = (
        has_data
        & (avg_len > 1e-4)
        & (max_comp > cfg.snap_normal_threshold)
        & (plane_count > 0)
    )

    # --- constrained QEF path ---------------------------------------------------
    qef_center = 0.5 * (min_b + max_b)
    qef_size = (max_b - min_b)[..., 0]
    sol = qef_solve(ata, atb, masspoint, count, qef_center, qef_size, cfg)
    sol = jnp.clip(sol, min_b, max_b)
    qef_result = sol * (1.0 - cfg.constrained_masspoint_mix) + masspoint * (
        cfg.constrained_masspoint_mix
    )

    out = jnp.where(snap_ok[..., None], projected, qef_result)
    return jnp.where(has_data[..., None], out, cell_center)
