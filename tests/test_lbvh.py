"""LBVH build invariants and ray-triangle tracing vs brute force."""

import numpy as np
import pytest
import jax.numpy as jnp

from ray_tracing_octrees_tpu.trace.lbvh import build_lbvh, trace_lbvh, moller_trumbore
from ray_tracing_octrees_tpu.core.grid import make_sphere_grid
from ray_tracing_octrees_tpu.ops.marching_cubes import marching_cubes_grid, count_mc_triangles


def random_tris(rng, k, scale=1.0):
    base = (rng.random((k, 1, 3)) - 0.5) * 2 * scale
    offs = (rng.random((k, 3, 3)) - 0.5) * 0.3 * scale
    return (base + offs).astype(np.float32)


def brute_force(origins, dirs, tris):
    hit = np.zeros(len(origins), bool)
    t_best = np.full(len(origins), np.inf)
    idx = np.full(len(origins), -1)
    for k in range(len(tris)):
        v0, v1, v2 = tris[k].astype(np.float64)
        e1, e2 = v1 - v0, v2 - v0
        pvec = np.cross(dirs, e2)
        det = (e1 * pvec).sum(-1)
        ok = np.abs(det) > 1e-7
        inv = np.where(ok, 1.0 / np.where(det == 0, 1, det), 0.0)
        tvec = origins - v0
        u = (tvec * pvec).sum(-1) * inv
        qvec = np.cross(tvec, e1)
        v = (dirs * qvec).sum(-1) * inv
        t = (e2 * qvec).sum(-1) * inv
        h = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-7)
        better = h & (t < t_best)
        t_best = np.where(better, t, t_best)
        hit |= better
        idx = np.where(better, k, idx)
    return hit, t_best, idx


def test_bvh_structure_invariants(rng):
    tris = jnp.asarray(random_tris(rng, 37))
    bvh = build_lbvh(tris)
    n = 37
    left = np.asarray(bvh.left)[: n - 1]
    right = np.asarray(bvh.right)[: n - 1]
    parent = np.asarray(bvh.parent)
    # every node except root has exactly one parent
    children = np.concatenate([left, right])
    assert len(set(children.tolist())) == 2 * n - 2
    assert 0 not in children  # root is nobody's child
    # parent consistency
    for p in range(n - 1):
        assert parent[left[p]] == p and parent[right[p]] == p
    # AABB containment
    amin = np.asarray(bvh.aabb_min)
    amax = np.asarray(bvh.aabb_max)
    for p in range(n - 1):
        for c in (left[p], right[p]):
            assert (amin[p] <= amin[c] + 1e-6).all()
            assert (amax[p] >= amax[c] - 1e-6).all()
    # root AABB equals the scene bounds
    tv = np.asarray(bvh.tri_verts).reshape(-1, 3)
    np.testing.assert_allclose(amin[0], tv.min(0), atol=1e-6)
    np.testing.assert_allclose(amax[0], tv.max(0), atol=1e-6)
    # escape links terminate
    esc = np.asarray(bvh.escape)
    assert esc[0] == -1 or esc[0] >= 0


@pytest.mark.parametrize("k", [2, 9, 64, 200])
def test_trace_matches_brute_force(rng, k):
    tris = random_tris(rng, k)
    bvh = build_lbvh(jnp.asarray(tris))
    nrays = 128
    origins = (rng.random((nrays, 3)).astype(np.float32) - 0.5) * 6
    targets = (rng.random((nrays, 3)).astype(np.float32) - 0.5) * 1.5
    dirs = targets - origins
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    res = trace_lbvh(bvh, jnp.asarray(origins), jnp.asarray(dirs))
    ref_hit, ref_t, ref_idx = brute_force(origins, dirs, tris)

    got_hit = np.asarray(res["hit"])
    np.testing.assert_array_equal(got_hit, ref_hit)
    got_t = np.asarray(res["t"])
    np.testing.assert_allclose(got_t[ref_hit], ref_t[ref_hit], rtol=1e-4, atol=1e-5)
    # nearest triangle ids match except exact t-ties
    tie_free = ref_hit & (np.asarray(res["tri"]) == ref_idx)
    assert tie_free.sum() >= ref_hit.sum() - 2


def test_trace_mc_sphere_mesh():
    """BASELINE configs[3]: MC mesh -> LBVH -> primary + shadow rays."""
    g = make_sphere_grid(16)
    total = int(count_mc_triangles(g))
    verts, _, count = marching_cubes_grid(g, max_triangles=total)
    tris = jnp.asarray(verts)[: int(count)]
    bvh = build_lbvh(tris)

    n = 32
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    origins = np.stack([2 * np.cos(ang), np.zeros(n), 2 * np.sin(ang)], -1).astype(np.float32)
    dirs = (-origins / np.linalg.norm(origins, axis=1, keepdims=True)).astype(np.float32)
    res = trace_lbvh(bvh, jnp.asarray(origins), jnp.asarray(dirs))
    assert np.asarray(res["hit"]).all()
    # MC surface sits within half a voxel of the 0.4-radius shell
    np.testing.assert_allclose(np.asarray(res["t"]), 1.6, atol=4.5 / 16)

    # shadow rays from hit points toward a light: all occluded by the sphere
    # when the light is behind it
    light = np.array([0.0, 0.0, -10.0], np.float32)
    p = np.asarray(res["point"])
    sd = light[None, :] - p
    sd = sd / np.linalg.norm(sd, axis=1, keepdims=True)
    so = p + np.asarray(res["normal"]) * 1e-3
    sres = trace_lbvh(bvh, jnp.asarray(so), jnp.asarray(sd))
    assert np.asarray(sres["hit"]).mean() > 0.4  # back-side rays occluded


def test_moller_trumbore_basics():
    v0 = jnp.array([0.0, 0, 0])
    v1 = jnp.array([1.0, 0, 0])
    v2 = jnp.array([0.0, 1, 0])
    hit, t, u, v = moller_trumbore(
        jnp.array([0.2, 0.2, 1.0]), jnp.array([0.0, 0, -1.0]), v0, v1, v2
    )
    assert bool(hit) and np.isclose(float(t), 1.0)
    hit2, *_ = moller_trumbore(
        jnp.array([2.0, 2.0, 1.0]), jnp.array([0.0, 0, -1.0]), v0, v1, v2
    )
    assert not bool(hit2)
