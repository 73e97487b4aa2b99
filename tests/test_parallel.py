"""Multi-chip sharding on the 8-device virtual CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ray_tracing_octrees_tpu.core.grid import make_sphere_grid
from ray_tracing_octrees_tpu.core.octree import build_pyramid
from ray_tracing_octrees_tpu.parallel.mesh import make_mesh
from ray_tracing_octrees_tpu.parallel.sharding import (
    trace_sharded,
    trace_shardmap,
    trace_segmented,
    render_image_sharded,
)
from ray_tracing_octrees_tpu.trace.octree_trace import trace_octree
from ray_tracing_octrees_tpu.render.camera import Camera, generate_rays


@pytest.fixture(scope="module")
def scene():
    g = make_sphere_grid(16)
    cam = Camera(theta=0.3, phi=0.7, radius=2.0)
    o, d = generate_rays(
        16, 16,
        jnp.asarray(cam.get_pos(), jnp.float32),
        jnp.asarray(cam.get_view(), jnp.float32), 45.0, 1.0,
    )
    pyr = build_pyramid(g.occ)
    ref = trace_octree(pyr, o, d, g.origin, g.voxel_size, max_steps=128)
    return g, o, d, {k: np.asarray(v) for k, v in ref.items()}


def test_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("fn", [trace_sharded, trace_shardmap])
def test_sharded_traces_match_single(scene, fn):
    g, o, d, ref = scene
    mesh = make_mesh(8)  # 4x2
    res = fn(mesh, g.occ, o, d, g.origin, g.voxel_size, max_steps=128)
    n = o.shape[0]
    np.testing.assert_array_equal(np.asarray(res["hit"])[:n], ref["hit"])
    np.testing.assert_allclose(np.asarray(res["t"])[:n], ref["t"], atol=1e-5)


def test_segmented_trace_matches_single(scene):
    g, o, d, ref = scene
    mesh = make_mesh(8, dp=2, tp=4)
    res = trace_segmented(mesh, g.occ, o, d, g.origin, g.voxel_size, max_steps=128)
    n = o.shape[0]
    np.testing.assert_array_equal(np.asarray(res["hit"])[:n], ref["hit"])
    # per-segment hits land on slab boundaries occasionally; allow a voxel
    np.testing.assert_allclose(np.asarray(res["t"])[:n], ref["t"], atol=2.0 / 16)


def test_render_image_sharded_matches(scene):
    g, o, d, ref = scene
    mesh = make_mesh(8)
    img = render_image_sharded(
        mesh, g.occ, o, d, g.origin, g.voxel_size, max_steps=128, shadows=False
    )
    assert img.shape == (o.shape[0], 4)
    lit = np.asarray(img)[:, :3].max(-1) > 0
    np.testing.assert_array_equal(lit, ref["hit"])
