"""Linear octree over the voxel grid — the TPU-native scene hierarchy.

Replaces the reference's pointer octree (``OctreeNode`` /
``createOctreeFromVoxelGrid`` / ``buildOctreeRec``, OctreeVoxel.h:45-62 and
OctreeVoxel.cpp:704-778) and its global hash map ``g_octreeMap``
(Renderer.cpp:11) with two array structures:

1. ``OccupancyPyramid`` — a min/max mip stack over occupancy (jit-built with
   reshape-reductions). For every level k it stores, per 2^k-sized cell,
   whether ANY voxel is filled and whether ALL are filled. Together with the
   convention that out-of-grid space is EMPTY (``getVoxelSafe``,
   OctreeVoxel.cpp:694-702) this losslessly encodes the reference octree:
   a node is a leaf iff its cell is *uniform* (all-empty or all-filled) or
   has size 1, exactly the ``allSame`` rule of buildOctreeRec
   (OctreeVoxel.cpp:724-745). The pyramid is the traversal structure for the
   stackless ray tracer and the skip-distance queries.

2. ``LinearOctree`` — BFS-flattened node arrays mirroring the GPU layout the
   reference uploads in ``RayTracerBVH::setOctree`` (RayTracerBVH.cpp:430-505;
   ``GPUNodes``, RayTracerBVH.h:21-26): per node x, y, z, size, is_leaf,
   is_solid, is_uniform and eight child indices (-1 = none), root at index 0,
   children ordered bit0=x, bit1=y, bit2=z (OctreeVoxel.cpp:751-755).
   Node lookup by corner key replaces ``g_octreeMap`` with a binary search
   over sorted keys (``find_node``): the reference's key is
   ``(x<<20)|(y<<10)|z`` (OctreeVoxel.cpp:552-554) and, because parents and
   their 0th child share a corner, the *deepest* node at a corner wins —
   matching unordered_map insertion order during the build recursion.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pack_key(x, y, z):
    """The reference node-map key (OctreeVoxel.cpp:552-554): (x<<20)|(y<<10)|z.

    10 bits per axis suffices: the ingest clamp keeps grids <= 1000 per axis
    (BuildingLoader.cpp:200-209), so padded coords <= 1024 and the packed key
    fits in int32 (1023<<20 < 2^31).
    """
    return (
        (jnp.asarray(x, jnp.int32) << 20)
        | (jnp.asarray(y, jnp.int32) << 10)
        | jnp.asarray(z, jnp.int32)
    )


def padded_cube_size(dim_x: int, dim_y: int, dim_z: int) -> int:
    """Next power of two >= max dim (OctreeVoxel.cpp:768-770)."""
    s = 1
    while s < max(dim_x, dim_y, dim_z):
        s <<= 1
    return s


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OccupancyPyramid:
    """Per-level any/all occupancy reductions.

    ``any_levels[k]`` / ``all_levels[k]`` have shape ``ceil(dims / 2^k)`` in
    (Z, Y, X) order, for k = 0 .. L where 2^L = root size. Space outside an
    array is implicitly uniform-EMPTY (any=False, all=False), mirroring the
    reference's EMPTY padding of the non-power-of-two region. Level 0 is the
    raw occupancy itself (any == all == occ).

    A cell is *uniform* iff ``all`` (all filled) or ``not any`` (all empty);
    uniform cells are exactly the reference's leaf nodes (plus size-1 cells,
    which are trivially uniform).
    """

    code_levels: List[jax.Array]  # uint8, finest (k=0) first: 0/1/2

    @property
    def any_levels(self) -> List[jax.Array]:
        return [c > 0 for c in self.code_levels]

    @property
    def all_levels(self) -> List[jax.Array]:
        return [c == 2 for c in self.code_levels]

    @property
    def num_levels(self) -> int:
        return len(self.code_levels)

    @property
    def root_size(self) -> int:
        return 1 << (self.num_levels - 1)

    def level_dims_zyx(self, k: int) -> Tuple[int, int, int]:
        return self.code_levels[k].shape

    def cell_code(self, k: int, cx, cy, cz):
        """2-bit cell code at level k: 0 uniform-empty, 1 mixed, 2
        uniform-solid; out-of-array cells are uniform-empty. ONE gather per
        level — the tracer's hot lookup."""
        arr = self.code_levels[k]
        dz, dy, dx = arr.shape
        inb = (
            (cx >= 0) & (cy >= 0) & (cz >= 0)
            & (cx < dx) & (cy < dy) & (cz < dz)
        )
        xc = jnp.clip(cx, 0, dx - 1)
        yc = jnp.clip(cy, 0, dy - 1)
        zc = jnp.clip(cz, 0, dz - 1)
        return jnp.where(inb, arr[zc, yc, xc], jnp.uint8(0))

    def cell_state(self, k: int, cx, cy, cz):
        """(any, all) for level-k cell (cx, cy, cz); out-of-array -> (F, F)."""
        code = self.cell_code(k, cx, cy, cz)
        return code > 0, code == 2


def _reduce_level(prev_any: jax.Array, prev_all: jax.Array):
    """One 2x reduction step with virtual EMPTY padding to even dims."""
    dz, dy, dx = prev_any.shape
    pz, py, px = dz % 2, dy % 2, dx % 2
    if pz or py or px:
        pad = ((0, pz), (0, py), (0, px))
        prev_any = jnp.pad(prev_any, pad, constant_values=False)
        prev_all = jnp.pad(prev_all, pad, constant_values=False)
    nz, ny, nx = prev_any.shape[0] // 2, prev_any.shape[1] // 2, prev_any.shape[2] // 2
    r_any = prev_any.reshape(nz, 2, ny, 2, nx, 2).any(axis=(1, 3, 5))
    r_all = prev_all.reshape(nz, 2, ny, 2, nx, 2).all(axis=(1, 3, 5))
    return r_any, r_all


def build_pyramid(occ: jax.Array) -> OccupancyPyramid:
    """Build the any/all mip stack (jittable; static level count from shape)."""
    occ_b = jnp.asarray(occ) > 0
    dz, dy, dx = occ_b.shape
    s = padded_cube_size(dx, dy, dz)
    num_levels = int(np.log2(s)) + 1
    any_levels = [occ_b]
    all_levels = [occ_b]
    for _ in range(num_levels - 1):
        a, b = _reduce_level(any_levels[-1], all_levels[-1])
        any_levels.append(a)
        all_levels.append(b)
    codes = [
        a.astype(jnp.uint8) + b.astype(jnp.uint8)
        for a, b in zip(any_levels, all_levels)
    ]
    return OccupancyPyramid(code_levels=codes)


def _repeat2(a: jax.Array) -> jax.Array:
    """2x nearest upsample along all three axes."""
    return jnp.repeat(jnp.repeat(jnp.repeat(a, 2, 0), 2, 1), 2, 2)


@functools.partial(jax.jit, static_argnames=("skip_radius_cap",))
def build_leaf_volume(pyramid: OccupancyPyramid,
                      skip_radius_cap: int = 7) -> jax.Array:
    """Per-voxel packed leaf descriptor over the full 2^L root cube.

    u8[S, S, S] with, for the voxel v:

      bit  0    : solid (occupancy),
      bits 1..4 : leaf level — the MAX pyramid level whose cell containing
                  v is uniform (``cell_code`` semantics: cells outside the
                  raw grid read uniform-EMPTY), i.e. exactly the level
                  ``trace_octree.find_leaf`` resolves by its 10-gather
                  root-to-voxel descent,
      bits 5..7 : empty-skip radius CODE c with decoded radius
                  r = c for c <= 3 (exact small Chebyshev distances) and
                  r = 2^(c-1) for c in 4..7 (8/16/32/64, qualified from
                  coarse pyramid neighborhoods): the box [v - r, v + r + 1)
                  contains no solid voxel. 0 for solid voxels. Decode with
                  :func:`decode_skip_radius`.

    One gather of this volume replaces the per-level pyramid descent in the
    exact tracer (trace/octree_trace.py::trace_octree_fast) — the
    reference's traversal (intersectOctreeIterative,
    RayTracerBVH.cpp:239-327) runs one node fetch per visit; this is the
    array analog. ~S^3 bytes (134 MB at the Calgary root 512).
    """
    L = pyramid.num_levels
    top = L - 1
    S = pyramid.root_size

    # --- topmost-uniform level per voxel, coarse-to-fine -------------------
    # Accumulate (level, solid, found) at each level's own resolution and
    # 2x-upsample the state between levels: total work sum_k (S/2^k)^3
    # ~= (8/7) S^3 instead of 10 full-resolution passes.
    code = pyramid.code_levels[top]
    dz, dy, dx = code.shape
    sk = S >> top
    code_c = jnp.zeros((sk, sk, sk), code.dtype).at[:dz, :dy, :dx].set(code)
    uni = code_c != 1
    level = jnp.where(uni, jnp.uint8(top), jnp.uint8(0))
    solid = uni & (code_c == 2)
    found = uni
    for k in range(top - 1, -1, -1):
        level = _repeat2(level)
        solid = _repeat2(solid)
        found = _repeat2(found)
        code = pyramid.code_levels[k]
        dz, dy, dx = code.shape
        sk = S >> k
        code_c = jnp.zeros((sk, sk, sk), code.dtype).at[:dz, :dy, :dx].set(
            code)
        uni = code_c != 1
        take = uni & ~found
        level = jnp.where(take, jnp.uint8(k), level)
        solid = jnp.where(take, code_c == 2, solid)
        found = found | uni

    # --- empty-skip radius code ---------------------------------------------
    # Codes 1..3 (exact): after i iterated 3^3 dilations of the solid mask,
    # dil is "some solid voxel within Chebyshev distance i"; the exact code
    # of an empty voxel is the largest r <= 3 with no solid within r.
    cap = min(int(skip_radius_cap), 3)
    dil = solid
    radius = jnp.zeros(solid.shape, jnp.uint8)
    for _ in range(cap):
        dil = jax.lax.reduce_window(
            dil, False, jax.lax.bitwise_or,
            window_dimensions=(3, 3, 3), window_strides=(1, 1, 1),
            padding="SAME",
        )
        radius = radius + (~dil).astype(jnp.uint8)
    # Codes 4..7 (log scale, r = 2^(c-1) = 8/16/32/64): if the 3^3 block of
    # level-k cells (k = c-1, cell size 2^k) around v's cell holds no solid,
    # then for any v inside the center cell [v - 2^k, v + 2^k + 1) lies
    # within the block, so skipping r = 2^k is safe. Monotone in c (a clear
    # size-2^k block contains the size-2^(k-1) block), so the where-chain
    # with increasing c keeps the largest qualified code. Coarse levels pad
    # with uniform-EMPTY to the (S >> k)^3 cube, matching cell_code's
    # out-of-array semantics (the cube padding holds no solid).
    if int(skip_radius_cap) > 3:
        for c in range(4, min(int(skip_radius_cap), 7) + 1):
            k = c - 1
            if k > top:
                break
            code_k = pyramid.code_levels[k]
            sk = S >> k
            dz, dy, dx = code_k.shape
            solid_k = jnp.zeros((sk, sk, sk), bool).at[:dz, :dy, :dx].set(
                code_k != 0)
            nb = jax.lax.reduce_window(
                solid_k, False, jax.lax.bitwise_or,
                window_dimensions=(3, 3, 3), window_strides=(1, 1, 1),
                padding="SAME",
            )
            q = ~nb
            for _ in range(k):
                q = _repeat2(q)
            radius = jnp.where(q, jnp.uint8(c), radius)
    radius = jnp.where(solid, jnp.uint8(0), radius)

    return (
        solid.astype(jnp.uint8)
        | (level << jnp.uint8(1))
        | (radius << jnp.uint8(5))
    )


def decode_skip_radius(code):
    """Decoded Chebyshev skip radius of a leaf-volume radius code (int).

    r = c for c <= 3, else 2^(c-1) (8/16/32/64 for codes 4..7)."""
    c = code.astype(jnp.int32)
    return jnp.where(c <= 3, c, jnp.left_shift(jnp.int32(1), c - 1))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LinearOctree:
    """BFS-flattened octree node arrays (root at index 0).

    Layout mirrors the reference's GPU node buffer (RayTracerBVH.h:21-26 /
    RayTracerBVH.cpp:430-505): integer corner coords in voxel units of the
    padded 2^L cube, power-of-two size, leaf/solid/uniform flags and eight
    child indices with -1 for "no child". All leaves in the builder are
    uniform (buildOctreeRec only stops at uniform regions or size 1).

    ``sorted_keys``/``sorted_node_idx`` implement g_octreeMap: keys are
    ``pack_key(x, y, z)`` with the deepest (smallest) node at each shared
    corner — lookup via binary search in ``find_node``.
    """

    x: jax.Array          # int32[N]
    y: jax.Array          # int32[N]
    z: jax.Array          # int32[N]
    size: jax.Array       # int32[N]
    is_leaf: jax.Array    # bool[N]
    is_solid: jax.Array   # bool[N]
    is_uniform: jax.Array  # bool[N]
    children: jax.Array   # int32[N, 8]
    level: jax.Array      # int32[N]; 0 = finest (size 1)
    sorted_keys: jax.Array      # int32[M] unique corner keys, ascending
    sorted_node_idx: jax.Array  # int32[M] deepest node at that corner

    @property
    def num_nodes(self) -> int:
        return self.x.shape[0]

    def world_bounds(self, grid_origin, voxel_size):
        """Per-node world AABB (mirrors nodeMin/nodeMax, RayTracerBVH.cpp:262-264)."""
        lo = (
            grid_origin[None, :]
            + jnp.stack([self.x, self.y, self.z], axis=-1).astype(jnp.float32)
            * voxel_size
        )
        hi = lo + self.size[:, None].astype(jnp.float32) * voxel_size
        return lo, hi

    def find_node(self, x, y, z):
        """Deepest node anchored at corner (x, y, z), or -1.

        Array replacement for ``g_octreeMap.find(buildKey(x,y,z))``
        (AdaptiveDualContouringRenderer.cpp:671-677). Vectorized.
        """
        key = pack_key(x, y, z)
        pos = jnp.searchsorted(self.sorted_keys, key)
        pos_c = jnp.clip(pos, 0, self.sorted_keys.shape[0] - 1)
        hit = self.sorted_keys[pos_c] == key
        return jnp.where(hit, self.sorted_node_idx[pos_c], -1)


@functools.partial(jax.jit, static_argnames=("S",))
def _build_node_id_volume(children, S: int):
    ids = jnp.zeros((1, 1, 1), jnp.int32)
    for _ in range(int(np.log2(S))):
        ids = _repeat2(ids)
        n = ids.shape[0]
        h = jnp.arange(n, dtype=jnp.int32) & 1
        octant = (
            h[None, None, :]            # x -> bit 0 (OctreeVoxel.cpp:751-755)
            + 2 * h[None, :, None]      # y -> bit 1
            + 4 * h[:, None, None]      # z -> bit 2
        )
        child = children[ids, jnp.broadcast_to(octant, ids.shape)]
        ids = jnp.where(child >= 0, child, ids)
    return ids


def build_node_id_volume(tree: LinearOctree, root_size: int = 0) -> jax.Array:
    """i32[S, S, S]: id of the LEAF node containing each voxel of the root cube.

    The constant-time half of ``g_octreeMap``: the deepest node anchored at
    any corner c is always a leaf (internal nodes always carry all 8
    children, so an anchored chain descends to one), and it exists iff the
    leaf containing c has min-corner exactly c. So ``find_node`` becomes one
    volume gather plus an anchored check (:func:`find_node_vol`) instead of
    a log2(N)-step binary search per query — the DC adjacency passes issue
    millions of such queries per extraction. Built top-down from the child
    arrays in log2(S) doubling steps; scene preprocessing, like the
    reference registering every node in the map during the octree build
    (OctreeVoxel.cpp:552-554,712-713).
    """
    if not root_size:
        from ray_tracing_octrees_tpu.core.grid import host_fetch

        root_size = int(np.asarray(host_fetch(tree.size[:1]))[0])
    return _build_node_id_volume(tree.children, S=int(root_size))


def find_node_vol(tree: LinearOctree, id_vol: jax.Array, x, y, z):
    """``find_node`` via the node-id volume: one gather + anchored check.

    Matches ``LinearOctree.find_node`` exactly on in-cube coordinates
    (tests/test_octree.py asserts parity); out-of-cube queries return -1
    (callers mask those with their own bounds tests before use).
    """
    S = id_vol.shape[0]
    x = jnp.asarray(x, jnp.int32)
    y = jnp.asarray(y, jnp.int32)
    z = jnp.asarray(z, jnp.int32)
    inb = (x >= 0) & (y >= 0) & (z >= 0) & (x < S) & (y < S) & (z < S)
    xc = jnp.clip(x, 0, S - 1)
    yc = jnp.clip(y, 0, S - 1)
    zc = jnp.clip(z, 0, S - 1)
    nid = id_vol[zc, yc, xc]
    # anchored <=> the query corner is aligned to the containing leaf's
    # size (cells are size-aligned), i.e. the low `level` bits of every
    # coordinate are zero — one level gather instead of three coord gathers
    lvl = tree.level[nid]
    low = (jnp.int32(1) << lvl) - 1
    anchored = ((x | y | z) & low) == 0
    return jnp.where(inb & anchored, nid, -1)


def build_linear_octree(occ) -> LinearOctree:
    """Host-side (NumPy) construction of the BFS node arrays.

    Runs once per scene (like the reference's CPU build+flatten). Node set
    and flags reproduce buildOctreeRec exactly: start from the 2^L root,
    subdivide every non-uniform cell into 8 children (bit0=x, bit1=y, bit2=z),
    leaves are uniform cells and size-1 cells. BFS order matches
    RayTracerBVH::setOctree's queue traversal: level by level, children in
    parent visit order then child index order.
    """
    from ray_tracing_octrees_tpu.core.grid import host_fetch

    occ_np = host_fetch(occ) > 0
    dz, dy, dx = occ_np.shape
    s = padded_cube_size(dx, dy, dz)
    num_levels = int(np.log2(s)) + 1

    # Host mip stack, finest first, with virtual EMPTY padding.
    any_l = [occ_np]
    all_l = [occ_np]
    for _ in range(num_levels - 1):
        prev_any, prev_all = any_l[-1], all_l[-1]
        pz, py, px = (-prev_any.shape[0]) % 2, (-prev_any.shape[1]) % 2, (-prev_any.shape[2]) % 2
        if pz or py or px:
            pad = ((0, pz), (0, py), (0, px))
            prev_any = np.pad(prev_any, pad, constant_values=False)
            prev_all = np.pad(prev_all, pad, constant_values=False)
        nzz, nyy, nxx = prev_any.shape[0] // 2, prev_any.shape[1] // 2, prev_any.shape[2] // 2
        any_l.append(prev_any.reshape(nzz, 2, nyy, 2, nxx, 2).any(axis=(1, 3, 5)))
        all_l.append(prev_all.reshape(nzz, 2, nyy, 2, nxx, 2).all(axis=(1, 3, 5)))

    def cell_any_all(k, cx, cy, cz):
        """Vectorized (any, all) at level k with out-of-array -> (F, F)."""
        a, b = any_l[k], all_l[k]
        inb = (
            (cx >= 0) & (cy >= 0) & (cz >= 0)
            & (cx < a.shape[2]) & (cy < a.shape[1]) & (cz < a.shape[0])
        )
        xc = np.clip(cx, 0, a.shape[2] - 1)
        yc = np.clip(cy, 0, a.shape[1] - 1)
        zc = np.clip(cz, 0, a.shape[0] - 1)
        return np.where(inb, a[zc, yc, xc], False), np.where(inb, b[zc, yc, xc], False)

    # BFS level by level. Cells are (cx, cy, cz) at their own level's scale.
    root_level = num_levels - 1
    levels_cells = []  # list of (level_k, cells[M,3] int32 in visit order)
    cells = np.zeros((1, 3), np.int64)  # root cell
    node_chunks = []
    # Per level: arrays x,y,z,size,is_leaf,is_solid,is_uniform, child_base
    total = 0
    offsets = []
    per_level_meta = []
    k = root_level
    while True:
        cx, cy, cz = cells[:, 0], cells[:, 1], cells[:, 2]
        c_any, c_all = cell_any_all(k, cx, cy, cz)
        uniform = c_all | (~c_any)
        if k == 0:
            uniform = np.ones_like(uniform)
        is_leaf = uniform.copy()
        is_solid = np.where(uniform, c_all, False)
        # Non-uniform leaves don't occur; is_uniform == uniform.
        per_level_meta.append((k, cells, is_leaf, is_solid, uniform))
        offsets.append(total)
        total += cells.shape[0]
        if k == 0 or not (~uniform).any():
            break
        parents = cells[~uniform]  # in visit order
        # 8 children each, child index i: offset bit0=x, bit1=y, bit2=z.
        offs = np.array(
            [[(i >> 0) & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)], np.int64
        )
        cells = (parents[:, None, :] * 2 + offs[None, :, :]).reshape(-1, 3)
        k -= 1

    n = total
    xs = np.zeros(n, np.int32)
    ys = np.zeros(n, np.int32)
    zs = np.zeros(n, np.int32)
    sizes = np.zeros(n, np.int32)
    leaf = np.zeros(n, bool)
    solid = np.zeros(n, bool)
    unif = np.zeros(n, bool)
    lvl = np.zeros(n, np.int32)
    children = np.full((n, 8), -1, np.int32)

    for li, (kk, cells_k, is_leaf, is_solid, uniform) in enumerate(per_level_meta):
        off = offsets[li]
        m = cells_k.shape[0]
        size_k = 1 << kk
        xs[off : off + m] = cells_k[:, 0] * size_k
        ys[off : off + m] = cells_k[:, 1] * size_k
        zs[off : off + m] = cells_k[:, 2] * size_k
        sizes[off : off + m] = size_k
        leaf[off : off + m] = is_leaf
        solid[off : off + m] = is_solid
        unif[off : off + m] = uniform
        lvl[off : off + m] = kk
        if li + 1 < len(per_level_meta):
            child_off = offsets[li + 1]
            nonuni = ~uniform
            ranks = np.cumsum(nonuni) - 1  # rank among non-uniform parents
            base = child_off + 8 * ranks
            idx = np.nonzero(nonuni)[0]
            children[off + idx] = base[idx, None] + np.arange(8)[None, :]

    # g_octreeMap parity: deepest node wins at shared corners.
    keys = (xs.astype(np.int32) << 20) | (ys.astype(np.int32) << 10) | zs.astype(np.int32)
    order = np.lexsort((sizes, keys))  # by key, then size ascending
    sorted_keys_all = keys[order]
    first = np.ones(n, bool)
    first[1:] = sorted_keys_all[1:] != sorted_keys_all[:-1]
    sorted_keys = sorted_keys_all[first]
    sorted_idx = order[first].astype(np.int32)

    return LinearOctree(
        x=jnp.asarray(xs),
        y=jnp.asarray(ys),
        z=jnp.asarray(zs),
        size=jnp.asarray(sizes),
        is_leaf=jnp.asarray(leaf),
        is_solid=jnp.asarray(solid),
        is_uniform=jnp.asarray(unif),
        children=jnp.asarray(children),
        level=jnp.asarray(lvl),
        sorted_keys=jnp.asarray(sorted_keys),
        sorted_node_idx=jnp.asarray(sorted_idx),
    )


def leaf_grid_arrays(tree: LinearOctree, dims_xyz: Tuple[int, int, int]):
    """Dense per-voxel leaf metadata for kernel-side adjacency.

    Returns (leaf_size[z,y,x] int32, leaf_solid[z,y,x] bool, leaf_corner_id
    [z,y,x] int32 where the voxel is a leaf's corner voxel else -1). Host-side
    helper for small scenes / debugging; kernels use ``find_node`` instead.
    """
    dx, dy, dz = dims_xyz
    xs = np.asarray(tree.x)
    ys = np.asarray(tree.y)
    zs = np.asarray(tree.z)
    sizes = np.asarray(tree.size)
    leaf = np.asarray(tree.is_leaf)
    solid = np.asarray(tree.is_solid)
    leaf_size = np.zeros((dz, dy, dx), np.int32)
    leaf_solid = np.zeros((dz, dy, dx), bool)
    corner_id = np.full((dz, dy, dx), -1, np.int32)
    for i in np.nonzero(leaf)[0]:
        x0, y0, z0, s = xs[i], ys[i], zs[i], sizes[i]
        if x0 >= dx or y0 >= dy or z0 >= dz:
            continue
        x1, y1, z1 = min(x0 + s, dx), min(y0 + s, dy), min(z0 + s, dz)
        leaf_size[z0:z1, y0:y1, x0:x1] = s
        leaf_solid[z0:z1, y0:y1, x0:x1] = solid[i]
        corner_id[z0, y0, x0] = i
    return leaf_size, leaf_solid, corner_id


def get_neighbors(tree: LinearOctree, node_idx):
    """Six face-neighbor node indices (or -1), same-size corner lookups.

    Port of ``getNeighbors`` (OctreeVoxel.cpp:559-630): offsets the node
    corner by +-size along each axis and resolves through the corner-key
    map (deepest node wins). Vectorized over node_idx.
    """
    node_idx = jnp.asarray(node_idx, jnp.int32)
    x = tree.x[node_idx]
    y = tree.y[node_idx]
    z = tree.z[node_idx]
    s = tree.size[node_idx]
    out = []
    for dx, dy, dz in ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)):
        out.append(tree.find_node(x + dx * s, y + dy * s, z + dz * s))
    return jnp.stack(out, axis=-1)
