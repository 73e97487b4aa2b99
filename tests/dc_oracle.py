"""Scalar NumPy oracle for dual contouring.

Port of QEFSolver / generateDualVertex / gatherHermiteData /
calculateIntersection / buildTrianglesCPU / createTriangles /
createFaceTriangles semantics (AdaptiveDualContouringRenderer.cpp), with the
one documented divergence from the reference: every leaf's dual vertex is
computed from its own extent (no order-dependent adjacent-size cache).
"""

from __future__ import annotations

import numpy as np

from tests.oracles import OracleGrid, OracleNode, build_octree, FILLED

REG = 0.3
RELAX = 0.7
MIX = 0.2
CMIX = 0.1
SNAP = 0.85
ALIGN = 0.7
INSET = 0.001
AREA_EPS = 1e-6
MAX_RATIO = 2


def scalar(grid: OracleGrid, x, y, z):
    return -1.0 if grid.get_safe(x, y, z) == FILLED else 1.0


def grid_to_world(grid: OracleGrid, x, y, z):
    return np.array(
        [
            grid.origin[0] + x * grid.voxel_size,
            grid.origin[1] + y * grid.voxel_size,
            grid.origin[2] + z * grid.voxel_size,
        ],
        np.float64,
    )


def calculate_intersection(grid, x1, y1, z1, x2, y2, z2):
    f1 = grid.get_safe(x1, y1, z1) == FILLED
    f2 = grid.get_safe(x2, y2, z2) == FILLED
    p1 = grid_to_world(grid, x1, y1, z1)
    p2 = grid_to_world(grid, x2, y2, z2)
    v1 = -1.0 if f1 else 1.0
    v2 = -1.0 if f2 else 1.0
    t = v1 / (v1 - v2)
    pos = p1 + t * (p2 - p1)
    dx, dy, dz = x2 - x1, y2 - y1, z2 - z1
    if dx != 0:
        g1 = scalar(grid, x1, y1 + 1, z1) - scalar(grid, x1, y1 - 1, z1)
        g2 = scalar(grid, x1, y1, z1 + 1) - scalar(grid, x1, y1, z1 - 1)
        n = np.array([0.0, g1, g2])
    elif dy != 0:
        g1 = scalar(grid, x1 + 1, y1, z1) - scalar(grid, x1 - 1, y1, z1)
        g2 = scalar(grid, x1, y1, z1 + 1) - scalar(grid, x1, y1, z1 - 1)
        n = np.array([g1, 0.0, g2])
    else:
        g1 = scalar(grid, x1 + 1, y1, z1) - scalar(grid, x1 - 1, y1, z1)
        g2 = scalar(grid, x1, y1 + 1, z1) - scalar(grid, x1, y1 - 1, z1)
        n = np.array([g1, g2, 0.0])
    if (n ** 2).sum() < 1e-10:
        n = np.array([dx, dy, dz], np.float64)
    else:
        n = n / np.linalg.norm(n)
    dot = n[0] * dx + n[1] * dy + n[2] * dz
    points_with_edge = dot > 0
    if points_with_edge == f2:
        n = -n
    return pos, n


def gather_hermite(grid: OracleGrid, x0, y0, z0, size):
    dx, dy, dz = grid.dims
    max_x = min(x0 + size, dx - 1)
    max_y = min(y0 + size, dy - 1)
    max_z = min(z0 + size, dz - 1)
    min_x = max(x0, 0)
    min_y = max(y0, 0)
    min_z = max(z0, 0)
    stride = 2 if size > 8 else 1
    if size <= 4:
        stride = 1
    pts = []
    dirs = [(1, 0, 0), (0, 1, 0), (0, 0, 1)]
    for z in range(min_z, max_z + 1, stride):
        for y in range(min_y, max_y + 1, stride):
            for x in range(min_x, max_x + 1, stride):
                cur = grid.get_safe(x, y, z) == FILLED
                for ddx, ddy, ddz in dirs:
                    nx, ny, nz = x + ddx, y + ddy, z + ddz
                    if nx < 0 or ny < 0 or nz < 0 or nx >= dx or ny >= dy or nz >= dz:
                        continue
                    nxt = grid.get_safe(nx, ny, nz) == FILLED
                    if cur != nxt:
                        pts.append(calculate_intersection(grid, x, y, z, nx, ny, nz))
    return pts


def qef_solve(ata, atb, psum, npts, cell_center, cell_size):
    masspoint = psum / npts if npts > 0 else cell_center.copy()
    if npts <= 2:
        return masspoint
    a = ata + np.eye(3) * REG
    det = np.linalg.det(a)
    if abs(det) < 1e-10:
        return masspoint
    inv = np.linalg.inv(a)
    if not np.isfinite(inv).all() or np.abs(inv).max() > 1e6:
        return masspoint
    sol = inv @ atb
    sol = masspoint + RELAX * (sol - masspoint)
    if not np.isfinite(sol).all():
        return masspoint
    if ((sol - masspoint) ** 2).sum() >= cell_size * cell_size:
        return masspoint
    return sol * (1 - MIX) + masspoint * MIX


def generate_dual_vertex(hermite, cell_center, cell_size):
    if not hermite:
        return cell_center.copy()
    half = cell_size * 0.5
    inset = cell_size * INSET
    min_b = cell_center - half + inset
    max_b = cell_center + half - inset
    masspoint = np.mean([p for p, _ in hermite], axis=0)
    avg_n = np.sum([n for _, n in hermite], axis=0)
    if np.linalg.norm(avg_n) > 1e-4:
        u = avg_n / np.linalg.norm(avg_n)
        a = np.abs(u)
        mc = a.max()
        if mc > SNAP:
            if a[0] == mc:
                snapped = np.array([1.0 if u[0] > 0 else -1.0, 0, 0])
            elif a[1] == mc:
                snapped = np.array([0, 1.0 if u[1] > 0 else -1.0, 0])
            else:
                snapped = np.array([0, 0, 1.0 if u[2] > 0 else -1.0])
            plane_pts = [
                p for p, n in hermite
                if np.dot(n / max(np.linalg.norm(n), 1e-30), snapped) > ALIGN
            ]
            if plane_pts:
                pp = np.mean(plane_pts, axis=0)
                d = -np.dot(snapped, pp)
                t = -(np.dot(snapped, cell_center) + d)
                proj = cell_center + t * snapped
                return np.clip(proj, min_b, max_b)
    ata = np.zeros((3, 3))
    atb = np.zeros(3)
    psum = np.zeros(3)
    for p, n in hermite:
        nu = n / max(np.linalg.norm(n), 1e-30)
        ata += np.outer(nu, nu)
        atb += nu * (-np.dot(nu, p))
        psum += p
    qef_center = 0.5 * (min_b + max_b)
    qef_size = (max_b - min_b)[0]
    sol = qef_solve(ata, atb, psum, len(hermite), qef_center, qef_size)
    sol = np.clip(sol, min_b, max_b)
    return sol * (1 - CMIX) + masspoint * CMIX


def voxel_center(grid, x, y, z):
    return grid_to_world(grid, x, y, z) + 0.5 * grid.voxel_size


def uniform_dc(grid: OracleGrid):
    """Single-pass per-voxel DC: per-cell vertex + buildTrianglesCPU rule."""
    dx, dy, dz = grid.dims
    verts = {}

    def get_vertex(x, y, z):
        key = (x, y, z)
        if key not in verts:
            h = gather_hermite(grid, x, y, z, 1)
            c = voxel_center(grid, x, y, z)
            verts[key] = generate_dual_vertex(h, c, grid.voxel_size) if h else c
        return verts[key]

    tris = []

    def add_quad(v00, v01, v11, v10, invert):
        for a, b, c in ((v00, v01, v11), (v00, v11, v10)):
            e1 = b - a
            e2 = c - a
            cr = np.cross(e1, e2)
            area = 0.5 * np.linalg.norm(cr)
            if area > AREA_EPS:
                n = cr / max(np.linalg.norm(cr), 1e-30)
                if invert:
                    n = -n
                tris.append((np.stack([a, b, c]), n))

    for z in range(dz - 1):
        for y in range(dy - 1):
            for x in range(dx - 1):
                c_fill = grid.occ[z, y, x] == FILLED
                if c_fill != (grid.occ[z, y, x + 1] == FILLED):
                    add_quad(
                        get_vertex(x, y, z), get_vertex(x, y + 1, z),
                        get_vertex(x + 1, y + 1, z), get_vertex(x + 1, y, z),
                        c_fill,
                    )
                if c_fill != (grid.occ[z, y + 1, x] == FILLED):
                    add_quad(
                        get_vertex(x, y, z), get_vertex(x + 1, y, z),
                        get_vertex(x + 1, y + 1, z), get_vertex(x, y + 1, z),
                        c_fill,
                    )
                if c_fill != (grid.occ[z + 1, y, x] == FILLED):
                    add_quad(
                        get_vertex(x, y, z), get_vertex(x, y + 1, z),
                        get_vertex(x, y + 1, z + 1), get_vertex(x, y, z + 1),
                        c_fill,
                    )
    return tris


def cell_contains_surface(grid: OracleGrid, x0, y0, z0, size):
    dx, dy, dz = grid.dims
    max_x = min(x0 + size, dx)
    max_y = min(y0 + size, dy)
    max_z = min(z0 + size, dz)
    min_x = max(x0, 0)
    min_y = max(y0, 0)
    min_z = max(z0, 0)
    if min_x >= max_x or min_y >= max_y or min_z >= max_z:
        return False
    any_f = any_e = False
    for cx, cy, cz in (
        (min_x, min_y, min_z), (max_x - 1, min_y, min_z),
        (max_x - 1, max_y - 1, min_z), (min_x, max_y - 1, min_z),
        (min_x, min_y, max_z - 1), (max_x - 1, min_y, max_z - 1),
        (max_x - 1, max_y - 1, max_z - 1), (min_x, max_y - 1, max_z - 1),
    ):
        if cx < 0 or cy < 0 or cz < 0 or cx >= dx or cy >= dy or cz >= dz:
            continue
        if grid.occ[cz, cy, cx] == FILLED:
            any_f = True
        else:
            any_e = True
        if any_f and any_e:
            return True
    stride = max(1, size // 4)
    for off in range(0, size, stride):
        y1, z1 = min_y + off, min_z + off
        if y1 < max_y and z1 < max_z:
            for xa, xb in ((min_x - 1, min_x), (max_x - 1, max_x)):
                if xa >= 0 and xb < dx:
                    if (grid.occ[z1, y1, xa] == FILLED) != (grid.occ[z1, y1, xb] == FILLED):
                        return True
        x1, z1 = min_x + off, min_z + off
        if x1 < max_x and z1 < max_z:
            for ya, yb in ((min_y - 1, min_y), (max_y - 1, max_y)):
                if ya >= 0 and yb < dy:
                    if (grid.occ[z1, ya, x1] == FILLED) != (grid.occ[z1, yb, x1] == FILLED):
                        return True
        x1, y1 = min_x + off, min_y + off
        if x1 < max_x and y1 < max_y:
            for za, zb in ((min_z - 1, min_z), (max_z - 1, max_z)):
                if za >= 0 and zb < dz:
                    if (grid.occ[za, y1, x1] == FILLED) != (grid.occ[zb, y1, x1] == FILLED):
                        return True
    if size <= 4:
        for z in range(min_z, max_z - 1):
            for y in range(min_y, max_y - 1):
                for x in range(min_x, max_x - 1):
                    s = grid.occ[z, y, x] == FILLED
                    if (
                        s != (grid.occ[z, y, x + 1] == FILLED)
                        or s != (grid.occ[z, y + 1, x] == FILLED)
                        or s != (grid.occ[z + 1, y, x] == FILLED)
                    ):
                        return True
    return False


def adaptive_dc(grid: OracleGrid, with_fans=True):
    """createTriangles over all leaves with clean own-size vertex semantics.

    Iterates ALL FOUR edges per direction (validating that only the
    min-corner edge produces non-degenerate triangles)."""
    dx, dy, dz = grid.dims
    root, node_map = build_octree(grid)

    leaves = []

    def rec(n):
        if n.is_leaf:
            leaves.append(n)
        else:
            for c in n.children:
                rec(c)

    import sys
    sys.setrecursionlimit(100000)
    rec(root)

    vcache = {}

    def vertex_of(node):
        key = (node.x, node.y, node.z)
        if key not in vcache:
            h = gather_hermite(grid, node.x, node.y, node.z, node.size)
            c = grid_to_world(grid, node.x, node.y, node.z) + 0.5 * node.size * grid.voxel_size
            vcache[key] = generate_dual_vertex(h, c, node.size * grid.voxel_size) if h else c
        return vcache[key]

    from tests.oracles import build_key

    tris = []
    fan_candidates = []
    for node in leaves:
        if not cell_contains_surface(grid, node.x, node.y, node.z, node.size):
            continue
        x0, y0, z0, size = node.x, node.y, node.z, node.size
        emitted = False
        for d in range(3):
            dvec = [(1, 0, 0), (0, 1, 0), (0, 0, 1)][d]
            for edge in range(4):
                ex1, ey1, ez1 = x0, y0, z0
                if d == 0:
                    ey1 += size if (edge & 1) else 0
                    ez1 += size if (edge & 2) else 0
                elif d == 1:
                    ex1 += size if (edge & 1) else 0
                    ez1 += size if (edge & 2) else 0
                else:
                    ex1 += size if (edge & 1) else 0
                    ey1 += size if (edge & 2) else 0
                ex2 = ex1 + dvec[0] * size
                ey2 = ey1 + dvec[1] * size
                ez2 = ez1 + dvec[2] * size
                if (
                    min(ex1, ey1, ez1, ex2, ey2, ez2) < 0
                    or ex1 >= dx or ey1 >= dy or ez1 >= dz
                    or ex2 >= dx or ey2 >= dy or ez2 >= dz
                ):
                    continue
                if (grid.occ[ez1, ey1, ex1] == FILLED) == (grid.occ[ez2, ey2, ex2] == FILLED):
                    continue
                cells = [(node, vertex_of(node))]
                for adj_idx in range(1, 4):
                    ax, ay, az = x0, y0, z0
                    if d == 0:
                        if adj_idx == 1: ay = ey1 - size
                        elif adj_idx == 2: az = ez1 - size
                        else: ay, az = ey1 - size, ez1 - size
                    elif d == 1:
                        if adj_idx == 1: ax = ex1 - size
                        elif adj_idx == 2: az = ez1 - size
                        else: ax, az = ex1 - size, ez1 - size
                    else:
                        if adj_idx == 1: ax = ex1 - size
                        elif adj_idx == 2: ay = ey1 - size
                        else: ax, ay = ex1 - size, ey1 - size
                    if ax < 0 or ay < 0 or az < 0 or ax >= dx or ay >= dy or az >= dz:
                        continue
                    nb = node_map.get(build_key(ax, ay, az))
                    if nb is None or not nb.is_leaf:
                        continue
                    if max(size, nb.size) > min(size, nb.size) * MAX_RATIO:
                        continue
                    cells.append((nb, vertex_of(nb)))
                flip = node.is_solid
                def push(a, b, c):
                    nonlocal emitted
                    e1 = b - a
                    e2 = c - a
                    cr = np.cross(e1, e2)
                    area = 0.5 * np.linalg.norm(cr)
                    if area > AREA_EPS:
                        nn = cr / max(np.linalg.norm(cr), 1e-30)
                        if flip:
                            nn = -nn
                        tris.append((np.stack([a, b, c]), nn))
                        emitted = True
                if len(cells) == 3:
                    push(cells[0][1], cells[1][1], cells[2][1])
                elif len(cells) >= 4:
                    push(cells[0][1], cells[1][1], cells[2][1])
                    push(cells[0][1], cells[2][1], cells[3][1])
        if not emitted:
            if (
                x0 == 0 or y0 == 0 or z0 == 0
                or x0 + size >= dx or y0 + size >= dy or z0 + size >= dz
            ):
                fan_candidates.append(node)

    if with_fans:
        for node in fan_candidates:
            tris.extend(face_fans(grid, node, node_map, vcache, vertex_of))
    return tris


def face_fans(grid: OracleGrid, node, node_map, vcache, vertex_of):
    from tests.oracles import build_key

    dx, dy, dz = grid.dims
    size = node.size
    cell_vertex = vertex_of(node)
    out = []
    dirs = [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]
    for f, fd in enumerate(dirs):
        nx = node.x + fd[0] * size
        ny = node.y + fd[1] * size
        nz = node.z + fd[2] * size
        if nx < 0 or ny < 0 or nz < 0 or nx >= dx or ny >= dy or nz >= dz:
            continue
        cur = node.is_solid
        nb = node_map.get(build_key(nx, ny, nz))
        if nb is not None and nb.is_leaf:
            if max(size, nb.size) > min(size, nb.size) * MAX_RATIO:
                continue
            nbs = nb.is_solid
            # clean semantics: a leaf's vertex is always its own-size dual vertex
            nbv = vertex_of(nb)
        else:
            cx = min(max(nx + size // 2, 0), dx - 1)
            cy = min(max(ny + size // 2, 0), dy - 1)
            cz = min(max(nz + size // 2, 0), dz - 1)
            nbs = grid.occ[cz, cy, cx] == FILLED
            nbv = grid_to_world(grid, nx, ny, nz) + 0.5 * size * grid.voxel_size
        if cur == nbs:
            continue
        half = size * grid.voxel_size * 0.5
        fn = np.array(fd, np.float64)
        axis = f // 2
        if axis == 0:
            t1, t2 = np.array([0, 1.0, 0]), np.array([0, 0, 1.0])
        elif axis == 1:
            t1, t2 = np.array([1.0, 0, 0]), np.array([0, 0, 1.0])
        else:
            t1, t2 = np.array([1.0, 0, 0]), np.array([0, 1.0, 0])
        normal = fn if cur else -fn
        fc = 0.5 * (cell_vertex + nbv)
        div = 2
        gp = {}
        for i in range(div + 1):
            for j in range(div + 1):
                u = 2.0 * (i / div) - 1.0
                v = 2.0 * (j / div) - 1.0
                bulge = 0.05 * half * (1.0 - (u * u + v * v))
                gp[(i, j)] = fc + t1 * (u * half) + t2 * (v * half) + fn * bulge
        for i in range(div):
            for j in range(div):
                p00, p10 = gp[(i, j)], gp[(i + 1, j)]
                p01, p11 = gp[(i, j + 1)], gp[(i + 1, j + 1)]
                out.append((np.stack([cell_vertex, p00, p10]), normal))
                out.append((np.stack([cell_vertex, p10, p11]), normal))
                out.append((np.stack([cell_vertex, p11, p01]), normal))
                out.append((np.stack([cell_vertex, p01, p00]), normal))
                out.append((np.stack([nbv, p10, p00]), -normal))
                out.append((np.stack([nbv, p11, p10]), -normal))
                out.append((np.stack([nbv, p01, p11]), -normal))
                out.append((np.stack([nbv, p00, p01]), -normal))
    return out
