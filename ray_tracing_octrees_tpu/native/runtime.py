"""ctypes bindings + on-demand build of the native ingest runtime.

The shared library is compiled from ``voxelizer.cpp`` on first use (g++ -O3
-fopenmp); everything degrades gracefully to the NumPy implementations when
no toolchain is present (``available()`` returns False).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "voxelizer.cpp")
_LIB = os.path.join(_DIR, "libvoxelizer.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-o", _LIB, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        try:  # retry without -march=native
            subprocess.run(
                [c for c in cmd if c != "-march=native"],
                check=True, capture_output=True, timeout=120,
            )
            return True
        except Exception:
            return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.voxelize_tris.restype = ctypes.c_longlong
        lib.voxelize_tris.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.save_voxel_grid.restype = ctypes.c_int
        lib.save_voxel_grid.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.read_grid_header.restype = ctypes.c_int
        lib.read_grid_header.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.load_voxel_grid_slab.restype = ctypes.c_int
        lib.load_voxel_grid_slab.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.parse_csv.restype = ctypes.c_longlong
        lib.parse_csv.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
        ]
        lib.assemble_triangles.restype = ctypes.c_longlong
        lib.assemble_triangles.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return lib


def available() -> bool:
    return _load() is not None


def voxelize_triangles(tri_verts: np.ndarray, voxel_size: float):
    """Native OpenMP voxelizer; same geometry rules as the NumPy port."""
    from ray_tracing_octrees_tpu.ingest.voxelize import grid_geometry
    from ray_tracing_octrees_tpu.core.grid import VoxelGrid
    import jax.numpy as jnp

    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    lo, hi, vs, (dx, dy, dz) = grid_geometry(np.asarray(tri_verts), voxel_size)
    occ = np.zeros(dx * dy * dz, np.uint8)
    tris = np.ascontiguousarray(tri_verts, np.float32)
    lib.voxelize_tris(
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tris.shape[0],
        ctypes.c_float(lo[0]), ctypes.c_float(lo[1]), ctypes.c_float(lo[2]),
        ctypes.c_float(vs), dx, dy, dz,
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return VoxelGrid.create(
        jnp.asarray(occ.reshape(dz, dy, dx)), origin=(lo[0], lo[1], lo[2]),
        voxel_size=vs,
    )


def parse_csv_file(path: str, min_tokens: int, n_numeric: int) -> np.ndarray:
    """Native tolerant CSV parse (loadCSVVertices/loadCSVFaces semantics);
    float64[rows, n_numeric]. Two-call protocol (count, then fill)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    n = lib.parse_csv(path.encode(), min_tokens, n_numeric,
                      None, 0)
    if n < 0:
        raise IOError(f"cannot read CSV: {path}")
    out = np.zeros((int(n), n_numeric), np.float64)
    n2 = lib.parse_csv(
        path.encode(), min_tokens, n_numeric,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n)
    return out[: int(n2)]


def assemble_triangles_native(verts: np.ndarray, faces: np.ndarray):
    """Native (mesh#, vertex#) face resolution; same drop rules as
    ingest.csv_loader.assemble_triangles. Returns (tris f32[K,3,3],
    kept bool[M])."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    v = np.ascontiguousarray(verts, np.float64)
    f = np.ascontiguousarray(faces, np.float64)
    tris = np.zeros((f.shape[0], 3, 3), np.float32)
    kept = np.zeros(f.shape[0], np.uint8)
    k = lib.assemble_triangles(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), v.shape[0],
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), f.shape[0],
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        kept.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return tris[: int(k)], kept.astype(bool)


def save_grid(path: str, grid) -> bool:
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    occ = np.ascontiguousarray(np.asarray(grid.occ, np.uint8))
    origin = np.asarray(grid.origin, np.float32)
    ok = lib.save_voxel_grid(
        path.encode(), grid.dim_x, grid.dim_y, grid.dim_z,
        ctypes.c_float(origin[0]), ctypes.c_float(origin[1]),
        ctypes.c_float(origin[2]), ctypes.c_float(float(grid.voxel_size)),
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return bool(ok)


def load_grid(path: str, start_layer: int = 0, num_layers: Optional[int] = None):
    from ray_tracing_octrees_tpu.core.grid import VoxelGrid
    import jax.numpy as jnp

    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    dims = (ctypes.c_int * 3)()
    mins = (ctypes.c_float * 3)()
    vs = ctypes.c_float()
    count = ctypes.c_uint64()
    if not lib.read_grid_header(path.encode(), dims, mins, ctypes.byref(vs), ctypes.byref(count)):
        raise IOError(f"cannot read grid header: {path}")
    dx, dy, dz = dims[0], dims[1], dims[2]
    if num_layers is None:
        num_layers = dz - start_layer
    out = np.zeros(dx * dy * num_layers, np.uint8)
    if not lib.load_voxel_grid_slab(
        path.encode(), start_layer, num_layers,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    ):
        raise IOError(f"cannot read grid slab: {path}")
    origin = (mins[0], mins[1], mins[2] + start_layer * vs.value)
    return VoxelGrid.create(
        jnp.asarray(out.reshape(num_layers, dy, dx)), origin=origin,
        voxel_size=vs.value,
    )
