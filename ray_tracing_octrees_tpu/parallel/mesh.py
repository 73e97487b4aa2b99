"""Device-mesh construction for multi-chip rendering.

The reference is single-GPU; its only parallel vocabulary is OpenMP loops
and GL dispatches (SURVEY.md §2.8). The TPU-native scale-out maps:

  ray batches  -> data parallel over the ``dp`` mesh axis (each chip traces
                  a contiguous slab of pixels; no communication),
  voxel grid   -> Z-slab sharding over the ``tp`` axis, mirroring the
                  reference's partial Z-slab cache loads
                  (CacheUtils.cpp:60-111), with halo/all-gather collectives
                  where stencils or traversal need neighbor data.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    tp: Optional[int] = None,
) -> Mesh:
    """A (dp, tp) mesh over the first ``n_devices`` devices.

    Defaults: tp = 2 when the device count is even and > 1, else 1;
    dp = n / tp. Rays ride ``dp``; grid Z-slabs ride ``tp``.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    if tp is None:
        tp = 2 if (n % 2 == 0 and n > 1) else 1
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp={dp * tp} != n_devices={n}")
    arr = np.array(devs[:n]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Rays [N, 3] sharded over dp (replicated over tp)."""
    return NamedSharding(mesh, P("dp", None))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Flat per-pixel outputs [N, C] sharded over dp."""
    return NamedSharding(mesh, P("dp", None))


def grid_z_sharding(mesh: Mesh) -> NamedSharding:
    """Voxel grid (Z, Y, X) sharded over Z on tp."""
    return NamedSharding(mesh, P("tp", None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
