"""Prefix-sum stream compaction — the XLA replacement for push_back/atomicAdd.

Every dynamically-sized emission in the reference (triangle vectors, hermite
buffers, SSBO atomic counters) becomes: mask -> exclusive cumsum -> scatter
into a bounded buffer with out-of-capacity drops (SURVEY.md §2.8's
"atomics -> prefix sums" mapping).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def compact_indices(mask: jax.Array, capacity: int) -> Tuple[jax.Array, jax.Array]:
    """Indices of true entries, packed front-first into a fixed buffer.

    mask: bool[N] (any shape is flattened). Returns (idx int32[capacity],
    count int32). Entries beyond count are 0; entries beyond capacity drop.
    """
    m = mask.reshape(-1)
    n = m.shape[0]
    pos = jnp.cumsum(m.astype(jnp.int32)) - 1
    slots = jnp.where(m, pos, capacity)
    out = jnp.zeros((capacity,), jnp.int32).at[slots].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    return out, jnp.minimum(m.sum(), capacity)


def compact_rows(data: jax.Array, mask: jax.Array, capacity: int):
    """Pack rows of ``data`` where mask is true. Returns (rows, count)."""
    idx, count = compact_indices(mask, capacity)
    flat = data.reshape((-1,) + data.shape[mask.ndim:])
    rows = flat[idx]
    valid = jnp.arange(capacity) < count
    rows = jnp.where(
        valid.reshape((capacity,) + (1,) * (rows.ndim - 1)), rows, 0
    )
    return rows, count
