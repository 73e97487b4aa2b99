"""Multi-host initialization over DCN (SURVEY §2.8 communication row).

The reference is a single-process GL program; the TPU-native scale-out
runs one process per host with `jax.distributed`, after which
``jax.devices()`` spans every chip in the slice and the meshes built by
:mod:`ray_tracing_octrees_tpu.parallel.mesh` lay dp/tp over ICI within a
host and DCN across hosts (outer mesh axis first, so the per-frame
``tp`` halo/min collectives ride ICI).

Usage (one call per process, before any backend use):

    from ray_tracing_octrees_tpu.parallel import initialize_distributed
    initialize_distributed()                    # TPU pods: auto-detected
    initialize_distributed("host0:1234", 4, 1)  # explicit DCN bootstrap
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """``jax.distributed.initialize`` with environment auto-detection.

    On TPU pods every argument is discoverable from the runtime and may
    be omitted. Elsewhere the coordinator/process arguments (or the
    RTO_TPU_COORDINATOR / RTO_TPU_NUM_PROCS / RTO_TPU_PROC_ID environment
    variables) bootstrap the DCN cluster. Returns True when a multi-
    process cluster was initialized, False for the single-process case
    (no coordinator configured) — callers need no code changes either
    way, mirroring how the reference runs unconditionally single-process.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "RTO_TPU_COORDINATOR")
    if num_processes is None and "RTO_TPU_NUM_PROCS" in os.environ:
        num_processes = int(os.environ["RTO_TPU_NUM_PROCS"])
    if process_id is None and "RTO_TPU_PROC_ID" in os.environ:
        process_id = int(os.environ["RTO_TPU_PROC_ID"])

    in_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES")
                  or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if coordinator_address is None and not in_pod:
        return False
    from jax._src import xla_bridge

    if xla_bridge.backends_are_initialized():
        # Too late to bootstrap DCN in this process; stay single-process.
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def local_slice(array_len: int) -> slice:
    """The contiguous [start, stop) this process owns of a globally even
    partition — the per-host analog of the reference's partial Z-slab
    cache loads (CacheUtils.cpp:62-111): each host feeds only its slab
    into globally-sharded arrays via ``jax.make_array_from_process_local_data``.
    """
    import jax

    n = jax.process_count()
    i = jax.process_index()
    per = (array_len + n - 1) // n
    return slice(i * per, min(array_len, (i + 1) * per))
