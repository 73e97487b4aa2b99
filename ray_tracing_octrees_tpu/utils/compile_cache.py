"""Persistent XLA compilation-cache setup for TPU entry points.

On tunneled/remote-compile TPU runtimes every XLA compile is a
multi-second RPC and a fresh process pays it for every program (measured:
the 1080p frame alone costs ~190 s of compiles cold, ~0 s cached), so the
on-disk cache is load-bearing for `bench.py` / `benchmarks.py` / the app.

This is deliberately NOT enabled at package import time: the decision
requires the *resolved* backend (a host without a TPU silently falls back
to the CPU backend even when ``JAX_PLATFORMS`` asks for TPU, and sharing
the cache between CPU-AOT and TPU programs risks feature-mismatch
SIGILLs), and mutating global jax config on import is a surprising side
effect for library consumers. Entry points call
:func:`enable_compile_cache` explicitly instead.
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_compile_cache() -> bool:
    """Enable the persistent XLA compile cache if the resolved backend is TPU.

    Safe to call repeatedly. Honors ``RTO_TPU_NO_COMPILE_CACHE=1`` (opt
    out) and ``JAX_COMPILATION_CACHE_DIR`` (relocate). Returns True when
    the cache is active after the call. Forces backend initialization —
    call from entry points, not at import time.
    """
    global _ENABLED
    if _ENABLED:
        return True
    if os.environ.get("RTO_TPU_NO_COMPILE_CACHE"):
        return False
    import jax

    try:
        backend = jax.default_backend()
    except Exception:
        return False
    if backend == "cpu":
        # CPU AOT shares no compilation artifacts with TPU; enabling the
        # cache here recreates the SIGILL hazard tests/conftest.py guards.
        return False
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "rto_tpu_xla"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # 0: the XLA-reported compile time excludes the remote-compile RPC
        # overhead that actually dominates here, so cache everything.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return False
    _ENABLED = True
    return True
