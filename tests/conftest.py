"""Test harness: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (the JAX analog of a fake backend; see SURVEY.md §4)."""

import os

# NOTE: JAX_PLATFORMS=cpu is NOT sufficient here — the axon TPU plugin
# registers itself regardless and becomes the default backend, silently
# routing every op through the TPU tunnel (catastrophically slow for tests).
# jax.config.update("jax_platforms", ...) before first backend use is what
# actually pins the CPU backend.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# No persistent compile cache for CPU test runs: replayed CPU AOT entries
# warn about host-feature mismatches and risk SIGILL (the cache exists for
# the remote-compile TPU runtime).
os.environ.setdefault("RTO_TPU_NO_COMPILE_CACHE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(453)
