"""Micro-tuning: warp tile config + sort variants on chip."""
import os
import sys
import time
import traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(repo, "xla_cache"))

import numpy as np
import jax
import jax.numpy as jnp
from ray_tracing_octrees_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

N = 1920 * 1088
i32 = jnp.int32


def bench(name, fn, salt0, *args, iters=10):
    out = fn(jnp.int32(0), *args)
    jax.block_until_ready(out)
    best = 1e9
    for w in range(2):
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(jnp.int32(w * iters + i + 1), *args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    print(f"{name:36s} {best:7.2f} ms", flush=True)


key = jax.random.PRNGKey(0)
flags = jax.random.bernoulli(key, 0.03, (N,))


@jax.jit
def sort_two(salt, flags):
    f = flags.at[salt % N].set(True)
    _, idxs = jax.lax.sort((jnp.where(f, 0, 1).astype(i32),
                            jnp.arange(N, dtype=i32)),
                           num_keys=1, is_stable=True)
    return idxs[:1024]


@jax.jit
def sort_fused(salt, flags):
    f = flags.at[salt % N].set(True)
    fused = jnp.where(f, 0, 1 << 27) | jnp.arange(N, dtype=i32)
    return (jax.lax.sort(fused) & ((1 << 27) - 1))[:1024]


bench("sort two-operand 2.09M", sort_two, 0, flags)
bench("sort fused-key 2.09M", sort_fused, 0, flags)

from ray_tracing_octrees_tpu.trace.warp_kernel import (
    split_hi_lo, split_hi_mid_lo, warp_lookup_multi)

IH, IW = 1024, 512
p0 = jax.random.uniform(key, (IH, IW)) * 1000
p1 = (jax.random.uniform(key, (IH, IW)) * (1 << 24)).astype(i32).astype(jnp.float32)
lin = ((jax.random.uniform(key, (1088, 1920), minval=0, maxval=IH - 1)
        ).astype(i32) << 10) | (jax.random.uniform(
            jax.random.PRNGKey(1), (1088, 1920), minval=0,
            maxval=IW - 1)).astype(i32)


def mk_warp(ty, tx, win):
    @jax.jit
    def w(salt, p0, p1, lin):
        p0 = p0.at[0, 0].add(salt.astype(jnp.float32) * 1e-6)
        t_stack = jnp.concatenate(
            [split_hi_lo(p0), split_hi_mid_lo(p1), split_hi_mid_lo(p1)],
            axis=0)
        return warp_lookup_multi(t_stack, (2, 3, 3), lin, ty, tx, win)
    return w

for ty, tx, win in ((32, 128, 128), (16, 128, 128), (8, 128, 128)):
    try:
        bench(f"warp_multi ty={ty} tx={tx} win={win}",
              mk_warp(ty, tx, win), 0, p0, p1, lin)
    except Exception as e:
        print(f"warp ty={ty} win={win} failed: {e}"[:300], flush=True)
