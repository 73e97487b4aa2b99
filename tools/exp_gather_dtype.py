"""Isolate the element-gather rate by dtype and index provenance.

The round-1 split probe measured a u32 2x2-window gather (with in-kernel
index math) at 10.5 ms vs 22.6 ms for an f32 gather with precomputed
indices — this probe separates dtype from index-compute fusion so the
packed-case table dtype can be chosen on evidence.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ray_tracing_octrees_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

N = 1 << 20
NPK = 3_200_000
ITERS = 16


def bench(label, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:44s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    idx_np = rng.integers(0, NPK, N).astype(np.int32)
    idx = jnp.asarray(idx_np)
    pa = jnp.asarray(rng.uniform(1, 400, N).astype(np.float32))
    pb = jnp.asarray(rng.uniform(1, 25, N).astype(np.float32))
    tabs = {
        "f32": jnp.asarray(rng.uniform(0, 1, NPK).astype(np.float32)),
        "u32": jnp.asarray(rng.integers(0, 2**31, NPK).astype(np.uint32)),
        "i32": jnp.asarray(rng.integers(0, 2**31, NPK).astype(np.int32)),
    }

    for name, tab in tabs.items():
        fn = jax.jit(lambda t, i: jnp.take(t, i))
        bench(f"pure gather, precomputed idx, {name}", fn, tab, idx)

    for name, tab in tabs.items():
        def fn(t, pa, pb):
            fa0 = jnp.clip(jnp.floor(pa - 0.25), 0.0, 420.0)
            fb0 = jnp.clip(jnp.floor(pb - 0.25), 0.0, 27.0)
            fi = ((pa * 7.0 + fa0) * 29.0 + fb0).astype(jnp.int32)
            return jnp.take(t, jnp.clip(fi, 0, NPK - 1))
        bench(f"gather, in-kernel idx math, {name}", jax.jit(fn), tab, pa, pb)

    # 3 gathers at idx-1, idx, idx+1 (the packed-case a-triple form)
    for name, tab in tabs.items():
        def fn3(t, i):
            return [jnp.take(t, jnp.clip(i + o, 0, NPK - 1))
                    for o in (-1, 0, 1)]
        bench(f"3x offset gathers, {name}", jax.jit(fn3), tab, idx)


if __name__ == "__main__":
    main()


def layout_probe():
    """Reproduce the slow gather: table produced by reshape(-1) of a
    [256, 425, 29] volume inside jit vs the same values device_put fresh."""
    rng = np.random.default_rng(1)
    vol_np = rng.integers(0, 255, (256, 425, 29)).astype(np.float32)
    vol = jnp.asarray(vol_np.astype(jnp.bfloat16))
    npk = vol_np.size
    idx = jnp.asarray(rng.integers(0, npk, N).astype(np.int32))

    @jax.jit
    def build(v):
        cs = v.astype(jnp.float32)
        z = jnp.zeros_like(cs[:, :1])
        am1 = jnp.concatenate([z, cs[:, :-1]], axis=1)
        ap1 = jnp.concatenate([cs[:, 1:], z], axis=1)
        return (am1 + 256.0 * cs + 65536.0 * ap1).reshape(-1)

    pk_jit = jax.block_until_ready(build(vol))
    pk_fresh = jax.block_until_ready(jnp.asarray(np.asarray(pk_jit)))

    gat = jax.jit(lambda t, i: jnp.take(t, i))
    bench("gather from jit-reshaped volume table", gat, pk_jit, idx)
    bench("gather from freshly device_put table", gat, pk_fresh, idx)

    # in-jit relayout attempts
    @jax.jit
    def build_copy(v):
        return build(v) + 0.0

    pk_c = jax.block_until_ready(build_copy(vol))
    bench("gather from jit table (+0.0 copy)", gat, pk_c, idx)

    @jax.jit
    def gat_fused(v, i):
        return jnp.take(build(v), i)

    bench("gather fused with table build in ONE jit", gat_fused, vol, idx)


layout_probe()
