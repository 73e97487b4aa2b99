"""Layout-provenance study of XLA element gathers on the v5e tunnel.

Hypothesis: the ~9-22 ns/elem "gather floor" recorded in the round-2/3
cost model is NOT a hardware gather rate — it is the cost of gathering
from an operand whose on-device layout is tiled/padded (e.g. the
reshape(-1) of a [256, 425, 29] volume, whose 29-lane minor dim pads to
128), while gathers from a linear-layout table run ~1000x faster
(tools/exp_gather_dtype.py measured 0.02 ms for 1M random gathers from a
fresh 12.8 MB table).

Measures, at mesh-tracer shapes (1M gathers, 3.2M-element table):
  A. gather from a separately-jitted reshape(-1) table   (in-situ repro)
  B. same with with_layout_constraint(..., linear) on the build output
  C. gather FUSED in one program with the table build    (frame repro)
  D. C with the layout constraint between build and gather
  E. warp-shaped repro: [1024,1024] f32 table, 2M coherent gathers
     (the round-1 16 ms XLA warp gather), with/without constraint
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.layout import Format, Layout, with_layout_constraint

from ray_tracing_octrees_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

N = 1 << 20
ITERS = 16


def bench(label, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:52s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def linear(x):
    return with_layout_constraint(x, Layout(tuple(range(x.ndim))))


def main():
    rng = np.random.default_rng(1)
    vol_np = rng.integers(0, 255, (256, 425, 29)).astype(np.float32)
    vol = jnp.asarray(vol_np.astype(jnp.bfloat16))
    npk = vol_np.size
    idx = jnp.asarray(rng.integers(0, npk, N).astype(np.int32))

    def build(v):
        cs = v.astype(jnp.float32)
        z = jnp.zeros_like(cs[:, :1])
        am1 = jnp.concatenate([z, cs[:, :-1]], axis=1)
        ap1 = jnp.concatenate([cs[:, 1:], z], axis=1)
        return (am1 + 256.0 * cs + 65536.0 * ap1).reshape(-1)

    pk_jit = jax.block_until_ready(jax.jit(build)(vol))
    pk_lin = jax.block_until_ready(
        jax.jit(lambda v: linear(build(v)))(vol))

    gat = jax.jit(lambda t, i: jnp.take(t, i))
    bench("A. gather, separate-jit reshaped table", gat, pk_jit, idx)
    bench("B. gather, layout-constrained table", gat, pk_lin, idx)

    bench("C. gather fused with build (one program)",
          jax.jit(lambda v, i: jnp.take(build(v), i)), vol, idx)
    bench("D. fused + layout constraint between",
          jax.jit(lambda v, i: jnp.take(linear(build(v)), i)), vol, idx)

    # 3 offset gathers (the packed-case a-triple form in slab_pass)
    def g3(t, i):
        return [jnp.take(t, jnp.clip(i + o, 0, npk - 1)) for o in (-1, 0, 1)]

    bench("A3. 3x offset gathers, reshaped table", jax.jit(g3), pk_jit, idx)
    bench("B3. 3x offset gathers, constrained table", jax.jit(g3), pk_lin, idx)

    # E. warp repro: 2M coherent lookups into a [1024,1024] table produced
    # in-program (the round-1 XLA warp gather measured 16 ms)
    M = 1920 * 1088
    tbl2 = jnp.asarray(rng.uniform(0, 1, (1024, 1024)).astype(np.float32))
    lin_idx = jnp.asarray(
        np.clip(np.arange(M) % (1024 * 1024), 0, 1024 * 1024 - 1)
        .astype(np.int32))

    def warp_plain(t, i):
        return jnp.take(t.reshape(-1), i)

    def warp_con(t, i):
        return jnp.take(linear(t.reshape(-1)), i)

    bench("E. warp-shaped gather, plain", jax.jit(warp_plain), tbl2, lin_idx)
    bench("E'. warp-shaped gather, constrained",
          jax.jit(warp_con), tbl2, lin_idx)

    # F. u8 volume gather (exact-tracer leaf volume shape): 1M random
    # gathers from a 512^3 u8 volume, flat-indexed
    S = 512
    volu8 = jnp.asarray(rng.integers(0, 255, (S, S, S)).astype(np.uint8))
    idxf = jnp.asarray(rng.integers(0, S ** 3, N).astype(np.int32))

    def g8(v, i):
        return jnp.take(v.reshape(-1), i)

    def g8c(v, i):
        return jnp.take(linear(v.reshape(-1)), i)

    bench("F. u8 512^3 volume gather, plain", jax.jit(g8), volu8, idxf)
    bench("F'. u8 512^3 volume gather, constrained",
          jax.jit(g8c), volu8, idxf)
    # and via i32 upcast of the flat volume (4x bytes, aligned lanes)
    volu32 = jnp.asarray(
        rng.integers(0, 255, S ** 3).astype(np.int32))
    bench("F32. i32 flat volume gather (fresh table)",
          jax.jit(lambda v, i: jnp.take(v, i)), volu32, idxf)


if __name__ == "__main__":
    main()
