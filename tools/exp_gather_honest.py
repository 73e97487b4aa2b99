"""Honest gather timing: varied inputs per iteration, forced readback.

tools/exp_gather_dtype.py and exp_gather_layout.py timed repeated calls
with IDENTICAL inputs and measured ~0.02 ms per 1M-element gather —
faster than HBM random access permits, i.e. the tunnel runtime elides or
caches identical dispatches (the known block_until_ready gotcha, see
.claude/skills/verify). This probe times a pipelined loop over DISTINCT
index arrays after a real readback, which is how the frame actually runs
(every round gathers at different indices).
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
NPK = 3_155_200
ROUNDS = 24


def bench(label, fn, arg_sets):
    outs = [jax.block_until_ready(fn(*a)) for a in arg_sets[:1]]
    _ = np.asarray(jax.tree_util.tree_leaves(outs[0])[0]).ravel()[:4]  # real readback
    t0 = time.perf_counter()
    outs = []
    for k in range(ROUNDS):
        outs.append(fn(*arg_sets[k % len(arg_sets)]))
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / ROUNDS
    print(f"{label:52s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(1)
    tab_f32 = jnp.asarray(rng.uniform(0, 1, NPK).astype(np.float32))
    idxs = [jnp.asarray(rng.integers(0, NPK, N).astype(np.int32))
            for _ in range(8)]
    # coherent indices (ray-geometry-like): base ramp + small per-set jitter
    base = np.minimum(np.arange(N) * 3 % NPK, NPK - 1)
    idxs_coh = [jnp.asarray(((base + 29 * k) % NPK).astype(np.int32))
                for k in range(8)]

    gat = jax.jit(lambda t, i: jnp.take(t, i))
    bench("1M random gathers, table as ARG", gat,
          [(tab_f32, i) for i in idxs])
    bench("1M coherent gathers, table as ARG", gat,
          [(tab_f32, i) for i in idxs_coh])

    gat_c = jax.jit(lambda i: jnp.take(tab_f32, i))  # table CAPTURED
    bench("1M random gathers, table CAPTURED", gat_c,
          [(i,) for i in idxs])

    def g3(t, i):
        return [jnp.take(t, jnp.clip(i + o, 0, NPK - 1)) for o in (-1, 0, 1)]

    bench("3x 1M random gathers, table as ARG", jax.jit(g3),
          [(tab_f32, i) for i in idxs])

    # in-program build + gather (the _trace_texels shape)
    vol = jnp.asarray(
        rng.integers(0, 255, (256, 425, 29)).astype(np.float32)
        .astype(jnp.bfloat16))

    def build(v):
        cs = v.astype(jnp.float32)
        z = jnp.zeros_like(cs[:, :1])
        am1 = jnp.concatenate([z, cs[:, :-1]], axis=1)
        ap1 = jnp.concatenate([cs[:, 1:], z], axis=1)
        return (am1 + 256.0 * cs + 65536.0 * ap1).reshape(-1)

    bench("build+1M gather fused (one program)",
          jax.jit(lambda v, i: jnp.take(build(v), i)),
          [(vol, i) for i in idxs])

    # u8 flat volume gather at exact-tracer shapes
    S = 512
    volu8 = jnp.asarray(rng.integers(0, 255, S ** 3).astype(np.uint8))
    idxs8 = [jnp.asarray(rng.integers(0, S ** 3, N).astype(np.int32))
             for _ in range(8)]
    bench("1M random u8 gathers from 512^3 flat",
          jax.jit(lambda v, i: jnp.take(v, i)),
          [(volu8, i) for i in idxs8])

    # one-hot MXU fetch + MT chain at mesh shapes, varied cases
    mtc = jnp.asarray(rng.uniform(-3, 3, (256, 128)).astype(jnp.bfloat16))
    case_iota = jnp.arange(256, dtype=jnp.int32)
    cses = [jnp.asarray(rng.integers(0, 255, N).astype(np.int32))
            for _ in range(8)]

    def onehot(c, t):
        oh = (c[:, None] == case_iota[None, :]).astype(jnp.bfloat16)
        return jnp.einsum("nc,cl->nl", oh, t,
                          preferred_element_type=jnp.float32)

    bench("one-hot [1M,256]x[256,128] fetch", jax.jit(onehot),
          [(c, mtc) for c in cses])

    def onehot_bf16(c, t):
        oh = (c[:, None] == case_iota[None, :]).astype(jnp.bfloat16)
        return jnp.einsum("nc,cl->nl", oh, t,
                          preferred_element_type=jnp.bfloat16)

    bench("one-hot fetch, bf16 out", jax.jit(onehot_bf16),
          [(c, mtc) for c in cses])


if __name__ == "__main__":
    main()
