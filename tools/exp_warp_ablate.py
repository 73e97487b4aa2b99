"""Ablate the one-hot warp kernel to find the per-tile overhead.

Variants (same grid/specs as the real kernel):
  null      : write a constant block
  intops    : + lin decode, umin, rel_u, masks (no table access)
  twload    : + the two u-window ref slices + concat
  select    : + the final select math on a dummy A (no matmul)
  full      : the real grouped kernel (from exp_onehot_warp)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.exp_onehot_warp import (
    TH, TW, onehot_warp_grouped, split_hi_lo,
)

WIN = 64


def _decode(lin):
    invalid = lin < 0
    iu = jnp.where(invalid, TH - 1, lin >> 10)
    iv0 = jnp.where(invalid, TW - 1, lin & (TW - 1))
    iv = jnp.where(invalid, jnp.min(iv0), iv0)
    umin = (jnp.clip(jnp.min(iu), 0, TH - WIN) >> 3) << 3
    umin = pl.multiple_of(umin, 8)
    rel_u = jnp.clip(iu - umin, 0, WIN - 1)
    return invalid, iu, iv, umin, rel_u


def _k_null(t_ref, lin_ref, o_ref):
    o_ref[:, :] = jnp.zeros((8, 128), jnp.float32)


def _k_intops(t_ref, lin_ref, o_ref):
    lin = lin_ref[:, :]
    invalid, iu, iv, umin, rel_u = _decode(lin)
    o_ref[:, :] = jnp.where(invalid, -1.0, (rel_u + iv + umin).astype(jnp.float32))


def _k_twload(t_ref, lin_ref, o_ref):
    lin = lin_ref[:, :]
    invalid, iu, iv, umin, rel_u = _decode(lin)
    tw_hi = t_ref[pl.ds(umin, WIN), :]
    tw_lo = t_ref[pl.ds(TH + umin, WIN), :]
    tw = jnp.concatenate([tw_hi, tw_lo], axis=0)
    o_ref[:, :] = jnp.where(
        invalid, -1.0,
        tw[0:1, 0:128].astype(jnp.float32) + rel_u.astype(jnp.float32))


def _k_select(t_ref, lin_ref, o_ref):
    lin = lin_ref[:, :]
    invalid, iu, iv, umin, rel_u = _decode(lin)
    A3 = jnp.full((8, 128, 2 * WIN), 1.5, jnp.float32) * iv[:, :, None].astype(jnp.float32)
    riota = jax.lax.broadcasted_iota(jnp.int32, (8, 128, WIN), 2)
    mask = (riota == rel_u[:, :, None]).astype(jnp.float32)
    val = ((A3[:, :, :WIN] + A3[:, :, WIN:]) * mask).sum(axis=2)
    o_ref[:, :] = jnp.where(invalid, -1.0, val)


def make_call(kernel):
    @jax.jit
    def f(t_hl, lin2d):
        Hp, Wp = lin2d.shape
        return pl.pallas_call(
            kernel,
            grid=(Hp // 8, Wp // 128),
            in_specs=[
                pl.BlockSpec((2 * TH, TW), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        )(t_hl, lin2d)
    return f


def force(x):
    return np.asarray(x.reshape(-1)[:8])


def main():
    H, W = 1088, 1920
    rng = np.random.default_rng(0)
    T2 = jnp.asarray(rng.uniform(0, 512, (TH, TW)).astype(np.float32))
    t_hl = jax.block_until_ready(split_hi_lo(T2))
    lins = []
    for k in range(4):
        base_u = rng.integers(0, TH - 60)
        iu = np.clip(base_u + (np.arange(H)[:, None] // 24) % 50
                     + rng.integers(0, 4, (H, W)), 0, TH - 1)
        iv = np.clip((np.arange(W)[None, :] // 2 + k * 7) % TW
                     + rng.integers(0, 4, (H, W)), 0, TW - 1)
        lin = (iu * TW + iv).astype(np.int32)
        lins.append(jax.block_until_ready(jnp.asarray(lin)))

    variants = [
        ("null", make_call(_k_null)),
        ("intops", make_call(_k_intops)),
        ("twload", make_call(_k_twload)),
        ("select", make_call(_k_select)),
        ("full grouped w64", lambda t, l: onehot_warp_grouped(t, l, 64)),
    ]
    force(np.asarray(variants[0][1](t_hl, lins[0])))
    for name, fn in variants:
        out = fn(t_hl, lins[0])
        jax.block_until_ready(out)
        force(out)
        n = 20
        t0 = time.perf_counter()
        outs = [fn(t_hl, lins[k % 4]) for k in range(n)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / n * 1e3
        force(outs[-1])
        print(f"{name:18s} {dt:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
