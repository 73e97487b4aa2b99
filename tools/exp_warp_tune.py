"""Tune the grouped one-hot warp: tile shape, window, select method.

Uses synthetic index fields shaped like real poses (u-range ~50/tile @8x128,
v smooth along x) plus the real bench pose for final numbers.
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

from tools.exp_onehot_warp import TH, TW, split_hi_lo

NG = TW // 128


def _kernel(ty, tx, win, mxu_sel, t_ref, lin_ref, o_ref, a_scr):
    lin = lin_ref[:, :]
    invalid = lin < 0
    iu = jnp.where(invalid, TH - 1, lin >> 10)
    iv0 = jnp.where(invalid, TW - 1, lin & (TW - 1))
    iv = jnp.where(invalid, jnp.min(iv0), iv0)
    umin = (jnp.clip(jnp.min(iu), 0, TH - win) >> 3) << 3
    umin = pl.multiple_of(umin, 8)
    rel_u = jnp.clip(iu - umin, 0, win - 1)

    tw_hi = t_ref[pl.ds(umin, win), :]
    tw_lo = t_ref[pl.ds(TH + umin, win), :]
    tw = jnp.concatenate([tw_hi, tw_lo], axis=0)   # [2*win, 1024]

    gmin = jnp.min(iv) >> 7
    gmax = jnp.max(iv) >> 7
    P = ty * tx
    a_scr[:, :] = jnp.zeros((P, 2 * win), jnp.float32)
    for g in range(NG):
        @pl.when((g >= gmin) & (g <= gmax))
        def _():
            civ = jax.lax.broadcasted_iota(jnp.int32, (ty, tx, 128), 2) + g * 128
            Vg = (civ == iv[:, :, None]).astype(jnp.bfloat16).reshape(P, 128)
            twg = tw[:, g * 128:(g + 1) * 128]
            a_scr[:, :] += jax.lax.dot_general(
                Vg, twg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    A3 = a_scr[:, :].reshape(ty, tx, 2 * win)
    riota = jax.lax.broadcasted_iota(jnp.int32, (ty, tx, win), 2)
    mask = (riota == rel_u[:, :, None]).astype(jnp.float32)
    masked = (A3[:, :, :win] + A3[:, :, win:]) * mask
    if mxu_sel:
        ones = jnp.ones((8, win), jnp.float32)
        val = jax.lax.dot_general(
            masked.reshape(P, win), ones, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:, 0].reshape(ty, tx)
    else:
        val = masked.sum(axis=2)
    o_ref[:, :] = jnp.where(invalid, -1.0, val)


@functools.partial(jax.jit, static_argnames=("ty", "tx", "win", "mxu_sel"))
def warp(t_hl, lin2d, ty: int, tx: int, win: int, mxu_sel: bool = False):
    Hp, Wp = lin2d.shape
    return pl.pallas_call(
        functools.partial(_kernel, ty, tx, win, mxu_sel),
        grid=(Hp // ty, Wp // tx),
        in_specs=[
            pl.BlockSpec((2 * TH, TW), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ty, tx), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ty, tx), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ty * tx, 2 * win), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(t_hl, lin2d)


def force(x):
    return np.asarray(x.reshape(-1)[:8])


def main():
    H, W = 1088, 1920
    rng = np.random.default_rng(0)
    T2np = rng.uniform(0, 512, (TH, TW)).astype(np.float32)
    T2np = np.round(T2np) + 0.5
    t_hl = jax.block_until_ready(split_hi_lo(jnp.asarray(T2np)))
    lins, lin_nps = [], []
    for k in range(4):
        yy = np.arange(H)[:, None]
        xx = np.arange(W)[None, :]
        iu = np.clip((yy * 0.35 + xx * 0.02 + k).astype(np.int32), 0, TH - 1)
        iv = np.clip((xx * 0.52 + yy * 0.01 + 3 * k).astype(np.int32), 0, TW - 1)
        lin = (iu * TW + iv).astype(np.int32)
        lin_nps.append(lin)
        lins.append(jax.block_until_ready(jnp.asarray(lin)))

    ref = T2np.reshape(-1)[lin_nps[0]]
    cfgs = [
        (8, 128, 64, False),
        (8, 128, 64, True),
        (16, 128, 64, False),
        (16, 256, 128, False),
        (16, 256, 128, True),
        (32, 128, 128, False),
    ]
    for ty, tx, win, ms in cfgs:
        if W % tx or H % ty:
            continue
        out = np.asarray(warp(t_hl, lins[0], ty, tx, win, ms))
        mm = float((out != ref).mean())
        o = warp(t_hl, lins[0], ty, tx, win, ms)
        jax.block_until_ready(o)
        force(o)
        n = 20
        t0 = time.perf_counter()
        outs = [warp(t_hl, lins[k % 4], ty, tx, win, ms) for k in range(n)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / n * 1e3
        force(outs[-1])
        print(f"tile({ty:2d},{tx:3d}) win={win:3d} mxu_sel={int(ms)}: "
              f"{dt:6.2f} ms  mismatch={mm:.7f}", flush=True)


if __name__ == "__main__":
    main()
