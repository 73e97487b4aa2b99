"""Second tuning round for the grouped one-hot warp.

Variants:
  ctrl    : best from round 1 (scratch [P, 2win], concat tw, int compares)
  slim    : per-group hi/lo ref slices (no concat), bf16 compares,
            scratch [P, win] accumulating dot_hi + dot_lo
  persel  : like slim but select applied per group, tiny [ty,tx] accumulator
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
from tools.exp_warp_tune import warp as warp_ctrl

NG = TW // 128


def _decode(lin, win):
    invalid = lin < 0
    iu = jnp.where(invalid, TH - 1, lin >> 10)
    iv0 = jnp.where(invalid, TW - 1, lin & (TW - 1))
    iv = jnp.where(invalid, jnp.min(iv0), iv0)
    umin = (jnp.clip(jnp.min(iu), 0, TH - win) >> 3) << 3
    umin = pl.multiple_of(umin, 8)
    rel_u = jnp.clip(iu - umin, 0, win - 1)
    return invalid, iv, umin, rel_u


def _k_slim(ty, tx, win, t_ref, lin_ref, o_ref, a_scr):
    lin = lin_ref[:, :]
    invalid, iv, umin, rel_u = _decode(lin, win)
    gmin = jnp.min(iv) >> 7
    gmax = jnp.max(iv) >> 7
    P = ty * tx
    civ0 = jax.lax.broadcasted_iota(jnp.int32, (ty, tx, 128), 2)

    for g in range(NG):
        def body(first, g=g):
            Vg = ((civ0 + g * 128) == iv[:, :, None]).astype(
                jnp.bfloat16).reshape(P, 128)
            th_ = t_ref[pl.ds(umin, win), g * 128:(g + 1) * 128]
            tl_ = t_ref[pl.ds(TH + umin, win), g * 128:(g + 1) * 128]
            d = jax.lax.dot_general(
                Vg, th_, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                Vg, tl_, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if first:
                a_scr[:, :] = d
            else:
                a_scr[:, :] += d

        @pl.when(g == gmin)
        def _():
            body(True)

        @pl.when((g > gmin) & (g <= gmax))
        def _():
            body(False)

    A3 = a_scr[:, :].reshape(ty, tx, win)
    riota = jax.lax.broadcasted_iota(jnp.int32, (ty, tx, win), 2)
    mask = (riota == rel_u[:, :, None]).astype(jnp.float32)
    val = (A3 * mask).sum(axis=2)
    o_ref[:, :] = jnp.where(invalid, -1.0, val)


def _k_persel(ty, tx, win, t_ref, lin_ref, o_ref, o_acc):
    lin = lin_ref[:, :]
    invalid, iv, umin, rel_u = _decode(lin, win)
    gmin = jnp.min(iv) >> 7
    gmax = jnp.max(iv) >> 7
    P = ty * tx
    civ0 = jax.lax.broadcasted_iota(jnp.int32, (ty, tx, 128), 2)
    riota = jax.lax.broadcasted_iota(jnp.int32, (ty, tx, win), 2)
    mask = (riota == rel_u[:, :, None]).astype(jnp.float32)

    for g in range(NG):
        def body(first, g=g):
            Vg = ((civ0 + g * 128) == iv[:, :, None]).astype(
                jnp.bfloat16).reshape(P, 128)
            th_ = t_ref[pl.ds(umin, win), g * 128:(g + 1) * 128]
            tl_ = t_ref[pl.ds(TH + umin, win), g * 128:(g + 1) * 128]
            d = jax.lax.dot_general(
                Vg, th_, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                Vg, tl_, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            val = (d.reshape(ty, tx, win) * mask).sum(axis=2)
            if first:
                o_acc[:, :] = val
            else:
                o_acc[:, :] += val

        @pl.when(g == gmin)
        def _():
            body(True)

        @pl.when((g > gmin) & (g <= gmax))
        def _():
            body(False)

    o_ref[:, :] = jnp.where(invalid, -1.0, o_acc[:, :])


def make(kernel_fn, scratch):
    @functools.partial(jax.jit, static_argnames=("ty", "tx", "win"))
    def f(t_hl, lin2d, ty: int, tx: int, win: int):
        Hp, Wp = lin2d.shape
        return pl.pallas_call(
            functools.partial(kernel_fn, ty, tx, win),
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
            scratch_shapes=[scratch(ty, tx, win)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
        )(t_hl, lin2d)
    return f


warp_slim = make(_k_slim, lambda ty, tx, win: pltpu.VMEM((ty * tx, win), jnp.float32))
warp_persel = make(_k_persel, lambda ty, tx, win: pltpu.VMEM((ty, tx), jnp.float32))


def force(x):
    return np.asarray(x.reshape(-1)[:8])


def main():
    H, W = 1088, 1920
    rng = np.random.default_rng(0)
    T2np = np.round(rng.uniform(0, 512, (TH, TW)).astype(np.float32)) + 0.5
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
        ("ctrl", lambda t, l, ty, tx, w: warp_ctrl(t, l, ty, tx, w, False), 32, 128, 128),
        ("slim", warp_slim, 32, 128, 128),
        ("slim", warp_slim, 16, 128, 64),
        ("persel", warp_persel, 32, 128, 128),
        ("persel", warp_persel, 16, 128, 64),
    ]
    for name, fn, ty, tx, win in cfgs:
        try:
            out = np.asarray(fn(t_hl, lins[0], ty, tx, win))
        except Exception as e:
            print(f"{name} tile({ty},{tx}) win={win}: FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            continue
        mm = float((out != ref).mean())
        o = fn(t_hl, lins[0], ty, tx, win)
        jax.block_until_ready(o)
        force(o)
        n = 20
        t0 = time.perf_counter()
        outs = [fn(t_hl, lins[k % 4], ty, tx, win) for k in range(n)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / n * 1e3
        force(outs[-1])
        print(f"{name:6s} tile({ty:2d},{tx:3d}) win={win:3d}: {dt:6.2f} ms  "
              f"mismatch={mm:.7f}", flush=True)


if __name__ == "__main__":
    main()
