"""Microbench alternate Moller-Trumbore dot-constant formulations.

The mesh tracer's round cost is dominated by 9 slot passes (~4.3
ns/row/slot measured via the kcells=9-vs-4 delta). Each slot is one
one-hot MXU fetch plus a 6-term weighted lane contraction on tiny-lane
tensors ([m,6,15], [m,4,5], [m,5]) that pad 8-25x on the VPU. This
times isolated candidate forms at m = 512k on the real chip:

  A current  : fk.reshape(-1,6,15) * qa[:,:,None] sum(1) + hit logic
  B selector : qa-expansion and block reduction as tiny selector matmuls
               (qa @ R [6,90], prod @ G [90,15]) - no reshapes
  C split    : six [m,256]x[256,16] einsums (one per qa term), qa
               multiply on [m,16]
  D onehot   : the one-hot fetch alone (floor cost)
  E fetch3   : the 3 packed-case gathers + unpack alone (floor cost)

Usage: python tools/exp_mt_forms.py [m] [iters]
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

from ray_tracing_octrees_tpu.trace.mesh_grid import _mt_const_np, _MT_EPS

M = int(sys.argv[1]) if len(sys.argv) > 1 else 512 * 1024
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 30
f32 = jnp.float32
_BIG = jnp.float32(3.0e38)


def hit_logic(det, ud, vd, td, eps):
    sgn = jnp.sign(det)
    ok = jnp.abs(det) > eps
    tt = td / jnp.where(ok, det, 1.0)
    hit5 = (ok & (ud * sgn >= 0) & (vd * sgn >= 0)
            & ((ud + vd - det) * sgn <= 0) & (tt > eps))
    ttm = jnp.where(hit5, tt, _BIG)
    return ttm.min(axis=1), jnp.argmin(ttm, axis=1).astype(jnp.int32)


def main():
    rng = np.random.default_rng(0)
    cases = jnp.asarray(rng.integers(0, 256, size=(M,), dtype=np.int32))
    qa = jnp.asarray(rng.normal(size=(M, 6)).astype(np.float32))
    qb = jnp.asarray(rng.normal(size=(M, 4)).astype(np.float32))
    mtc = jnp.asarray(_mt_const_np(1))
    iota = jnp.arange(256, dtype=jnp.int32)
    eps = jnp.float32(_MT_EPS)

    # selector constants for form B
    Rnp = np.zeros((6, 90), np.float32)
    for i in range(6):
        Rnp[i, i * 15:(i + 1) * 15] = 1.0
    Gnp = np.zeros((90, 15), np.float32)
    for i in range(6):
        for j in range(15):
            Gnp[i * 15 + j, j] = 1.0
    R2np = np.zeros((4, 20), np.float32)
    for i in range(4):
        R2np[i, i * 5:(i + 1) * 5] = 1.0
    G2np = np.zeros((20, 5), np.float32)
    for i in range(4):
        for j in range(5):
            G2np[i * 5 + j, j] = 1.0
    R, G = jnp.asarray(Rnp), jnp.asarray(Gnp)
    R2, G2 = jnp.asarray(R2np), jnp.asarray(G2np)

    # split tables for form C: [256, 16] per qa term (det|ud|vd padded to
    # 16 lanes) and [256, 8] per qb term for td
    mtc_np = np.asarray(_mt_const_np(1), np.float32)
    Ci = [jnp.asarray(
        np.pad(mtc_np[:, i * 15:(i + 1) * 15], ((0, 0), (0, 1)))
        .astype(jnp.bfloat16)) for i in range(6)]
    Ti = [jnp.asarray(
        np.pad(mtc_np[:, 90 + i * 5:95 + i * 5], ((0, 0), (0, 3)))
        .astype(jnp.bfloat16)) for i in range(4)]

    def form_a(c, qa_, qb_):
        oh = (c[:, None] == iota[None, :]).astype(jnp.bfloat16)
        fk = jnp.einsum("nc,cl->nl", oh, mtc, preferred_element_type=f32)
        mt = (fk[:, :90].reshape(-1, 6, 15) * qa_[:, :, None]).sum(1)
        det, ud, vd = mt[:, 0:5], mt[:, 5:10], mt[:, 10:15]
        td = (fk[:, 90:110].reshape(-1, 4, 5) * qb_[:, :, None]).sum(1)
        return hit_logic(det, ud, vd, td, eps)

    def form_b(c, qa_, qb_):
        oh = (c[:, None] == iota[None, :]).astype(jnp.bfloat16)
        fk = jnp.einsum("nc,cl->nl", oh, mtc, preferred_element_type=f32)
        qe = qa_ @ R                                    # [m, 90]
        mt = (fk[:, :90] * qe) @ G                      # [m, 15]
        det, ud, vd = mt[:, 0:5], mt[:, 5:10], mt[:, 10:15]
        qe2 = qb_ @ R2
        td = (fk[:, 90:110] * qe2) @ G2
        return hit_logic(det, ud, vd, td, eps)

    def form_c(c, qa_, qb_):
        oh = (c[:, None] == iota[None, :]).astype(jnp.bfloat16)
        mt = None
        for i in range(6):
            blk = jnp.einsum("nc,cl->nl", oh, Ci[i],
                             preferred_element_type=f32)
            term = blk * qa_[:, i:i + 1]
            mt = term if mt is None else mt + term
        det, ud, vd = mt[:, 0:5], mt[:, 5:10], mt[:, 10:15]
        td = None
        for i in range(4):
            blk = jnp.einsum("nc,cl->nl", oh, Ti[i],
                             preferred_element_type=f32)
            term = blk * qb_[:, i:i + 1]
            td = term if td is None else td + term
        return hit_logic(det, ud, vd, td[:, :5], eps)

    def form_d(c, qa_, qb_):
        oh = (c[:, None] == iota[None, :]).astype(jnp.bfloat16)
        fk = jnp.einsum("nc,cl->nl", oh, mtc, preferred_element_type=f32)
        return fk.sum(axis=1), c

    forms = [("A current", form_a), ("B selector", form_b),
             ("C split", form_c), ("D onehot-only", form_d)]

    ref = None
    for name, fn in forms:
        jf = jax.jit(fn)
        out = jax.block_until_ready(jf(cases, qa, qb))
        if name.startswith("A"):
            ref = (np.asarray(out[0]), np.asarray(out[1]))
        elif ref is not None and not name.startswith("D"):
            t_o = np.asarray(out[0])
            bad = int((~np.isclose(t_o, ref[0], rtol=1e-5, atol=1e-6)).sum())
            tri_bad = int((np.asarray(out[1]) != ref[1]).sum())
            if bad or tri_bad:
                print(f"  !! {name}: t mismatch {bad}, tri mismatch {tri_bad}")
        t0 = time.perf_counter()
        outs = [jf(cases + (i % 3), qa, qb)[0] for i in range(ITERS)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:14s} {dt*1e6:9.1f} us  {dt/M*1e9:7.3f} ns/row",
              flush=True)


if __name__ == "__main__":
    main()
