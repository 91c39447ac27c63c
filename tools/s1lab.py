"""Stage-1 kernel variant lab: isolate where the 2.8 ms goes.

Variants of the lane-packed kernel body, timed at the stage-1 bench shape
(B=128, N=6400, M=100, C=64, bf16, residual fold):

  full       — the real kernel (parity-exact softmax)
  nosoftmax  — logits scaled+cast straight to p (NO max/exp/sum/div):
               isolates the softmax chain's VPU/cross-lane cost
  nomask     — full softmax but no -inf pad mask add
  nopv       — q proj + logits + softmax, but p@v replaced by reusing q
               (isolates the pv GEMMs)
  noloop     — q proj + out proj only (no per-item loop at all)

Each variant is compiled as its own pallas_call; numbers are min-of-4
windows of 30 reps. XLA reference timed for context.

Usage: timeout 2400 python tools/s1lab.py [variant ...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from perspectivefields_tpu.kernels.fused_attention import _xla_reference
from perspectivefields_tpu.kernels.stage1_attention import MPAD, _blockdiag2

B, N, M, C = 128, 6400, 100, 64


def _kernel(*refs, scale, m_true, variant):
    (xp_ref, kv_ref, res_ref, wq2_ref, bq2_ref, wkv_ref, bkv_ref,
     wp2_ref, bp2_ref, o_ref) = refs
    bb, tr, c2 = xp_ref.shape
    c = c2 // 2
    mpad = kv_ref.shape[1]
    cdt = xp_ref.dtype

    xp = xp_ref[...].reshape(bb * tr, c2)
    q = (
        jax.lax.dot_general(
            xp, wq2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bq2_ref[...].astype(jnp.float32)
    ).astype(cdt)
    kvf = kv_ref[...].reshape(bb * mpad, c)
    kv = (
        jax.lax.dot_general(
            kvf, wkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bkv_ref[...].astype(jnp.float32)
    ).astype(cdt)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, mpad), 1)
    neg = jnp.where(col < m_true, 0.0, -jnp.inf).astype(jnp.float32)

    def soft_pv(qh, k, v):
        logits = jax.lax.dot_general(
            qh, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if variant != "nomask":
            logits = logits + neg
        if variant == "nosoftmax":
            p = logits.astype(cdt) * 0.001
        else:
            mx = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - mx)
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(cdt)
        if variant == "nopv":
            return qh + p[:, :c]
        return jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cdt)

    if variant == "noloop":
        o = q
    else:
        outs = []
        for i in range(bb):
            qi = q[i * tr : (i + 1) * tr, :]
            kvi = kv[i * mpad : (i + 1) * mpad, :]
            k, v = kvi[:, :c], kvi[:, c:]
            o1 = soft_pv(qi[:, :c], k, v)
            o2 = soft_pv(qi[:, c:], k, v)
            outs.append(jnp.concatenate([o1, o2], axis=-1))
        o = outs[0] if bb == 1 else jnp.concatenate(outs, axis=0)
    out = (
        jax.lax.dot_general(
            o, wp2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bp2_ref[...].astype(jnp.float32)
    ).astype(cdt)
    o_ref[...] = res_ref[...] + out.reshape(bb, tr, c2)


def build(variant, bb=8, tr=3200):
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.05, jnp.bfloat16)  # noqa
    x, kv_in, res = mk(B, N, C), mk(B, M, C), mk(B, N, C)
    wq, bq = mk(C, C), mk(C)
    wkv, bkv = mk(C, 2 * C), mk(2 * C)
    wp, bp = mk(C, C), mk(C)

    half = N // 2
    scale = C**-0.5

    @jax.jit
    def fn():
        xp = x.reshape(B, half, 2 * C)
        resp = res.reshape(B, half, 2 * C)
        kvp = jnp.pad(kv_in, ((0, 0), (0, MPAD - M), (0, 0)))
        wq2, bq2 = _blockdiag2(wq), jnp.concatenate([bq, bq])
        wp2, bp2 = _blockdiag2(wp), jnp.concatenate([bp, bp])
        grid = (B // bb, half // tr)
        specs = [
            pl.BlockSpec((bb, tr, 2 * C), lambda i, j: (i, j, 0)),
            pl.BlockSpec((bb, MPAD, C), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((bb, tr, 2 * C), lambda i, j: (i, j, 0)),
            pl.BlockSpec((2 * C, 2 * C), lambda i, j: (0, 0)),
            pl.BlockSpec((2 * C,), lambda i, j: (0,)),
            pl.BlockSpec((C, 2 * C), lambda i, j: (0, 0)),
            pl.BlockSpec((2 * C,), lambda i, j: (0,)),
            pl.BlockSpec((2 * C, 2 * C), lambda i, j: (0, 0)),
            pl.BlockSpec((2 * C,), lambda i, j: (0,)),
        ]
        out = pl.pallas_call(
            functools.partial(
                _kernel, scale=scale, m_true=M, variant=variant
            ),
            out_shape=jax.ShapeDtypeStruct((B, half, 2 * C), x.dtype),
            grid=grid,
            in_specs=specs,
            out_specs=pl.BlockSpec((bb, tr, 2 * C), lambda i, j: (i, j, 0)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(xp, kvp, resp, wq2, bq2, wkv, bkv, wp2, bp2)
        return out.reshape(B, N, C)

    xla = jax.jit(
        lambda: res
        + _xla_reference(x, kv_in, wq, bq, wkv, bkv, wp, bp, 1, scale)
    )
    return fn, xla


def timeit(fn, reps=30):
    fn().block_until_ready()
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        outs[-1].block_until_ready()
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def main():
    variants = sys.argv[1:] or ["full", "nosoftmax", "nomask", "nopv", "noloop"]
    shape_env = os.environ.get("S1_TILE")  # e.g. "8:3200" bb:tr
    bb, tr = (8, 3200)
    if shape_env:
        bb, tr = (int(t) for t in shape_env.split(":"))
    xla_done = False
    for v in variants:
        fn, xla = build(v, bb, tr)
        t = timeit(fn)
        print(f"{v:10s} (bb={bb} tr={tr}): {t:.3f} ms", flush=True)
        if not xla_done:
            print(f"{'xla':10s}: {timeit(xla):.3f} ms", flush=True)
            xla_done = True


if __name__ == "__main__":
    main()
