"""Probe: block-diagonal restructure of the fused attention kernel.

The production kernel (kernels/fused_attention.py) loops `for i in range(bb):
for h in range(heads):` inside each program — at stage 3 (bb=4, heads=5) that
is 20 tiny GEMM pairs + 20 small softmaxes issued serially per program. This
variant folds the BATCH loop into the GEMMs: per head, ONE
(bb*n, dh) @ (dh, bb*mpad) cross-item logits GEMM, a block-diagonal -inf mask
(rows attend only to their own item's kv block; exp(-inf)=0 makes the
cross-item terms exact zeros in p@v), one softmax on the full tile, and ONE
(bb*n, bb*mpad) @ (bb*mpad, dh) value GEMM. Trades bb x extra MXU FLOPs
(cheap) for ~bb x fewer op issues (the measured bottleneck: attention is
latency-bound, PERF_NOTES.md round 2c).

Run on TPU: python tools/bench_attn_bd.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

from perspectivefields_tpu.kernels.fused_attention import (
    _xla_reference,
    fused_attention,
)

B = 128
K = 16
REPS = 3
DT = jnp.bfloat16

# (c, heads, n, m) at the zoo resolution; stage1 is XLA-gated in production
STAGES = {
    "stage2": (128, 2, 1600, 100),
    "stage3": (320, 5, 400, 100),
    "stage4": (512, 8, 100, 100),
}


def _kernel_bd(
    x_ref, kv_ref, wq_ref, bq_ref, wkv_ref, bkv_ref, wp_ref, bp_ref, o_ref,
    *, num_heads: int, scale: float, m_true: int,
):
    bb, n, c = x_ref.shape
    mpad = kv_ref.shape[1]
    dh = c // num_heads
    cdt = x_ref.dtype

    x = x_ref[...].reshape(bb * n, c)
    q = (
        lax.dot_general(
            x, wq_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bq_ref[...].astype(jnp.float32)
    ).astype(cdt)
    kvf = kv_ref[...].reshape(bb * mpad, c)
    kv = (
        lax.dot_general(
            kvf, wkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bkv_ref[...].astype(jnp.float32)
    ).astype(cdt)

    # block-diagonal validity: query row r (item r//n) may attend kv col z
    # (item z//mpad) iff same item AND z%mpad is a real (unpadded) kv row
    row = lax.broadcasted_iota(jnp.int32, (bb * n, bb * mpad), 0)
    col = lax.broadcasted_iota(jnp.int32, (bb * n, bb * mpad), 1)
    valid = (row // n == col // mpad) & ((col % mpad) < m_true)
    neg = jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32)

    outs = []
    for h in range(num_heads):
        qh = q[:, h * dh : (h + 1) * dh]
        kh = kv[:, h * dh : (h + 1) * dh]
        vh = kv[:, c + h * dh : c + (h + 1) * dh]
        logits = (
            lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
            + neg
        )
        mx = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - mx)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(cdt)
        outs.append(
            lax.dot_general(
                p, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cdt)
        )
    o = outs[0] if num_heads == 1 else jnp.concatenate(outs, axis=-1)
    o = (
        lax.dot_general(
            o, wp_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bp_ref[...].astype(jnp.float32)
    ).astype(cdt)
    o_ref[...] = o.reshape(bb, n, c)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "bb"))
def fused_attention_bd(
    x, kv_in, wq, bq, wkv, bkv, wproj, bproj, num_heads: int, scale: float,
    bb: int = 4,
):
    b, n, c = x.shape
    m = kv_in.shape[1]
    mpad = -(-m // 8) * 8
    if mpad != m:
        kv_in = jnp.pad(kv_in, ((0, 0), (0, mpad - m), (0, 0)))
    grid = (b // bb,)
    in_specs = [
        pl.BlockSpec((bb, n, c), lambda i: (i, 0, 0)),
        pl.BlockSpec((bb, mpad, c), lambda i: (i, 0, 0)),
        pl.BlockSpec((c, c), lambda i: (0, 0)),
        pl.BlockSpec((c,), lambda i: (0,)),
        pl.BlockSpec((c, 2 * c), lambda i: (0, 0)),
        pl.BlockSpec((2 * c,), lambda i: (0,)),
        pl.BlockSpec((c, c), lambda i: (0, 0)),
        pl.BlockSpec((c,), lambda i: (0,)),
    ]
    return pl.pallas_call(
        functools.partial(
            _kernel_bd, num_heads=num_heads, scale=scale, m_true=m
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, n, c), lambda i: (i, 0, 0)),
    )(x, kv_in, wq, bq, wkv, bkv, wproj, bproj)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    float(f(*args))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best / K * 1000:7.3f} ms/iter", flush=True)
    return best / K * 1000


def kloop(step):
    def run(x, *args):
        def body(c, _):
            y = step(c, *args)
            return c + 1e-6 * jnp.mean(y).astype(c.dtype), ()
        o, _ = lax.scan(body, x, None, length=K)
        return jnp.sum(o.reshape(-1)[:4].astype(jnp.float32))
    return run


def main():
    rng = np.random.default_rng(0)
    float(jax.jit(lambda a: jnp.sum(a))(jnp.ones((8, 8))))

    for name, (c, h, n, m) in STAGES.items():
        scale = (c // h) ** -0.5
        x = jnp.asarray(rng.normal(size=(B, n, c)) * 0.1, DT)
        kv_in = jnp.asarray(rng.normal(size=(B, m, c)) * 0.1, DT)
        wq = jnp.asarray(rng.normal(size=(c, c)) * 0.05, DT)
        bq = jnp.asarray(rng.normal(size=(c,)) * 0.01, DT)
        wkv = jnp.asarray(rng.normal(size=(c, 2 * c)) * 0.05, DT)
        bkv = jnp.asarray(rng.normal(size=(2 * c,)) * 0.01, DT)
        wp = jnp.asarray(rng.normal(size=(c, c)) * 0.05, DT)
        bp = jnp.asarray(rng.normal(size=(c,)) * 0.01, DT)
        args = (kv_in, wq, bq, wkv, bkv, wp, bp)

        y_ref = _xla_reference(x, *args, num_heads=h, scale=scale)
        denom = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)))) or 1.0

        t_cur = timeit(
            f"{name} fused (current)",
            kloop(lambda cx, *a: fused_attention(cx, *a, num_heads=h, scale=scale)),
            x, *args,
        )
        # mask memory scales with bb^2 * n * mpad: cap the candidate list per
        # stage so the f32 mask + logits + exp stay under ~8 MB combined
        for bb in (2, 4, 8):
            mpad = -(-m // 8) * 8
            mask_mb = (bb * n) * (bb * mpad) * 4 / 2**20
            if mask_mb > 3.0:
                continue
            try:
                y_bd = fused_attention_bd(
                    x, *args, num_heads=h, scale=scale, bb=bb
                )
                err = float(
                    jnp.max(
                        jnp.abs(
                            y_bd.astype(jnp.float32) - y_ref.astype(jnp.float32)
                        )
                    )
                )
                t_bd = timeit(
                    f"{name} bd bb={bb} (mask {mask_mb:.1f} MB)",
                    kloop(
                        lambda cx, *a: fused_attention_bd(
                            cx, *a, num_heads=h, scale=scale, bb=bb
                        )
                    ),
                    x, *args,
                )
                print(
                    f"  -> bb={bb}: delta vs current {t_cur - t_bd:+.3f} "
                    f"ms/block, rel err {err / denom:.2e}",
                    flush=True,
                )
            except Exception as e:
                print(f"  bb={bb} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
