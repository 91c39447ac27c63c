"""Probe: bf16-internal fused attention + larger batch tiles (bb=8/16).

The production kernel (kernels/fused_attention.py) keeps q/kv/proj GEMM
outputs in f32 before casting — more precise than the XLA path it replaces
(nn.Dense at dtype=bf16 rounds each output once), and the f32 transients are
what cap the batch tile at bb=4 under the 13 MB VMEM budget. This variant
rounds q/kv/attn-out/proj to the compute dtype at the GEMM output (exactly
the XLA path's numerics; logits + softmax stay f32), shrinking per-bb VMEM
~25% so bb=8 fits — halving the program count amortizes per-program fixed
cost (DMA setup + issue), the suspected residual overhead at stage 3's 32
programs x ~20 us.

Run on TPU: python tools/bench_attn_bf16.py

RESULT (2026-08-19): REFUTED BY CONSTRUCTION — Mosaic rejects bf16 matmul
accumulators ('tpu.matmul op Expected matmul acc to be 32-bit') at every
stage/bb, so the f32 GEMM transients are mandatory, the validated per-bb
VMEM accounting stands, and bb=8 cannot fit the 16 MB scoped limit at
stage-3 shapes. Splitting tokens (tn) to free VMEM keeps the program count
invariant (grid = (b/bb) * (n/tn) is pinned by tokens-per-program), so
per-program fixed cost cannot be amortized further. CLOSED.
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

STAGES = {
    "stage2": (128, 2, 1600, 100),
    "stage3": (320, 5, 400, 100),
    "stage4": (512, 8, 100, 100),
}


def _kernel_bf16(
    x_ref, kv_ref, wq_ref, bq_ref, wkv_ref, bkv_ref, wp_ref, bp_ref, o_ref,
    *, num_heads: int, scale: float, m_true: int,
):
    bb, n, c = x_ref.shape
    mpad = kv_ref.shape[1]
    dh = c // num_heads
    cdt = x_ref.dtype

    x = x_ref[...].reshape(bb * n, c)
    # nn.Dense(dtype=bf16) numerics: GEMM output rounded to cdt, bias in cdt
    q = (
        lax.dot_general(
            x, wq_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=cdt,
        )
        + bq_ref[...].astype(cdt)
    )
    kvf = kv_ref[...].reshape(bb * mpad, c)
    kv = (
        lax.dot_general(
            kvf, wkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=cdt,
        )
        + bkv_ref[...].astype(cdt)
    )

    col = lax.broadcasted_iota(jnp.int32, (1, mpad), 1)
    neg = jnp.where(col < m_true, 0.0, -jnp.inf).astype(jnp.float32)

    outs = []
    for i in range(bb):
        qi_all = q[i * n : (i + 1) * n, :]
        kvi = kv[i * mpad : (i + 1) * mpad, :]
        heads = []
        for h in range(num_heads):
            qi = qi_all[:, h * dh : (h + 1) * dh]
            ki = kvi[:, h * dh : (h + 1) * dh]
            vi = kvi[:, c + h * dh : c + (h + 1) * dh]
            logits = (
                lax.dot_general(
                    qi, ki, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
                + neg
            )
            mx = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - mx)
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(cdt)
            heads.append(
                lax.dot_general(
                    p, vi, (((1,), (0,)), ((), ())),
                    preferred_element_type=cdt,
                )
            )
        outs.append(
            heads[0] if num_heads == 1 else jnp.concatenate(heads, axis=-1)
        )
    o = outs[0] if bb == 1 else jnp.concatenate(outs, axis=0)
    o = (
        lax.dot_general(
            o, wp_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=cdt,
        )
        + bp_ref[...].astype(cdt)
    )
    o_ref[...] = o.reshape(bb, n, c)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "bb"))
def fused_attention_bf16(
    x, kv_in, wq, bq, wkv, bkv, wproj, bproj, num_heads: int, scale: float,
    bb: int = 8,
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
            _kernel_bf16, num_heads=num_heads, scale=scale, m_true=m
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
            f"{name} fused (current, bb auto)",
            kloop(lambda cx, *a: fused_attention(cx, *a, num_heads=h, scale=scale)),
            x, *args,
        )
        for bb in (4, 8, 16):
            try:
                y_v = fused_attention_bf16(
                    x, *args, num_heads=h, scale=scale, bb=bb
                )
                err = float(
                    jnp.max(
                        jnp.abs(
                            y_v.astype(jnp.float32) - y_ref.astype(jnp.float32)
                        )
                    )
                )
                t_v = timeit(
                    f"{name} bf16-internal bb={bb}",
                    kloop(
                        lambda cx, *a: fused_attention_bf16(
                            cx, *a, num_heads=h, scale=scale, bb=bb
                        )
                    ),
                    x, *args,
                )
                print(
                    f"  -> bb={bb}: delta vs current {t_cur - t_v:+.3f} "
                    f"ms/block, rel err vs xla {err / denom:.2e}",
                    flush=True,
                )
            except Exception as e:
                msg = str(e).splitlines()[0][:120] if str(e) else ""
                print(f"  bb={bb} FAILED: {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
