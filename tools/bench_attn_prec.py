"""Probe: attention softmax precision + block glue at backbone shapes.

Our SRAttention upcasts the (B, H, N, M) logits to f32 for softmax. The
reference runs the whole model in f32; in bf16 compute mode the f32 softmax
is OUR choice, and torch's own softmax on a bf16 tensor runs in bf16 (with
max subtraction). This probe measures what the upcast costs per stage.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = 128
K = 16
REPS = 3
DT = jnp.bfloat16


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
    def run(x, *ks):
        def body(c, _):
            y = step(c, *ks)
            return c + 1e-6 * jnp.mean(y).astype(c.dtype), ()
        o, _ = lax.scan(body, x, None, length=K)
        return jnp.sum(o.reshape(-1)[:4].astype(jnp.float32))
    return run


# (dim, heads, N, M) per stage at 320^2 input
STAGES = {
    "stage1": (64, 1, 6400, 100),
    "stage2": (128, 2, 1600, 100),
    "stage3": (320, 5, 400, 100),
    "stage4": (512, 8, 100, 100),
}


def main():
    rng = np.random.default_rng(0)
    float(jax.jit(lambda a: jnp.sum(a))(jnp.ones((8, 8))))

    for name, (dim, h, n, m) in STAGES.items():
        dh = dim // h
        q = jnp.asarray(rng.normal(size=(B, n, h, dh)) * 0.1, DT)
        k = jnp.asarray(rng.normal(size=(B, m, h, dh)) * 0.1, DT)
        v = jnp.asarray(rng.normal(size=(B, m, h, dh)) * 0.1, DT)
        scale = dh**-0.5

        def attn_f32(qq, kk, vv):
            a = jnp.einsum("bnhd,bmhd->bhnm", qq, kk) * scale
            a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(qq.dtype)
            return jnp.einsum("bhnm,bmhd->bnhd", a, vv)

        def attn_bf16(qq, kk, vv):
            a = jnp.einsum("bnhd,bmhd->bhnm", qq, kk) * scale
            a = jax.nn.softmax(a, axis=-1)
            return jnp.einsum("bhnm,bmhd->bnhd", a, vv)

        t1 = timeit(f"{name} attn f32 softmax", kloop(lambda c, kk, vv: attn_f32(c, kk, vv)), q, k, v)
        t2 = timeit(f"{name} attn bf16 softmax", kloop(lambda c, kk, vv: attn_bf16(c, kk, vv)), q, k, v)
        print(f"  -> delta {t1 - t2:+.3f} ms", flush=True)

    # LayerNorm stats precision at stage-1 shapes
    x = jnp.asarray(rng.normal(size=(B, 6400, 64)) * 0.1, DT)

    def ln_f32(c):
        m_ = jnp.mean(c.astype(jnp.float32), -1, keepdims=True)
        v_ = jnp.var(c.astype(jnp.float32), -1, keepdims=True)
        return ((c.astype(jnp.float32) - m_) * lax.rsqrt(v_ + 1e-6)).astype(c.dtype)

    def ln_bf16(c):
        m_ = jnp.mean(c, -1, keepdims=True)
        v_ = jnp.mean((c - m_) ** 2, -1, keepdims=True)
        return (c - m_) * lax.rsqrt(v_ + jnp.asarray(1e-6, c.dtype))

    timeit("LN stage1 f32 stats", kloop(ln_f32), x)
    timeit("LN stage1 bf16 stats", kloop(ln_bf16), x)


if __name__ == "__main__":
    main()
