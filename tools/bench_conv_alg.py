"""Probe: can ANY formulation of conv3x3 256->256 @80^2 beat XLA's 40% MFU?

This shape (fusion1's four RCU convs per head) is now the largest single
cost in each decode head after the conv0/tail phase compositions. Variants:

  A. lax.conv NHWC (the baseline the model uses)
  B. lax.conv NCHW in/out (layout assignment may differ)
  C. 9 shifted GEMMs accumulated (M=B*H*W, K=256, N=256 each)
  D. row-im2col: reshape to (B*H, W, 3*256) GEMM per 3-row band via
     concatenated shifts along W only, K=768 (halo in W, conv in H via adds)
  E. f32 accumulation hint (preferred_element_type)
  F. 128-wide N split (two convs N=128, concat) — sanity lower bound
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
GF = B * 80 * 80 * 9 * 256 * 256 * 2 / 1e9


def timeit(name, fn, *args):
    f = jax.jit(fn)
    float(f(*args))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    ms = best / K * 1000
    mfu = GF / ms / 197.0 * 1000 / 1e3
    print(f"{name}: {ms:7.3f} ms/iter  ({GF/ms:6.1f} GF/ms, {mfu*100:4.1f}% MFU)", flush=True)
    return ms


def kloop(step):
    def run(x, *ks):
        def body(c, _):
            return c + 1e-6 * step(c, *ks), ()
        o, _ = lax.scan(body, x, None, length=K)
        return jnp.sum(o[:1, :1, :1].astype(jnp.float32))
    return run


def main():
    rng = np.random.default_rng(0)
    float(jax.jit(lambda a: jnp.sum(a))(jnp.ones((8, 8))))

    x = jnp.asarray(rng.normal(size=(B, 80, 80, 256)) * 0.1, DT)
    k = jnp.asarray(rng.normal(size=(3, 3, 256, 256)) * 0.02, DT)

    def conv_nhwc(c, kk):
        return lax.conv_general_dilated(
            c, kk, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    timeit("A nhwc lax.conv", kloop(conv_nhwc), x, k)

    xc = jnp.moveaxis(x, -1, 1)  # NCHW
    kc = jnp.transpose(k, (3, 2, 0, 1))  # OIHW

    def conv_nchw(c, kk):
        return lax.conv_general_dilated(
            c, kk, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    def kloop_c(step):
        def run(cx, *ks):
            def body(c, _):
                return c + 1e-6 * step(c, *ks), ()
            o, _ = lax.scan(body, cx, None, length=K)
            return jnp.sum(o[:1, :1, :1].astype(jnp.float32))
        return run

    timeit("B nchw lax.conv", kloop_c(conv_nchw), xc, kc)

    def conv_9gemm(c, kk):
        # pad once, accumulate 9 shifted matmuls
        cp = jnp.pad(c, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for dp in range(3):
            for dq in range(3):
                part = jnp.einsum(
                    "bhwi,io->bhwo", cp[:, dp : dp + 80, dq : dq + 80, :], kk[dp, dq]
                )
                acc = part if acc is None else acc + part
        return acc

    timeit("C 9 shifted GEMMs", kloop(conv_9gemm), x, k)

    def conv_wband(c, kk):
        # conv in W via K=768 GEMM on W-shifted concat, conv in H via 3 adds
        cp = jnp.pad(c, ((0, 0), (1, 1), (1, 1), (0, 0)))
        rows = []
        for dp in range(3):
            band = jnp.concatenate(
                [cp[:, dp : dp + 80, dq : dq + 80, :] for dq in range(3)], axis=-1
            )
            kband = kk[dp].reshape(3 * 256, 256)
            rows.append(jnp.einsum("bhwi,io->bhwo", band, kband))
        return rows[0] + rows[1] + rows[2]

    timeit("D W-band K=768 GEMMs", kloop(conv_wband), x, k)

    def conv_f32acc(c, kk):
        return lax.conv_general_dilated(
            c, kk, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(DT)

    timeit("E f32-accum conv", kloop(conv_f32acc), x, k)

    # two convs back to back (the RCU pattern) — measures overlap headroom
    k2 = jnp.asarray(rng.normal(size=(3, 3, 256, 256)) * 0.02, DT)

    def rcu_pair(c, ka, kb):
        return conv_nhwc(jax.nn.relu(conv_nhwc(c, ka)), kb)

    def timeit2(name, fn, *args):
        f = jax.jit(kloop(fn))
        float(f(*args))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best / K * 1000:7.3f} ms/iter (2 convs)", flush=True)

    timeit2("F rcu pair conv-relu-conv", rcu_pair, x, k, k2)


if __name__ == "__main__":
    main()
