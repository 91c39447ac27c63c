"""What MFU can the v5e MXU actually reach at the decode-head conv shapes?

Pure-XLA probes: the conv-equivalent GEMMs at various (M, K, N), to separate
"Mosaic kernel overhead" from "this matmul shape is just slow on this chip".
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

K_ITERS = 8
REPS = 4


def timeit(name, fn, *args, flops=None):
    f = jax.jit(fn)
    float(f(*args))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    dt = best / K_ITERS
    msg = f"{name}: {dt * 1e3:.2f} ms"
    if flops:
        msg += f"  ({flops/dt/1e12:.1f} TF/s, {flops/dt/1e12/197*100:.0f}% MFU)"
    print(msg, flush=True)


def kloop(fn):
    def run(x, *rest):
        def step(c, _):
            y = fn(c, *rest)
            return c + 1e-6 * jnp.mean(y).astype(c.dtype), ()

        o, _ = lax.scan(step, x, None, length=K_ITERS)
        return jnp.sum(o[:1, :1])

    return run


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    shapes = [
        ("gemm M=819k K=256 N=256 (conv as 9 shifted dots)", 819200 // 4, 256, 256, 9 // 9),
        ("gemm M=102k K=2304 N=256 (conv as one im2col dot)", 102400, 2304, 256, 1),
        ("gemm M=102k K=2304 N=512 (two heads stacked N)", 102400, 2304, 512, 1),
        ("gemm M=819k K=256 N=512", 204800, 256, 512, 1),
        ("gemm M=102k K=1024 N=256", 102400, 1024, 256, 1),
    ]
    for name, m, k, n, _ in shapes:
        a = jnp.asarray(rng.normal(size=(m, k)) * 0.1, dt)
        b = jnp.asarray(rng.normal(size=(k, n)) * 0.1, dt)
        fl = 2 * m * k * n * K_ITERS / K_ITERS
        timeit(name, kloop(lambda aa, bb: jnp.dot(aa, bb)), a, b, flops=fl)

    # conv reference points
    for (B, H, C, CO) in [(128, 80, 256, 256), (128, 80, 256, 512), (128, 40, 512, 512)]:
        x = jnp.asarray(rng.normal(size=(B, H, H, C)) * 0.1, dt)
        kk = jnp.asarray(rng.normal(size=(3, 3, C, CO)) * 0.02, dt)

        def conv(xx, w):
            return lax.conv_general_dilated(
                xx, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        fl = 2 * 9 * B * H * H * C * CO
        timeit(f"conv3x3 B{B} {H}^2 {C}->{CO}", kloop(conv), x, kk, flops=fl)


if __name__ == "__main__":
    main()
