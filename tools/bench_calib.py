"""Calibrate the fixed per-invocation overhead of the K-loop methodology.

Every timed jit call pays a constant dispatch+readback cost D through the
remote execution relay; measured per-iter time = D/K + t. Runs a null
program and a known workload at several K to solve for D, so every other
bench can subtract it (or use large K).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

REPS = 5


def measure(make_fn, k):
    f = jax.jit(make_fn(k))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(128, 80, 80, 64)), jnp.bfloat16)
    float(f(x))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def null_prog(k):
    def run(x):
        def step(c, _):
            return c + jnp.float32(1e-6), ()

        o, _ = lax.scan(step, jnp.sum(x[:1, :1, :1, :1].astype(jnp.float32)), None, length=k)
        return o

    return run


def work_prog(k):
    w = jnp.asarray(np.random.default_rng(1).normal(size=(64, 64)) * 0.1, jnp.bfloat16)

    def run(x):
        def step(c, _):
            y = jnp.dot(c.reshape(-1, 64), w).reshape(c.shape)
            return c + 1e-3 * y, ()

        o, _ = lax.scan(step, x, None, length=k)
        return jnp.sum(o[:1, :1, :1].astype(jnp.float32))

    return run


def main():
    for name, prog in [("null", null_prog), ("matmul64", work_prog)]:
        ts = {}
        for k in (1, 4, 16, 64):
            ts[k] = measure(prog, k)
            print(f"{name} K={k}: total {ts[k]*1e3:.2f} ms, per-iter {ts[k]/k*1e3:.3f} ms", flush=True)
        # D = (t1 - (t64 - t1)/63 ...) simplest: D ~= t1 - per-iter cost from slope
        slope = (ts[64] - ts[16]) / (64 - 16)
        d = ts[16] - 16 * slope
        print(f"{name}: est fixed overhead D = {d*1e3:.2f} ms, per-iter t = {slope*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
