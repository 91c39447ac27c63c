"""Probe: fused attention block kernel vs XLA (projections included), per
MiT stage @B128 bf16, with numeric parity check on device."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from perspectivefields_tpu.kernels.fused_attention import (
    _xla_reference,
    fused_attention,
)

B = 128
K = 16
REPS = 3
DT = jnp.bfloat16

STAGES = {
    "stage1": (64, 1, 6400, 100),
    "stage2": (128, 2, 1600, 100),
    "stage3": (320, 5, 400, 100),
    "stage4": (512, 8, 100, 100),
}


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

        # numeric check
        y_ref = _xla_reference(x, *args, num_heads=h, scale=scale)
        y_fused = fused_attention(x, *args, num_heads=h, scale=scale)
        err = float(
            jnp.max(jnp.abs(y_fused.astype(jnp.float32) - y_ref.astype(jnp.float32)))
        )
        denom = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)))) or 1.0
        print(f"{name}: max abs err {err:.2e} (rel {err/denom:.2e})", flush=True)

        t_x = timeit(
            f"{name} xla  (proj+attn+proj)",
            kloop(lambda cx, *a: _xla_reference(cx, *a, num_heads=h, scale=scale)),
            x, *args,
        )
        t_f = timeit(
            f"{name} fused pallas",
            kloop(lambda cx, *a: fused_attention(cx, *a, num_heads=h, scale=scale)),
            x, *args,
        )
        print(f"  -> delta {t_x - t_f:+.3f} ms/block", flush=True)


if __name__ == "__main__":
    main()
