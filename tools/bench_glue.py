"""Probe the 'glue' costs around the heads at bench shapes (B=128, bf16):
the C-minor elementwise chain (gravity normalize, latitude clamp, paramnet
concat+cast) plus a non-DCE'd full-backbone measurement (profile_components
accidentally dead-code-eliminated backbone stages 2-4 by summing only the
stride-4 output — this probe sums all four)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = 128
K = 8
REPS = 3


def timeit(name, fn, *args):
    f = jax.jit(fn)
    float(f(*args))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best / K * 1000:.2f} ms/batch", flush=True)


def kloop(fn):
    def run(x, *rest):
        def step(c, _):
            y = fn(c, *rest)
            return c + 1e-6 * jnp.mean(y).astype(c.dtype), ()

        o, _ = lax.scan(step, x, None, length=K)
        return jnp.sum(o[:1, :1, :1].astype(jnp.float32))

    return run


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    g = jnp.asarray(rng.normal(size=(B, 320, 320, 2)), dt)
    latf = jnp.asarray(rng.uniform(-1.2, 1.2, size=(B, 320, 320, 1)), dt)

    def normalize(x):
        n = jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12).astype(
            x.dtype
        )
        return x / n

    timeit("a normalize (B,320,320,2)", kloop(normalize), g)

    def clamp_st(x):
        return x + jax.lax.stop_gradient(jnp.clip(x, -1.0, 1.0) - x)

    timeit("b straight-through clamp (B,320,320,1)", kloop(clamp_st), latf)

    def concat_cast(x, y):
        return jnp.concatenate([x, y], axis=-1).astype(dt)

    timeit("c concat g+lat -> (B,320,320,3)", kloop(concat_cast), g, latf)

    # d: true full backbone (sums ALL stage outputs, nothing DCE-able)
    from perspectivefields_tpu.config import model_zoo
    from perspectivefields_tpu.models.mit import MixViT

    cfg = model_zoo["Paramnet-360Cities-edina-centered"]["config"]
    bb = MixViT(cfg.backbone, dt, False)
    x320 = jnp.asarray(rng.normal(size=(B, 320, 320, 3)) * 50, dt)
    pbb = jax.jit(bb.init)(jax.random.PRNGKey(0), x320[:1].astype(jnp.float32))

    def bb_all(x, p):
        hs = bb.apply(p, x, True)
        return sum(jnp.sum(h.astype(jnp.float32)) for h in hs)

    def bb_k(x, p):
        def step(c, _):
            y = bb_all(x + c.astype(x.dtype), p)
            return c + 1e-6 * y.astype(jnp.float32), ()

        o, _ = lax.scan(step, jnp.float32(0), None, length=K)
        return o

    f = jax.jit(bb_k)
    float(f(x320, pbb))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(f(x320, pbb))
        best = min(best, time.perf_counter() - t0)
    print(f"d backbone (all stages live): {best / K * 1000:.2f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
