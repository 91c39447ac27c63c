"""Fused ConvNeXt block kernel vs XLA at ParamNet stage shapes (TPU).

ParamNet = ConvNeXt-T at 320^2 input -> stages (80^2,96) (40^2,192)
(20^2,384) (10^2,768) with depths 3/3/9/3.
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

B = 128
K = 4
REPS = 3


def timeit(name, fn, *args):
    f = jax.jit(fn)
    float(f(*args))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    dt = best / K * 1000
    print(f"{name}: {dt:.2f} ms/batch", flush=True)
    return dt


def kloop(fn):
    def run(x, *rest):
        def step(c, _):
            y = fn(c, *rest)
            return c + 1e-6 * jnp.mean(y).astype(c.dtype), ()

        o, _ = lax.scan(step, x, None, length=K)
        return jnp.sum(o[:1, :1, :1].astype(jnp.float32))

    return run


def main():
    from perspectivefields_tpu.kernels.convnext_block import convnext_block_fused
    from perspectivefields_tpu.models.convnext import ConvNeXtBlock

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    total_x, total_p = 0.0, 0.0
    for (h, c, depth) in [(80, 96, 3), (40, 192, 3), (20, 384, 9), (10, 768, 3)]:
        x = jnp.asarray(rng.normal(size=(B, h, h, c)) * 0.5, dt)
        blk = ConvNeXtBlock(c, dtype=dt)
        p = blk.init(jax.random.PRNGKey(0), x[:1])
        p = jax.tree.map(
            lambda a: jnp.asarray(rng.normal(size=a.shape) * 0.1, a.dtype), p
        )
        q = p["params"]
        wargs = (
            q["dwconv"]["kernel"].astype(dt), q["dwconv"]["bias"],
            q["norm"]["scale"], q["norm"]["bias"],
            q["pwconv1"]["kernel"].astype(dt), q["pwconv1"]["bias"],
            q["pwconv2"]["kernel"].astype(dt), q["pwconv2"]["bias"], q["gamma"],
        )

        ref = blk.apply(p, x[:2]).astype(jnp.float32)
        got = jax.jit(convnext_block_fused)(x[:2], *wargs).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(ref - got)))
        print(f"stage {h}^2 c{c}: fused vs XLA bf16 max abs err {err:.4f}")

        tx = timeit(f"  XLA block {h}^2 c{c}", kloop(lambda xx, pp: blk.apply(pp, xx)), x, p)
        tp = timeit(
            f"  fused block {h}^2 c{c}",
            kloop(lambda xx, *ww: convnext_block_fused(xx, *ww)),
            x, *wargs,
        )
        total_x += tx * depth
        total_p += tp * depth
    print(f"ConvNeXt-T all blocks: XLA {total_x:.1f} ms vs fused {total_p:.1f} ms")


if __name__ == "__main__":
    main()
