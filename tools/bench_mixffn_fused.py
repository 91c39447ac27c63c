"""Fused MixFFN kernel vs XLA at MiT-b3 stage shapes (TPU, B=128, bf16).

Stage shapes: (80^2, 64, hidden 256) x3, (40^2, 128, 512) x4,
(20^2, 320, 1280) x18, (10^2, 512, 2048) x3. K=16 to amortize the ~30 ms
fixed dispatch overhead (PERF_NOTES.md).
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
    from perspectivefields_tpu.kernels.mixffn import mixffn_fused
    from perspectivefields_tpu.models.mit import MixFFN

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    tot_x = tot_p = 0.0
    for (h, c, depth) in [(80, 64, 3), (40, 128, 4), (20, 320, 18), (10, 512, 3)]:
        x = jnp.asarray(rng.normal(size=(B, h, h, c)) * 0.5, dt)
        ffn = MixFFN(4 * c, c, dtype=dt)
        p = ffn.init(jax.random.PRNGKey(0), x[:1])
        p = jax.tree.map(
            lambda a: jnp.asarray(rng.normal(size=a.shape) * 0.1, a.dtype), p
        )
        q = p["params"]
        wargs = (
            q["fc1"]["kernel"].astype(dt), q["fc1"]["bias"],
            q["dwconv"]["kernel"].astype(dt), q["dwconv"]["bias"],
            q["fc2"]["kernel"].astype(dt), q["fc2"]["bias"],
        )
        ref = ffn.apply(p, x[:2]).astype(jnp.float32)
        got = jax.jit(
            lambda xx, *ww: mixffn_fused(xx, *ww)
        )(x[:2], *wargs).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(ref - got)))
        print(f"stage {h}^2 c{c}: fused vs XLA bf16 max abs err {err:.4f}", flush=True)

        tx = timeit(f"  XLA ffn {h}^2 c{c}", kloop(lambda xx, pp: ffn.apply(pp, xx)), x, p)
        tp = timeit(
            f"  fused ffn {h}^2 c{c}",
            kloop(lambda xx, *ww: mixffn_fused(xx, *ww)),
            x, *wargs,
        )
        tot_x += tx * depth
        tot_p += tp * depth
    print(f"MiT-b3 all FFNs: XLA {tot_x:.1f} ms vs fused {tot_p:.1f} ms")


if __name__ == "__main__":
    main()
