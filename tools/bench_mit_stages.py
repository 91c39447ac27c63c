"""Per-stage/per-op timing of the MiT-b3 backbone at bench shapes (B=128,
bf16). The full backbone measures ~96 ms/batch (16% MFU) — this probe finds
where: per-stage block stacks, patch embeds, attention vs FFN split at the
dominant stages."""

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
    print(f"{name}: {best / K * 1000:.2f} ms/batch", flush=True)


def kloop_p(fn):
    """fn(x, params) -> y; carry couples through x."""

    def run(x, p):
        def step(c, _):
            y = fn(c, p)
            return c + 1e-6 * jnp.mean(y).astype(c.dtype), ()

        o, _ = lax.scan(step, x, None, length=K)
        return jnp.sum(o[:1, :1, :1].astype(jnp.float32))

    return run


def main():
    from perspectivefields_tpu.models.mit import Block, MixFFN, OverlapPatchEmbed, SRAttention

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    stages = [
        (80, 64, 3, 1, 8),
        (40, 128, 4, 2, 4),
        (20, 320, 18, 5, 2),
        (10, 512, 3, 8, 1),
    ]
    import flax.linen as nn

    for (h, c, depth, heads, sr) in stages:
        x = jnp.asarray(rng.normal(size=(B, h, h, c)) * 0.5, dt)

        class Stack(nn.Module):
            @nn.compact
            def __call__(self, y):
                for i in range(depth):
                    y = Block(dim=c, num_heads=heads, sr_ratio=sr, dtype=dt,
                              name=f"b{i}")(y, True)
                return y

        m = Stack()
        p = jax.jit(m.init)(jax.random.PRNGKey(0), x[:1])
        timeit(f"stage {h}^2 c{c} x{depth} blocks", kloop_p(lambda xx, pp: m.apply(pp, xx)), x, p)

        attn = SRAttention(c, heads, sr, dtype=dt)
        pa = jax.jit(attn.init)(jax.random.PRNGKey(0), x[:1])
        timeit(f"  attn x1", kloop_p(lambda xx, pp: attn.apply(pp, xx)), x, pa)

        ffn = MixFFN(4 * c, c, dtype=dt)
        pf = jax.jit(ffn.init)(jax.random.PRNGKey(0), x[:1])
        timeit(f"  ffn x1", kloop_p(lambda xx, pp: ffn.apply(pp, xx)), x, pf)

        ln = nn.LayerNorm(epsilon=1e-6, dtype=dt)
        pl_ = jax.jit(ln.init)(jax.random.PRNGKey(0), x[:1])
        timeit(f"  ln x1", kloop_p(lambda xx, pp: ln.apply(pp, xx)), x, pl_)


if __name__ == "__main__":
    main()
