"""TPU microbench: is a fused dual-head decoder faster than two passes?

Measures, at real model shapes (B=64, bf16):
  A. two separate 3x3 convs 256->256 at 80x80 (the fusion1 RCU shape)
  B. one grouped conv 512->512, feature_group_count=2 (same math, one op)
  C. one dense conv 512->512 (2x FLOPs, full MXU N)
  D. two embed convs Cin->256 vs one stacked Cin->512 (shared input)
  E. tail conv1 64->32 at 320^2, two heads vs grouped 128->64

K-loop-inside-jit timing (see PERF_NOTES.md methodology).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = 64
K_ITERS = 8


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out.astype(jnp.float32)[..., :1, :1, :1]))
    dt = (time.perf_counter() - t0) / K_ITERS * 1000
    print(f"{name}: {dt:.3f} ms/iter")
    return dt


def kloop(body):
    """Run body K_ITERS times with a data dependency."""

    def run(x, *weights):
        def step(carry, _):
            y = body(carry, *weights)
            # feed part of y back so every iteration depends on the previous
            c = min(carry.shape[-1], y.shape[-1])
            upd = carry.at[..., :c].add(1e-6 * y[..., :c].astype(carry.dtype))
            return upd, ()

        out, _ = lax.scan(step, x, None, length=K_ITERS)
        return out

    return run


def conv(x, k, groups=1):
    return lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def mk(*s):
        return jnp.asarray(rng.normal(size=s) * 0.05, dt)

    # --- A/B/C: RCU conv shape at 80x80 ---
    x2 = mk(B, 80, 80, 512)  # two heads' activations channel-stacked
    kg = mk(3, 3, 256, 256)
    kl = mk(3, 3, 256, 256)
    k_grouped = jnp.concatenate([kg, kl], axis=-1)  # HWI(O*2) for groups=2
    k_dense = mk(3, 3, 512, 512)

    def two_convs(x, kg, kl):
        a = conv(x[..., :256], kg)
        b = conv(x[..., 256:], kl)
        return jnp.concatenate([a, b], axis=-1)

    def grouped(x, k):
        return conv(x, k, groups=2)

    def dense(x, k):
        return conv(x, k)

    timeit("A two 256->256 convs @80^2", kloop(two_convs), x2, kg, kl)
    timeit("B grouped 512->512 g2 @80^2", kloop(grouped), x2, k_grouped)
    timeit("C dense 512->512 @80^2", kloop(dense), x2, k_dense)

    # --- D: embed conv, shared input ---
    c1 = mk(B, 80, 80, 64)
    ke_g = mk(3, 3, 64, 256)
    ke_l = mk(3, 3, 64, 256)
    ke_stack = jnp.concatenate([ke_g, ke_l], axis=-1)

    def two_embed(x, a, b):
        return jnp.concatenate([conv(x, a), conv(x, b)], axis=-1)

    def one_embed(x, k):
        return conv(x, k)

    timeit("D1 two embed 64->256 @80^2", kloop(two_embed), c1, ke_g, ke_l)
    timeit("D2 one embed 64->512 @80^2", kloop(one_embed), c1, ke_stack)

    # --- E: tail conv1 at 320^2 ---
    xt = mk(B, 320, 320, 128)
    kt_g = mk(3, 3, 64, 32)
    kt_l = mk(3, 3, 64, 32)
    kt_grouped = jnp.concatenate([kt_g, kt_l], axis=-1)

    def two_tail(x, a, b):
        return jnp.concatenate([conv(x[..., :64], a), conv(x[..., 64:], b)], axis=-1)

    def grouped_tail(x, k):
        return conv(x, k, groups=2)

    timeit("E1 two tail 64->32 @320^2", kloop(two_tail), xt, kt_g, kt_l)
    timeit("E2 grouped tail 128->64 g2 @320^2", kloop(grouped_tail), xt, kt_grouped)


if __name__ == "__main__":
    main()
