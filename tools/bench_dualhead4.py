"""Microbench v4 — all outputs LIVE (mean-coupled carry), min of reps.

v3's tuple-carry variants let XLA dead-code-eliminate one conv chain
(only o[0] was read back). Here every benched op's full output feeds the
carry through a mean, so nothing is eliminated.

Shapes: B=64 bf16, the real decode-head shapes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = 64
K = 8
REPS = 5


def timeit(name, fn, *args):
    f = jax.jit(fn)
    float(f(*args))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best / K * 1000:.3f} ms/iter", flush=True)
    return best / K * 1000


def conv(x, k, groups=1, strides=(1, 1), pad=1):
    return lax.conv_general_dilated(
        x, k, strides, [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def bench(step):
    """step(carry_tuple_or_array, *args) -> output(s); all outputs coupled."""

    def run(init, *args):
        def body(c, _):
            ys = step(c, *args)
            if not isinstance(ys, tuple):
                ys = (ys,)
            dep = sum(jnp.mean(y).astype(jnp.float32) for y in ys)
            if isinstance(c, tuple):
                return tuple(ci + 1e-6 * dep.astype(ci.dtype) for ci in c), ()
            return c + 1e-6 * dep.astype(c.dtype), ()

        o, _ = lax.scan(body, init, None, length=K)
        leaf = o[0] if isinstance(o, tuple) else o
        return jnp.sum(leaf[:1, :1, :1].astype(jnp.float32))

    return run


rng = np.random.default_rng(0)
dt = jnp.bfloat16


def mk(*s):
    return jnp.asarray(rng.normal(size=s) * 0.05, dt)


xg = mk(B, 80, 80, 256)
xl = mk(B, 80, 80, 256)
x2 = jnp.concatenate([xg, xl], axis=-1)
kg = mk(3, 3, 256, 256)
kl = mk(3, 3, 256, 256)

timeit("(dummy)", lambda a: jnp.sum(a * 2.0), xg)

if "--rcu" in sys.argv:
    timeit("RCU: one 256 conv", bench(lambda c, k: conv(c, k)), xg, kg)
    timeit(
        "RCU: two sep convs (live)",
        bench(lambda c, ka, kb: (conv(c[0], ka), conv(c[1], kb))),
        (xg, xl), kg, kl,
    )
    timeit(
        "RCU: stacked slice+concat",
        bench(
            lambda c, ka, kb: jnp.concatenate(
                [conv(c[..., :256], ka), conv(c[..., 256:], kb)], -1
            )
        ),
        x2, kg, kl,
    )
    timeit("RCU: dense 512 (2x flops)", bench(lambda c, k: conv(c, k)), x2, mk(3, 3, 512, 512))

# tail per head: 160^2x64 --bilinear 2x--> 320^2x64 --conv3x3--> 320^2x32
xt = mk(B, 160, 160, 64)
kt = mk(3, 3, 64, 32)
# bilinear 2x as two matmuls (resize_bilinear does this; inline simple version)
from perspectivefields_tpu.ops.image import resize_bilinear  # noqa: E402


def tail_current(c, k):
    up = resize_bilinear(c, 320, 320, "torch_bilinear")
    return conv(up, k)


timeit("tail: upsample+conv1 (current)", bench(tail_current), xt, kt)

# phase-packed: conv 4x4 stride1 at 160^2 -> 128 out (= 4 phases x 32)
kp = mk(4, 4, 64, 128)


def tail_phase(c, k):
    y = conv(c, k, pad=2)[:, :160, :160, :]  # same spatial count
    return y


timeit("tail: phase-packed 4x4 64->128 @160^2", bench(tail_phase), xt, kp)

# dual-head tail stacked: 128-in, slice+concat
xt2 = jnp.concatenate([xt, mk(B, 160, 160, 64)], -1)
kp2 = mk(4, 4, 64, 128)


def tail_phase_dual(c, ka, kb):
    ya = conv(c[..., :64], ka, pad=2)[:, :160, :160, :]
    yb = conv(c[..., 64:], kb, pad=2)[:, :160, :160, :]
    return jnp.concatenate([ya, yb], -1)


timeit("tail: dual phase-packed slice+concat", bench(tail_phase_dual), xt2, kp, kp2)

# conv0 per head: conv(_c1 256->64) + conv(ll 64->64) summed (current split)
kc0a = mk(3, 3, 256, 64)
kc0b = mk(3, 3, 64, 64)
ll = mk(B, 160, 160, 64)


def conv0_split(c, ka, kb, ll_):
    return conv(c, ka) + conv(ll_, kb)


timeit("conv0: split (current, per head)", bench(conv0_split), mk(B, 160, 160, 256), kc0a, kc0b, ll)


def conv0_dual(c, ka, kb, kc, ll_):
    # stacked heads: conv(512 -> 128) via two slices + shared ll conv 64->128
    y = jnp.concatenate(
        [conv(c[..., :256], ka), conv(c[..., 256:], kb)], -1
    ) + conv(ll_, kc)
    return y


timeit(
    "conv0: dual stacked slice+concat + shared ll",
    bench(conv0_dual),
    jnp.concatenate([mk(B, 160, 160, 256), mk(B, 160, 160, 256)], -1),
    kc0a, kc0a, mk(3, 3, 64, 128), ll,
)
