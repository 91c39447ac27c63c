"""ParamNet (ConvNeXt-T @320^2) hotspot profile at bench shapes (B=128 bf16).

Times each op class at stage-0 shapes (80^2x96 — the dominant stage) plus a
full block and the full trunk, to decide where the 75 ms/batch goes.
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
K = 8
REPS = 4


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


def scan_scalar(step):
    def run(init_carry, *args):
        o, _ = lax.scan(lambda c, _: (step(c, *args), ()), init_carry, None, length=K)
        return jnp.sum(o[:1, :1, :1].astype(jnp.float32))

    return run


rng = np.random.default_rng(0)
dt = jnp.bfloat16


def mk(*s):
    return jnp.asarray(rng.normal(size=s) * 0.05, dt)


x0 = mk(B, 80, 80, 96)
kdw = mk(7, 7, 1, 96)
k1 = mk(96, 384)
k2 = mk(384, 96)

timeit("(dummy)", lambda a: jnp.sum(a * 2.0), x0)

timeit(
    "dw 7x7 @80^2x96",
    scan_scalar(
        lambda c, k: c
        + 1e-6
        * lax.conv_general_dilated(
            c, k, (1, 1), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=96,
        )
    ),
    x0, kdw,
)


def ln(c):
    m = jnp.mean(c.astype(jnp.float32), -1, keepdims=True)
    v = jnp.var(c.astype(jnp.float32), -1, keepdims=True)
    return ((c - m) * jax.lax.rsqrt(v + 1e-6)).astype(c.dtype)


timeit("LN @80^2x96", scan_scalar(lambda c: c + 1e-6 * ln(c)), x0)

timeit(
    "mlp 96->384->96 gelu exact",
    scan_scalar(
        lambda c, a, b: c
        + 1e-6 * jnp.dot(jax.nn.gelu(jnp.dot(c, a), approximate=False), b)
    ),
    x0, k1, k2,
)
timeit(
    "mlp 96->384->96 gelu tanh",
    scan_scalar(
        lambda c, a, b: c
        + 1e-6 * jnp.dot(jax.nn.gelu(jnp.dot(c, a), approximate=True), b)
    ),
    x0, k1, k2,
)

# full block chain (dw->LN->mlp->gamma->res)
gamma = mk(96)


def block(c, kd, a, b, g):
    y = lax.conv_general_dilated(
        c, kd, (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=96,
    )
    y = ln(y)
    y = jnp.dot(jax.nn.gelu(jnp.dot(y, a), approximate=False), b)
    return c + y * g


timeit("full block @80^2x96", scan_scalar(block), x0, kdw, k1, k2, gamma)

# full trunk
from perspectivefields_tpu.models.convnext import ConvNeXt  # noqa: E402

net = ConvNeXt(num_classes=5, dtype=dt)
field = mk(B, 320, 320, 3)
params = net.init(jax.random.PRNGKey(0), field[:1])


def trunk(c, p):
    def stepf(carry, _):
        y = net.apply(p, carry)
        return carry + 1e-6 * jnp.mean(y).astype(carry.dtype), ()

    o, _ = lax.scan(stepf, c, None, length=K)
    return jnp.sum(o[:1, :1, :1].astype(jnp.float32))


timeit("full ConvNeXt-T trunk @320^2", trunk, field, params)
