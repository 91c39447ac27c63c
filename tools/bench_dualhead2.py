"""Follow-up microbench: why were paired convs 60x slower than stacked?

Separates the variables: two convs on SEPARATE inputs (no slice), with/without
output concat, vs grouped/dense stacked. Also checks f32 scan-carry effects.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = 64
K = 8


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    float(f(*args))
    dt = (time.perf_counter() - t0) / K * 1000
    print(f"{name}: {dt:.3f} ms/iter", flush=True)
    return dt


def conv(x, k, groups=1):
    return lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


rng = np.random.default_rng(0)
dt = jnp.bfloat16


def mk(*s):
    return jnp.asarray(rng.normal(size=s) * 0.05, dt)


# RCU shape: 80x80, 256ch per head
xg = mk(B, 80, 80, 256)
xl = mk(B, 80, 80, 256)
kg = mk(3, 3, 256, 256)
kl = mk(3, 3, 256, 256)
x2 = jnp.concatenate([xg, xl], axis=-1)
k_grouped = jnp.concatenate([kg, kl], axis=-1)


def a2_two_sep(xg, xl, kg, kl):
    """two convs, separate inputs AND separate carries (no slice/concat)."""

    def step(c, _):
        cg, cl = c
        yg = conv(cg, kg)
        yl = conv(cl, kl)
        return (cg + 1e-6 * yg, cl + 1e-6 * yl), ()

    (og, ol), _ = lax.scan(step, (xg, xl), None, length=K)
    return jnp.sum(og[:1, :1, :1].astype(jnp.float32)) + jnp.sum(
        ol[:1, :1, :1].astype(jnp.float32)
    )


def a3_one_conv(xg, kg):
    """single 256->256 conv baseline."""

    def step(c, _):
        return c + 1e-6 * conv(c, kg), ()

    o, _ = lax.scan(step, xg, None, length=K)
    return jnp.sum(o[:1, :1, :1].astype(jnp.float32))


def b_grouped(x2, k_grouped):
    def step(c, _):
        return c + 1e-6 * conv(c, k_grouped, groups=2), ()

    o, _ = lax.scan(step, x2, None, length=K)
    return jnp.sum(o[:1, :1, :1].astype(jnp.float32))


timeit("one 256->256 conv @80^2", a3_one_conv, xg, kg)
timeit("two separate convs (no slice/concat)", a2_two_sep, xg, xl, kg, kl)
timeit("grouped 512->512 g2", b_grouped, x2, k_grouped)

# the pathological case from v1, reproduced smaller: slice + concat inside scan
def a1_slice_concat(x2, kg, kl):
    def step(c, _):
        y = jnp.concatenate([conv(c[..., :256], kg), conv(c[..., 256:], kl)], -1)
        return c + 1e-6 * y, ()

    o, _ = lax.scan(step, x2, None, length=K)
    return jnp.sum(o[:1, :1, :1].astype(jnp.float32))


timeit("slice+two convs+concat (v1 'A')", a1_slice_concat, x2, kg, kl)

# embed: shared input, two convs vs one stacked — no slicing anywhere
c1 = mk(B, 80, 80, 64)
ke_g = mk(3, 3, 64, 256)
ke_l = mk(3, 3, 64, 256)
ke_stack = jnp.concatenate([ke_g, ke_l], axis=-1)


def d1_two_embed(c1, ke_g, ke_l):
    def step(c, _):
        yg = conv(c, ke_g)
        yl = conv(c, ke_l)
        return c + 1e-6 * (yg[..., :64] + yl[..., :64]), ()

    o, _ = lax.scan(step, c1, None, length=K)
    return jnp.sum(o[:1, :1, :1].astype(jnp.float32))


def d2_one_embed(c1, ke):
    def step(c, _):
        y = conv(c, ke)
        return c + 1e-6 * y[..., :64], ()

    o, _ = lax.scan(step, c1, None, length=K)
    return jnp.sum(o[:1, :1, :1].astype(jnp.float32))


timeit("two embed convs 64->256 (shared in, no concat)", d1_two_embed, c1, ke_g, ke_l)
timeit("one embed conv 64->512", d2_one_embed, c1, ke_stack)
