"""Microbench v3 — correct sync (scalar readback, min of reps).

block_until_ready does NOT sync under the remote relay (PERF_NOTES.md); only
a value readback does. Every benched fn returns a scalar; warmup = one synced
call; then min over reps. A dummy op absorbs process startup first.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = 64
K = 8
REPS = 4


def timeit(name, fn, *args):
    f = jax.jit(fn)
    float(f(*args))  # compile + run + sync
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best / K * 1000:.3f} ms/iter", flush=True)
    return best / K * 1000


def conv(x, k, groups=1):
    return lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def scan_scalar(step):
    """step(carry, *args) -> new carry (array or tuple of arrays)."""

    def run(init_carry, *args):
        o, _ = lax.scan(
            lambda c, _: (step(c, *args), ()), init_carry, None, length=K
        )
        leaf = o[0] if isinstance(o, tuple) else o
        return jnp.sum(leaf[:1, :1, :1].astype(jnp.float32))

    return run


rng = np.random.default_rng(0)
dt = jnp.bfloat16


def mk(*s):
    return jnp.asarray(rng.normal(size=s) * 0.05, dt)


xg = mk(B, 80, 80, 256)
xl = mk(B, 80, 80, 256)
kg = mk(3, 3, 256, 256)
kl = mk(3, 3, 256, 256)
x2 = jnp.concatenate([xg, xl], axis=-1)
k_grouped = jnp.concatenate([kg, kl], axis=-1)
k_dense = mk(3, 3, 512, 512)

# absorb startup
timeit("(warmup dummy)", lambda a: jnp.sum(a * 2.0), xg)

timeit("one 256->256 conv @80^2", scan_scalar(lambda c, k: c + 1e-6 * conv(c, k)), xg, kg)

timeit(
    "two separate 256 convs",
    scan_scalar(
        lambda c, ka, kb: (c[0] + 1e-6 * conv(c[0], ka), c[1] + 1e-6 * conv(c[1], kb))
    ),
    (xg, xl), kg, kl,
)

timeit(
    "grouped 512 g2",
    scan_scalar(lambda c, k: c + 1e-6 * conv(c, k, groups=2)),
    x2, k_grouped,
)
timeit("dense 512", scan_scalar(lambda c, k: c + 1e-6 * conv(c, k)), x2, k_dense)

timeit(
    "slice + two convs + concat",
    scan_scalar(
        lambda c, ka, kb: c
        + 1e-6
        * jnp.concatenate([conv(c[..., :256], ka), conv(c[..., 256:], kb)], -1)
    ),
    x2, kg, kl,
)

c1 = mk(B, 80, 80, 64)
ke_g = mk(3, 3, 64, 256)
ke_l = mk(3, 3, 64, 256)
ke_stack = jnp.concatenate([ke_g, ke_l], axis=-1)


timeit(
    "two embed convs 64->256",
    scan_scalar(
        lambda c, a, b: c + 1e-6 * (conv(c, a)[..., :64] + conv(c, b)[..., :64])
    ),
    c1, ke_g, ke_l,
)
timeit(
    "one embed conv 64->512",
    scan_scalar(lambda c, k: c + 1e-6 * conv(c, k)[..., :64]),
    c1, ke_stack,
)

# tail conv1 at 320^2: 64->32 per head
xtg = mk(B, 320, 320, 64)
xtl = mk(B, 320, 320, 64)
xt2 = jnp.concatenate([xtg, xtl], axis=-1)
kt_g = mk(3, 3, 64, 32)
kt_l = mk(3, 3, 64, 32)
kt_grouped = jnp.concatenate([kt_g, kt_l], axis=-1)


timeit(
    "two tail convs 64->32 @320^2",
    scan_scalar(
        lambda c, ka, kb: (
            c[0].at[..., :32].add(1e-6 * conv(c[0], ka)),
            c[1].at[..., :32].add(1e-6 * conv(c[1], kb)),
        )
    ),
    (xtg, xtl), kt_g, kt_l,
)
timeit(
    "grouped tail 128->64 @320^2",
    scan_scalar(lambda c, k: c.at[..., :64].add(1e-6 * conv(c, k, groups=2))),
    xt2, kt_grouped,
)
timeit(
    "stacked-dense tail 128->64 @320^2",
    scan_scalar(lambda c, k: c.at[..., :64].add(1e-6 * conv(c, k))),
    xt2, mk(3, 3, 128, 64),
)
