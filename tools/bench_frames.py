"""Probe: cost of the exact-border frame pasting in the fused decoder paths.

Each head does 4 plain-path slab convs + 4 .at[].set scatters for conv0 and
the same for the tail. If the scatters materialize full-tensor copies
(~210 MB each at B128) this could be several ms/head.
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
DT = jnp.bfloat16


def timeit(name, fn, *args):
    f = jax.jit(fn)
    float(f(*args))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best / K * 1000:7.3f} ms/iter", flush=True)


def kloop(step):
    def run(x, *ks):
        def body(c, _):
            y = step(c, *ks)
            return c + 1e-6 * jnp.mean(y[:, :1, :1]).astype(c.dtype), ()
        o, _ = lax.scan(body, x, None, length=K)
        return jnp.sum(o[:1, :1, :1].astype(jnp.float32))
    return run


def main():
    from perspectivefields_tpu.models.heads import SegFormerDecoder
    from perspectivefields_tpu.ops.image import resize_bilinear

    rng = np.random.default_rng(0)
    float(jax.jit(lambda a: jnp.sum(a))(jnp.ones((8, 8))))

    A = jnp.asarray(rng.normal(size=(B, 80, 80, 256)) * 0.1, DT)
    kph = jnp.asarray(rng.normal(size=(3, 3, 256, 256)) * 0.02, DT)
    kc1 = jnp.asarray(rng.normal(size=(3, 3, 256, 64)) * 0.02, DT)

    def conv(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def d2s(z):
        b, h, w, c = z.shape
        cc = c // 4
        return (
            z.reshape(b, h, w, 2, 2, cc)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, 2 * h, 2 * w, cc)
        )

    def plain_slab(a, k):
        h, w = a.shape[-3], a.shape[-2]
        up = resize_bilinear(a, 2 * h, 2 * w, "torch_bilinear")
        return conv(up, k)

    def nof(a, kp, kc):
        return d2s(conv(a, kp))

    def withf(a, kp, kc):
        y = d2s(conv(a, kp))
        top = plain_slab(a[:, :3], kc)[:, :2]
        bot = plain_slab(a[:, -3:], kc)[:, -2:]
        left = plain_slab(a[:, :, :3], kc)[:, :, :2]
        right = plain_slab(a[:, :, -3:], kc)[:, :, -2:]
        y = y.at[:, :2].set(top)
        y = y.at[:, -2:].set(bot)
        y = y.at[:, :, :2].set(left)
        y = y.at[:, :, -2:].set(right)
        return y

    timeit("conv0 path WITHOUT frames", kloop(nof), A, kph, kc1)
    timeit("conv0 path WITH frames", kloop(withf), A, kph, kc1)


if __name__ == "__main__":
    main()


def variants():
    from perspectivefields_tpu.ops.image import resize_bilinear

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(B, 80, 80, 256)) * 0.1, DT)
    kph = jnp.asarray(rng.normal(size=(3, 3, 256, 256)) * 0.02, DT)
    kc1 = jnp.asarray(rng.normal(size=(3, 3, 256, 64)) * 0.02, DT)

    def conv(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def d2s(z):
        b, h, w, c = z.shape
        cc = c // 4
        return (
            z.reshape(b, h, w, 2, 2, cc)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, 2 * h, 2 * w, cc)
        )

    def plain_slab(a, k):
        h, w = a.shape[-3], a.shape[-2]
        up = resize_bilinear(a, 2 * h, 2 * w, "torch_bilinear")
        return conv(up, k)

    def scatter_only(a, kp, kc):
        y = d2s(conv(a, kp))
        z = y[:, :2, :2, :]  # cheap stand-in "frames"
        y = y.at[:, :2].set(jnp.broadcast_to(z[:, :, :1], (B, 2, 160, 64)))
        y = y.at[:, -2:].set(jnp.broadcast_to(z[:, :, :1], (B, 2, 160, 64)))
        y = y.at[:, :, :2].set(jnp.broadcast_to(z[:, :1], (B, 160, 2, 64)))
        y = y.at[:, :, -2:].set(jnp.broadcast_to(z[:, :1], (B, 160, 2, 64)))
        return y

    def slabs_only(a, kp, kc):
        y = d2s(conv(a, kp))
        top = plain_slab(a[:, :3], kc)[:, :2]
        bot = plain_slab(a[:, -3:], kc)[:, -2:]
        left = plain_slab(a[:, :, :3], kc)[:, :, :2]
        right = plain_slab(a[:, :, -3:], kc)[:, :, -2:]
        return y + 1e-6 * (
            jnp.sum(top) + jnp.sum(bot) + jnp.sum(left) + jnp.sum(right)
        ).astype(y.dtype)

    def concat_assembly(a, kp, kc):
        y = d2s(conv(a, kp))
        top = plain_slab(a[:, :3], kc)[:, :2]
        bot = plain_slab(a[:, -3:], kc)[:, -2:]
        left = plain_slab(a[:, :, :3], kc)[:, :, :2]
        right = plain_slab(a[:, :, -3:], kc)[:, :, -2:]
        mid = jnp.concatenate([top, y[:, 2:-2], bot], axis=1)
        return jnp.concatenate(
            [left[:, :, :2], mid[:, :, 2:-2], right[:, :, -2:]], axis=2
        )

    timeit("scatter-only (cheap frames)", kloop(scatter_only), A, kph, kc1)
    timeit("slabs-only (no scatter)", kloop(slabs_only), A, kph, kc1)
    timeit("concat assembly", kloop(concat_assembly), A, kph, kc1)


if __name__ == "__main__":
    variants()
