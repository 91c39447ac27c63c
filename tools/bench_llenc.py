"""Probe: why is the LowLevelEncoder conv (7x7/s2, Cin=3) ~70 ms/batch?

Tiny-Cin convs on channels-minor layouts are a known TPU trap. Variants:
  A. current: conv 7x7/s2 on (B, 320, 320, 3)
  B. channel-padded: same conv with input/kernel zero-padded to Cin=8 / 32
  C. space-to-depth: (B, 160, 160, 12) + 4x4 conv, asymmetric pad (2, 1) —
     exactly the same linear map, kernel rearranged at trace time
  D. backbone stem for comparison (7x7/s4 -> 80^2): same trap?
Also probes the fused preprocess (resize 640->320 + normalize as two
matmuls over (w*c)-flattened lanes with a kron weight matrix).
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


def kloop(fn, post=jnp.sum):
    def run(x, *rest):
        def step(c, _):
            y = fn(c, *rest)
            return c + 1e-6 * jnp.mean(y).astype(c.dtype), ()

        o, _ = lax.scan(step, x, None, length=K)
        return jnp.sum(o[:1, :1, :1].astype(jnp.float32))

    return run


def conv(x, k, strides, pad):
    return lax.conv_general_dilated(
        x, k, strides, pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def s2d(x, f):
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w // f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // f, w // f, f * f * c)


def s2d_kernel(k, f):
    """Rearrange (7,7,C,O) stride-f kernel into (kk,kk,f*f*C,O) stride-1
    for s2d input with channel order (r, s, c); pad so taps p = f*u + r + 3
    cover p in 0..6 with u in {-(3//f)-? ..}; here f in {2,4}."""
    kh, kw, c, o = k.shape
    assert kh == 7 and kw == 7
    # taps p-3 = f*u + r  (r in 0..f-1). u range:
    lo = -(-3 // f) if False else None
    us = sorted({(p - 3) // f for p in range(7)})
    nu = len(us)
    out = np.zeros((nu, nu, f * f * c, o), k.dtype)
    for p in range(7):
        for q in range(7):
            u, r = (p - 3) // f, (p - 3) % f
            v, s = (q - 3) // f, (q - 3) % f
            ui, vi = us.index(u), us.index(v)
            out[ui, vi, (r * f + s) * c : (r * f + s) * c + c, :] = k[p, q]
    pad = (-us[0], us[-1] - (7 - 3 - 1) // f + (1 if f == 2 else 0))
    return jnp.asarray(out), us


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(B, 320, 320, 3)) * 50, dt)
    k = jnp.asarray(rng.normal(size=(7, 7, 3, 64)) * 0.05, dt)

    # correctness of s2d variant (small, f32, CPU-ish check on device)
    ks, us = s2d_kernel(np.asarray(k, np.float32), 2)
    ks = ks.astype(dt)
    padlo, padhi = -us[0], us[-1]
    xs = x[:2]
    a = conv(xs, k, (2, 2), [(3, 3), (3, 3)])
    xs2 = s2d(xs, 2)
    bng = conv(xs2, ks, (1, 1), [(padlo, padhi), (padlo, padhi)])
    print("s2d abs err:", float(jnp.max(jnp.abs(a - bng))),
          "shapes", a.shape, bng.shape, "us", us, flush=True)

    timeit("A conv7x7/s2 Cin3", kloop(lambda xx, kk: conv(xx, kk, (2, 2), [(3, 3), (3, 3)])), x, k)

    x8 = jnp.pad(x, ((0, 0),) * 3 + ((0, 5),))
    k8 = jnp.pad(k, ((0, 0), (0, 0), (0, 5), (0, 0)))
    timeit("B conv7x7/s2 Cin8(pad)", kloop(lambda xx, kk: conv(xx, kk, (2, 2), [(3, 3), (3, 3)])), x8, k8)

    x2 = s2d(x, 2)
    timeit("C conv4x4/s1 on s2d(2) Cin12", kloop(lambda xx, kk: conv(xx, kk, (1, 1), [(padlo, padhi), (padlo, padhi)])), x2, ks)

    def fused_c(xx, kk):
        return conv(s2d(xx, 2), kk, (1, 1), [(padlo, padhi), (padlo, padhi)])

    timeit("C' s2d+conv fused (incl transform)", kloop(fused_c), x, ks)

    # D: stem 7x7/s4
    k4 = jnp.asarray(rng.normal(size=(7, 7, 3, 64)) * 0.05, dt)
    timeit("D stem conv7x7/s4 Cin3", kloop(lambda xx, kk: conv(xx, kk, (4, 4), [(3, 3), (3, 3)])), x, k4)
    ks4np, us4 = s2d_kernel(np.asarray(k4, np.float32), 4)
    ks4 = ks4np.astype(dt)
    p4lo, p4hi = -us4[0], us4[-1]
    xs4 = s2d(x[:2], 4)
    d_ref = conv(x[:2], k4, (4, 4), [(3, 3), (3, 3)])
    d_got = conv(xs4, ks4, (1, 1), [(p4lo, p4hi), (p4lo, p4hi)])
    print("s4d abs err:", float(jnp.max(jnp.abs(d_ref - d_got))), d_ref.shape, d_got.shape, flush=True)

    def fused_d(xx, kk):
        return conv(s2d(xx, 4), kk, (1, 1), [(p4lo, p4hi), (p4lo, p4hi)])

    timeit("D' stem via s2d(4)+conv2x2 Cin48", kloop(fused_d), x, ks4)

    # E: fused preprocess as two matmuls (resize 640->320 + normalize folded)
    from perspectivefields_tpu.ops.image import make_resize_matrix

    img = jnp.asarray(rng.integers(0, 256, size=(B, 640, 640, 3)), jnp.uint8)
    mh = jnp.asarray(make_resize_matrix(640, 320, "pil_bilinear"), dt)
    mw = np.asarray(make_resize_matrix(640, 320, "pil_bilinear"), np.float32)
    std = np.array([1.0, 1.0, 1.0], np.float32)
    mean = np.array([103.53, 116.28, 123.675], np.float32)
    kr = np.einsum("ow,cd->wc od".replace(" ", ""), mw, np.diag(1.0 / std)).reshape(640 * 3, 320 * 3)
    kr = jnp.asarray(kr, dt)
    bias = jnp.asarray(np.tile(-mean / std, 320), dt)

    def pre_fused(u8):
        xf = u8.reshape(B, 640, 640 * 3).astype(dt)
        h = jnp.einsum("oh,bhX->boX", mh, xf)
        y = h.reshape(B * 320, 640 * 3) @ kr + bias
        return y.reshape(B, 320, 320, 3)

    def kpre(u8):
        def step(c, _):
            y = pre_fused(u8 + c.astype(jnp.uint8))
            return c + jnp.mean(y).astype(jnp.float32), ()

        o, _ = lax.scan(step, jnp.float32(0), None, length=K)
        return o

    f = jax.jit(kpre)
    float(f(img))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(f(img))
        best = min(best, time.perf_counter() - t0)
    print(f"E fused preprocess matmul: {best / K * 1000:.2f} ms/batch", flush=True)

    # correctness vs reference preprocess
    from perspectivefields_tpu.ops.image import resize_bilinear

    ref = (resize_bilinear(img[:2].astype(jnp.float32), 320, 320, "pil_bilinear")
           - jnp.asarray(mean)) / jnp.asarray(std)
    got = pre_fused(img).astype(jnp.float32)[:2]
    print("pre_fused max abs err (bf16 path):", float(jnp.max(jnp.abs(ref - got))), flush=True)


if __name__ == "__main__":
    main()
