"""Microbench: Pallas direct 3x3 conv (9-shift matmul) vs XLA conv.

Target shape: the decode-head RCU conv — 3x3, 256->256, 80x80, bf16 —
which is ~45% of all model FLOPs (2 heads x fusion1 x 2 RCUs x 2 convs)
and runs at only ~37% MFU under XLA (PERF_NOTES.md). The kernel loads a
halo'd row-tile of the (pre-padded) input into VMEM via manual DMA, then
accumulates 9 shifted (TH*W, C) x (C, Cout) matmuls in f32.

Run on TPU: python tools/bench_conv_pallas.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 128
H = W = 80
C = 256
CO = 256
K = 4  # scan iters inside jit
REPS = 4


def conv_xla(x, k, bias):
    y = lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias


def _conv3x3_kernel(x_hbm, w_ref, b_ref, out_ref, xbuf, sem, *, th, wo, c, co):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(i * th, th + 2)], xbuf, sem
    )
    cp.start()
    cp.wait()
    wp = xbuf.shape[1]
    # Row shifts (untiled dim) are free; column shifts move to the OUTPUT:
    # y_dq[h, w] = sum_dp x[h+dp, w] k[dp, dq]  (no input slicing at all),
    # out[h, w] = sum_dq y_dq[h, w + dq].
    accs = []
    for dq in range(3):
        a = jnp.zeros((th * wp, co), jnp.float32)
        for dp in range(3):
            xs = xbuf[dp : dp + th].reshape(th * wp, c)
            a += jnp.dot(xs, w_ref[dp * 3 + dq], preferred_element_type=jnp.float32)
        accs.append(a.reshape(th, wp, co))
    out = (
        accs[0][:, 0:wo]
        + accs[1][:, 1 : wo + 1]
        + accs[2][:, 2 : wo + 2]
        + b_ref[:].astype(jnp.float32)
    )
    out_ref[:] = out.reshape(1, th, wo, co).astype(out_ref.dtype)


def conv_pallas(x, k, bias, th=20):
    """x: (B, H, W, C) unpadded; k: (3, 3, C, Cout); bias: (Cout,)."""
    b, h, w, c = x.shape
    co = k.shape[-1]
    # pad width to a multiple of 8 (Mosaic DMA slices need 8-aligned sublanes)
    wp = -(-(w + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    kp = k.reshape(9, c, co)
    grid = (b, h // th)
    return pl.pallas_call(
        functools.partial(_conv3x3_kernel, th=th, wo=w, c=c, co=co),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM, manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, co), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, wp, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * b * h * w * c * co,
            bytes_accessed=b * (h + 2) * (w + 2) * c * 2 + b * h * w * co * 2,
            transcendentals=0,
        ),
    )(xp, kp, bias)


def timeit(name, fn, *args, flops=None):
    f = jax.jit(fn)
    float(jnp.sum(jnp.asarray(f(*args), jnp.float32)))  # compile + warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(jnp.sum(jnp.asarray(f(*args), jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    dt = best / K
    msg = f"{name}: {dt * 1e3:.2f} ms"
    if flops:
        msg += f"  ({flops / dt / 1e12:.1f} TF/s, {flops / dt / 1e12 / 197 * 100:.0f}% MFU)"
    print(msg, flush=True)
    return dt


def kloop(fn):
    def run(x, *rest):
        def step(c, _):
            y = fn(c, *rest)
            return c + 1e-6 * jnp.mean(y).astype(c.dtype), ()

        o, _ = lax.scan(step, x, None, length=K)
        return jnp.sum(o[:1, :1, :1])

    return run


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(B, H, W, C)) * 0.1, dt)
    k = jnp.asarray(rng.normal(size=(3, 3, C, CO)) * 0.02, dt)
    bias = jnp.asarray(rng.normal(size=(CO,)) * 0.1, dt)

    # correctness first
    ref = conv_xla(x[:2].astype(jnp.float32), k.astype(jnp.float32),
                   bias.astype(jnp.float32))
    got = jax.jit(conv_pallas)(x[:2], k, bias).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"pallas vs f32 ref rel err: {err:.4f} (bf16 rounding expected)")
    refb = jax.jit(conv_xla)(x[:2], k, bias).astype(jnp.float32)
    errb = float(jnp.max(jnp.abs(refb - got)))
    print(f"pallas vs XLA bf16 abs err: {errb:.5f}")

    flops = 2 * 9 * B * H * W * C * CO
    timeit("XLA conv3x3", kloop(conv_xla), x, k, bias, flops=flops)
    for th in (8, 10, 16, 20, 40):
        timeit(
            f"pallas conv3x3 th={th}",
            kloop(functools.partial(conv_pallas, th=th)),
            x, k, bias, flops=flops,
        )


if __name__ == "__main__":
    main()
