"""Microbench: depthwise conv as banded matmuls on the MXU vs XLA's lowering.

Hypothesis. XLA lowers feature_group_count==C convs to VPU tap accumulation
(PERF_NOTES.md: measured at the ~1.9 TFLOP/s VPU floor; the tap-FMA Pallas
variant and the explicit-slice formulation both confirmed the floor). The
MXU runs ~100x the VPU's FLOP rate. A depthwise (kh,kw) conv can be written
as kh banded matmuls along W:

    y[b,h,w,c] = sum_dy sum_v  x[b, h+dy, v, c] * A_dy[c, v, w]

where A_dy[c] is a (W_in, W_out) banded matrix holding row dy of channel
c's kernel. Packing the kh shifted inputs along the contraction axis gives
ONE c-batched GEMM per block: (C, B*H, kh*Wp) @ (C, kh*Wp, W) — kh*W/kw more
FLOPs than the essential tap count, but on the MXU. For W=80, C=96 (ParamNet
ConvNeXt stage 0, the single hottest dw shape at ~4 ms/block VPU) theory
says ~0.9 ms GEMM + ~1.4 ms im2row traffic.

Honest timing: K iterations inside one jit scan with a data dependency;
first-call relay warmup absorbed before timing (PERF_NOTES.md methodology).
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

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def dw_conv_xla(x, kernel, pad):
    """Stock depthwise conv (flax nn.Conv lowering): grouped conv."""
    c = kernel.shape[-1]
    return lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def make_banded(kernel, w_in, pad):
    """(kh, kw, 1, C) taps -> (kh, C, w_in + 2*pad, w_in) banded matrices.

    A[dy, c, v, w] = kernel[dy, v - w, 0, c] when 0 <= v - w < kw (v indexes
    the padded input row). Built with jnp ops so it traces (weights are
    runtime values); the result is tiny (kh*C*W^2)."""
    kh, kw, _, c = kernel.shape
    wp = w_in + 2 * pad
    v = jnp.arange(wp)[:, None]
    w = jnp.arange(w_in)[None, :]
    # offset of padded-input column v into the kernel for output column w
    off = v - w  # (wp, w_in)
    sel = (off >= 0) & (off < kw)
    offc = jnp.clip(off, 0, kw - 1)
    # gather taps: (kh, c, wp, w_in)
    taps = kernel[:, :, 0, :]  # (kh, kw, c)
    a = taps[:, offc, :]  # (kh, wp, w_in, c)
    a = jnp.where(sel[None, :, :, None], a, 0.0)
    return jnp.transpose(a, (0, 3, 1, 2))  # (kh, c, wp, w_in)


def dw_conv_banded(x, kernel, pad):
    """Depthwise conv as ONE c-batched GEMM: pack the kh H-shifted padded
    inputs along the contraction axis."""
    b, h, w, c = x.shape
    kh = kernel.shape[0]
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    wp = w + 2 * pad
    # (kh, b, h, wp, c): kh overlapping H-windows
    rows = jnp.stack(
        [lax.slice(xp, (0, dy, 0, 0), (b, dy + h, wp, c)) for dy in range(kh)],
        axis=0,
    )
    # contraction axis = (kh, wp); batch = c
    lhs = jnp.transpose(rows, (4, 1, 2, 0, 3)).reshape(c, b * h, kh * wp)
    a = make_banded(kernel, w, pad)  # (kh, c, wp, w)
    rhs = jnp.transpose(a, (1, 0, 2, 3)).reshape(c, kh * wp, w).astype(x.dtype)
    y = lax.dot_general(
        lhs, rhs,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (c, b*h, w)
    y = y.astype(x.dtype).reshape(c, b, h, w)
    return jnp.transpose(y, (1, 2, 3, 0))


def timed(fn, x, kernel, k=16):
    @jax.jit
    def run(x, kernel):
        def body(carry, _):
            y = fn(carry, kernel)
            # keep shapes fixed + create a data dependency
            return carry + 0.0 * y, ()

        out, _ = lax.scan(body, x, None, length=k)
        return jnp.sum(out.astype(jnp.float32))

    float(run(x, kernel))  # compile + warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, kernel))
        best = min(best, (time.perf_counter() - t0) / k)
    return best * 1e3  # ms per iteration


def main():
    shapes = [
        # (name, B, H, W, C, kh, pad) — the model's hot depthwise shapes
        ("paramnet_s0", 128, 80, 80, 96, 7, 3),
        ("paramnet_s1", 128, 40, 40, 192, 7, 3),
        ("paramnet_s2", 128, 20, 20, 384, 7, 3),
        ("mit_ffn_s1", 128, 80, 80, 256, 3, 1),
        ("mit_ffn_s2", 128, 40, 40, 512, 3, 1),
    ]
    if jax.default_backend() != "tpu":
        shapes = [("smoke", 2, 16, 16, 8, 3, 1)]
    rng = np.random.default_rng(0)
    for name, b, h, w, c, kh, pad in shapes:
        x = jnp.asarray(
            rng.standard_normal((b, h, w, c), np.float32), jnp.bfloat16
        )
        kernel = jnp.asarray(
            rng.standard_normal((kh, kh, 1, c), np.float32) * 0.1, jnp.float32
        )
        # correctness first (f32 tolerance vs grouped conv)
        ya = dw_conv_xla(x, kernel, pad)
        yb = dw_conv_banded(x, kernel, pad)
        err = float(
            jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32)))
        )
        t_xla = timed(functools.partial(dw_conv_xla, pad=pad), x, kernel)
        t_band = timed(functools.partial(dw_conv_banded, pad=pad), x, kernel)
        print(
            f"{name}: xla {t_xla:.2f} ms | banded {t_band:.2f} ms | "
            f"maxerr {err:.2e} | speedup {t_xla / t_band:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
