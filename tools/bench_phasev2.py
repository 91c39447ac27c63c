"""Probe: compose fusion1's 2x upsample into conv0's _c1 branch (per head).

Current dataflow per head (after fusion1's RCU2, A @80^2x256; ll @160^2x64):
  up2x(A) -> 160^2x256            (1.68 GB bf16 intermediate @B128)
  conv0_c1 = conv3x3(up, 256->64) (N=64: ~21% MFU)
  + conv3x3(ll, 64->64) + b0 -> relu -> fused tail

Phase-composed v2 (same trick as the fused tail, one level up):
  z = per-phase conv3x3(A, 256->4x64) @80^2   [compose up o conv0_c1: same
                                               FLOPs, N=256, no intermediate]
  x = depth_to_space(z) @160^2x64, then ll-branch add/relu/tail unchanged.

Chaining further convs in phase space doesn't work cleanly: a 3x3 conv at
fine resolution over phase-space data needs per-phase tap alignment (2 coarse
taps but a different pair per phase), so it costs either 1.78x FLOPs at
narrow N (4 offset convs) or 4x FLOPs (3x3 with zero blocks). d2s + the
existing fused tail is the right cut.

Border note (implementation): composition is exact in the interior; the 2px
frame at 160^2 (bilinear edge clamp x conv zero-pad) is recomputed with the
plain path on 3px slabs, as in heads.SegFormerDecoder._fused_tail.
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


def conv(x, k, pad):
    return lax.conv_general_dilated(
        x, k, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def timeit(name, fn, *args):
    f = jax.jit(fn)
    float(f(*args))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best / K * 1000:7.3f} ms/iter", flush=True)
    return best / K * 1000


def d2s(z):
    b, h, w, c = z.shape
    cc = c // 4
    return (
        z.reshape(b, h, w, 2, 2, cc)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, 2 * h, 2 * w, cc)
    )


def main():
    from perspectivefields_tpu.ops.image import resize_bilinear

    rng = np.random.default_rng(0)
    float(jax.jit(lambda a: jnp.sum(a))(jnp.ones((8, 8))))  # relay warmup

    A = jnp.asarray(rng.normal(size=(B, 80, 80, 256)) * 0.1, DT)
    ll = jnp.asarray(rng.normal(size=(B, 160, 160, 64)) * 0.1, DT)
    k0_c1 = jnp.asarray(rng.normal(size=(3, 3, 256, 64)) * 0.02, DT)
    k0_ll = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.02, DT)
    k0_phase = jnp.asarray(rng.normal(size=(3, 3, 256, 256)) * 0.02, DT)
    k_tail = jnp.asarray(rng.normal(size=(3, 3, 64, 128)) * 0.05, DT)
    kpred = jnp.asarray(rng.normal(size=(32, 2)) * 0.1, DT)

    def chain_loop(step):
        def run(a, llx, *ks):
            def body(c, _):
                y = step(c, llx, *ks)
                return c + 1e-6 * jnp.sum(y[:1, :1, :1, :1]).astype(c.dtype), ()
            o, _ = lax.scan(body, a, None, length=K)
            return jnp.sum(o[:1, :1, :1].astype(jnp.float32))
        return run

    def tail(x, kt, kp):
        z = jax.nn.relu(conv(x, kt, 1))
        b, h, w, _ = z.shape
        y4 = jnp.einsum("bhwpi,io->bhwpo", z.reshape(b, h, w, 4, 32), kp)
        return (
            y4.reshape(b, h, w, 2, 2, 2)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, 2 * h, 2 * w, 2)
        )

    # --- isolated pieces ---
    def cur_up_conv0(a, kc1):
        up = resize_bilinear(a, 160, 160, "torch_bilinear")
        return conv(up, kc1, 1)

    def v2_conv0(a, kp):
        return d2s(conv(a, kp, 1))

    timeit("cur  up2x + conv0_c1 (->160^2x64)", chain_loop(lambda a, llx, k: cur_up_conv0(a, k)), A, ll, k0_c1)
    timeit("v2   phase conv0 + d2s (->160^2x64)", chain_loop(lambda a, llx, k: v2_conv0(a, k)), A, ll, k0_phase)
    timeit("v2   phase conv0 only (->80^2x256)", chain_loop(lambda a, llx, k: conv(a, k, 1)), A, ll, k0_phase)

    # --- full back-end chains (conv0 -> relu -> fused tail -> pred) ---
    def cur_chain(a, llx, kc1, kll, kt, kp):
        x = jax.nn.relu(cur_up_conv0(a, kc1) + conv(llx, kll, 1))
        return tail(x, kt, kp)

    def v2_chain(a, llx, kphase, kll, kt, kp):
        x = jax.nn.relu(v2_conv0(a, kphase) + conv(llx, kll, 1))
        return tail(x, kt, kp)

    timeit("cur  FULL back-end", chain_loop(cur_chain), A, ll, k0_c1, k0_ll, k_tail, kpred)
    timeit("v2   FULL back-end", chain_loop(v2_chain), A, ll, k0_phase, k0_ll, k_tail, kpred)


if __name__ == "__main__":
    main()
