"""Stage-1 lane-packed attention kernel: on-TPU numeric check, sub-block
micro-bench, and same-moment e2e A/B vs the XLA stage-1 path.

The generic fused_attention kernel LOSES at stage 1 (-1.7 ms/block,
PERF_NOTES round 3) — this probe measures the stage-1-SPECIALIZED kernel
(kernels/stage1_attention.py, token-pair lane packing) that VERDICT r4
identified as the one unexplored device-side lever.

Variants are injected by monkeypatching models.mit.ATTN_STAGE1_KERNEL
between builds (production forwards read no environment); both share one
device-resident input + param copy and interleave windows so relay drift
cancels.

Usage:
    timeout 3600 python tools/bench_stage1_attn.py          # all phases
    timeout 1200 python tools/bench_stage1_attn.py micro    # micro only
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402
from perspectivefields_tpu.kernels.fused_attention import (  # noqa: E402
    _xla_reference,
)
from perspectivefields_tpu.kernels.stage1_attention import (  # noqa: E402
    stage1_attention,
)
from perspectivefields_tpu.models import mit as mit_mod  # noqa: E402

B, N, M, C = 128, 6400, 100, 64  # mit_b3 stage 1 at the zoo resolution


def _inputs(dtype):
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.05, dtype)  # noqa
    return dict(
        x=mk(B, N, C), kv_in=mk(B, M, C),
        wq=mk(C, C), bq=mk(C), wkv=mk(C, 2 * C), bkv=mk(2 * C),
        wproj=mk(C, C), bproj=mk(C),
    ), mk(B, N, C)


def numeric():
    kw, res = _inputs(jnp.bfloat16)
    got = stage1_attention(scale=C**-0.5, residual=res, **kw)
    want = res + _xla_reference(num_heads=1, scale=C**-0.5, **kw)
    g, w = np.asarray(got, np.float32), np.asarray(want, np.float32)
    rel = np.abs(g - w) / (np.abs(w) + 1e-3)
    print(f"numeric: max_abs={np.abs(g - w).max():.3e} "
          f"max_rel={rel.max():.3e}")


def micro(reps=30):
    kw, res = _inputs(jnp.bfloat16)

    def time_fn(fn):
        fn().block_until_ready()
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            outs = [fn() for _ in range(reps)]
            outs[-1].block_until_ready()
            best = min(best, (time.perf_counter() - t0) / reps)
        return best * 1e3

    kfn = jax.jit(lambda: stage1_attention(scale=C**-0.5, residual=res, **kw))
    xfn = jax.jit(
        lambda: res + _xla_reference(num_heads=1, scale=C**-0.5, **kw)
    )
    tk, tx = time_fn(kfn), time_fn(xfn)
    print(f"micro (B={B} N={N} M={M} C={C} bf16, attn sub-block + residual):"
          f" kernel {tk:.3f} ms  xla {tx:.3f} ms  delta {tx - tk:+.3f} ms")


def e2e():
    on_tpu = jax.default_backend() == "tpu"
    batch = int(os.environ.get("AB_BATCH", "128" if on_tpu else "2"))
    windows = int(os.environ.get("AB_WINDOWS", "6" if on_tpu else "1"))
    reps = 3 if on_tpu else 1

    variants = []
    prev = None
    for name, flag in (("xla-stage1", False), ("kernel-stage1", True)):
        mit_mod.ATTN_STAGE1_KERNEL = flag
        fn, params, batches = bench.build(batch, on_tpu, reuse=prev)
        float(fn(params, batches))
        print(f"# {name} compiled", file=sys.stderr)
        variants.append((name, fn))
        prev = (fn, params, batches)
    mit_mod.ATTN_STAGE1_KERNEL = True

    k, b = prev[2].shape[0], prev[2].shape[1]
    best = {name: float("inf") for name, _ in variants}
    for w in range(windows):
        for name, fn in variants:
            outs = [fn(prev[1], prev[2]) for _ in range(reps + 1)]
            float(outs[0])
            t0 = time.perf_counter()
            for o in outs[1:]:
                float(o)
            dt = (time.perf_counter() - t0) / reps
            print(f"# window {w} {name}: {k * b / dt:.1f} img/s",
                  file=sys.stderr)
            best[name] = min(best[name], dt)
    for name, _ in variants:
        print(f"{name}: {k * b / best[name]:.1f} img/s")


if __name__ == "__main__":
    phases = sys.argv[1:] or ["numeric", "micro", "e2e"]
    for p in phases:
        {"numeric": numeric, "micro": micro, "e2e": e2e}[p]()
