"""Same-moment A/B: f32 master params vs pre-cast bf16 serving params.

Hypothesis: every matmul/conv weight is consumed as `kernel.astype(bf16)`
inside the scan body (models/mit.py:103-108, models/heads.py etc.). If XLA's
while-loop invariant code motion does NOT hoist those converts out of the
K-batch scan, each scan iteration re-reads the full f32 param tree from HBM
and writes a bf16 copy (~420 MB read + 210 MB write per iteration at
mit_b3+heads+paramnet scale) — ~0.8 ms/iter, ~2.5% of the 206 ms batch.
Pre-casting the kernel leaves to bf16 stores the bit-identical values the
forward would compute anyway, so the hot-path numerics are unchanged (the
only divergence is the f32 kernel-composition einsums in the heads, which
then compose bf16-rounded inputs — weight-epsilon-level).

Variants:
  f32      — master params exactly as bench.make_params builds them
  kernels  — leaves named 'kernel' pre-cast to bf16 (exact hot path)
  all      — every f32 leaf pre-cast (incl. LN scale/bias + frozen-BN stats;
             frozen-BN inv then computes in bf16 — epsilon-level change)

All variants share ONE device-resident input copy; interleaved windows so
relay drift cancels (PERF_NOTES.md methodology). Each variant is a separate
jit specialization of the same run_k (dtype signature differs), so expect
one fresh multi-minute compile per non-f32 variant through the relay.

Usage: timeout 3000 python tools/bench_pdtype.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402


def cast_tree(params, which):
    def _cast(path, leaf):
        if leaf.dtype != jnp.float32:
            return leaf
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if which == "all" or name == "kernel":
            return leaf.astype(jnp.bfloat16)
        return leaf

    return jax.tree_util.tree_map_with_path(_cast, params)


def main():
    on_tpu = jax.default_backend() == "tpu"
    batch = int(os.environ.get("AB_BATCH", "128" if on_tpu else "2"))
    windows = int(os.environ.get("AB_WINDOWS", "6" if on_tpu else "1"))
    reps = 3 if on_tpu else 1

    fn, params_f32, batches = bench.build(batch, on_tpu)
    variants = [
        ("f32", params_f32),
        ("kernels", jax.device_put(cast_tree(params_f32, "kernels"))),
        ("all", jax.device_put(cast_tree(params_f32, "all"))),
    ]
    for name, p in variants:
        t0 = time.perf_counter()
        chk = float(fn(p, batches))
        print(
            f"# {name} compiled+warm in {time.perf_counter() - t0:.0f}s "
            f"checksum {chk:.6g}",
            file=sys.stderr,
        )

    k, b = batches.shape[0], batches.shape[1]
    best = {name: float("inf") for name, _ in variants}
    for w in range(windows):
        for name, p in variants:
            outs = [fn(p, batches) for _ in range(reps + 1)]
            float(outs[0])
            t0 = time.perf_counter()
            for o in outs[1:]:
                float(o)
            dt = (time.perf_counter() - t0) / reps
            print(f"# window {w} {name}: {k * b / dt:.1f} img/s", file=sys.stderr)
            best[name] = min(best[name], dt)
    for name, _ in variants:
        print(f"{name}: {k * b / best[name]:.1f} img/s")


if __name__ == "__main__":
    main()
