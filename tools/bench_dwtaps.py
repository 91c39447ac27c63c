"""Same-moment e2e A/B: stock grouped-conv dwconv vs tap-accumulation.

Builds the full bench pipeline twice in ONE process — control (XLA grouped
conv, PF_DW_TAPS=0) and taps (ops/dwconv.dwconv_taps, PF_DW_TAPS=1) — then
measures them in interleaved windows (A B A B ...) so relay-health drift
(PERF_NOTES.md: ±8% run-to-run) cancels out of the comparison. The gate is
read at trace time, so flipping the env var between builds yields two
distinct jit programs with identical param trees.

Usage: timeout 1400 python tools/bench_dwtaps.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["PF_DW_TAPS"] = "0"

import jax  # noqa: E402

import bench  # noqa: E402


def main():
    variants = []
    prev = None
    for name, flag in (("control", "0"), ("dw_taps", "1")):
        os.environ["PF_DW_TAPS"] = flag
        # reuse=prev: both variants share ONE device-resident input + param
        # copy (two copies would hold ~5 GB of HBM and distort the A/B)
        fn, params, batches = bench.build(128, True, reuse=prev)
        # compile + warmup now, while the flag is set (trace time)
        float(fn(params, batches))
        print(f"# {name} compiled", file=sys.stderr)
        variants.append((name, fn, params, batches))
        prev = (fn, params, batches)

    k, b = variants[0][3].shape[0], variants[0][3].shape[1]
    best = {name: float("inf") for name, *_ in variants}
    reps = 3
    for w in range(6):
        for name, fn, params, batches in variants:
            outs = [fn(params, batches) for _ in range(reps + 1)]
            float(outs[0])
            t0 = time.perf_counter()
            for o in outs[1:]:
                float(o)
            dt = (time.perf_counter() - t0) / reps
            rate = k * b / dt
            print(f"# window {w} {name}: {rate:.1f} img/s", file=sys.stderr)
            best[name] = min(best[name], dt)
    for name in best:
        print(f"{name}: {k * b / best[name]:.1f} img/s")


if __name__ == "__main__":
    main()
