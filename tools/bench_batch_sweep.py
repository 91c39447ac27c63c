"""Batch-size retune with the fused-attention kernel enabled (VERDICT r2 #1).

Round 2 only ever measured B=128 with use_pallas=True; the batch-tile
heuristic in kernels/fused_attention.py and XLA's scheduling both shift with
batch size, so the optimum may have moved. Reuses bench.py's build/measure
(same K-in-one-jit methodology). Run:  python tools/bench_batch_sweep.py 96 160 192
"""

import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))

from bench import build, measure  # noqa: E402


def main():
    batches = [int(a) for a in sys.argv[1:]] or [96, 160, 192]
    import jax

    print(f"# backend={jax.default_backend()}", flush=True)
    for b in batches:
        t0 = time.time()
        try:
            fn, params, data = build(b, True)
            try:
                ips = measure(fn, params, data, reps=3)
            finally:
                # release device buffers before the next batch size even on
                # a failed measure; a failed build leaves nothing to free
                del fn, params, data
            print(f"batch={b} pallas=True: {ips:.1f} img/s "
                  f"(total {time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"batch={b} FAILED: {e!r}", flush=True)


if __name__ == "__main__":
    main()
