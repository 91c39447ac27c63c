"""Same-moment A/B of the bench scan length K (device-resident input size).

Why: PERF_NOTES round 2 measured K=32 (5 GB -> 10 GB input) ~3% SLOWER than
K=16 on HBM-residency pressure alone, and K=16 was chosen to amortize the
~30 ms per-invocation dispatch overhead under the old SERIALIZED measure().
The pipelined measure() (round 3) hides dispatch under queued compute, so
the amortization argument for a large K is gone — but smaller K (less
resident input, more buffer-assignment freedom for XLA) was never tried.

Method: one process, one param tree. Each variant's (K, B, 640, 640, 3)
uint8 input is generated ON DEVICE (jax.random.randint — no 5 GB host
upload through the relay) at the START of each of its windows and deleted
at the end, so variants never co-reside (co-residency is itself an HBM
effect and would contaminate the comparison). Windows interleave A B A B...
so relay drift cancels. Rates are img/s over the same pipelined-readback
window used by bench.measure.

Usage:
    timeout 3000 python tools/bench_kab.py 16 8 4
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

if os.environ.get("BENCH_CPU"):  # plumbing smoke off-hardware
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402


def device_batches(k: int, batch: int):
    mk = jax.jit(
        lambda key: jax.random.randint(
            key, (k, batch, 640, 640, 3), 0, 256, jnp.uint8
        )
    )
    out = mk(jax.random.PRNGKey(k))
    out.block_until_ready()
    return out


def main():
    ks = [int(a) for a in (sys.argv[1:] or ["16", "8"])]
    on_tpu = jax.default_backend() == "tpu"
    batch = int(os.environ.get("AB_BATCH", "128" if on_tpu else "2"))
    windows = int(os.environ.get("AB_WINDOWS", "6" if on_tpu else "1"))
    reps = 3 if on_tpu else 1
    if not on_tpu:
        ks = [2, 1]

    # build once for the params + compiled pipeline; throw away the host
    # input (BENCH_K=1 keeps its allocation small)
    os.environ["BENCH_K"] = "1"
    fn, params, small = bench.build(batch, on_tpu)
    del small

    # compile each K's program up front (shape-keyed retrace of the same fn)
    for k in ks:
        b = device_batches(k, batch)
        float(fn(params, b))
        del b
        print(f"# K={k} compiled", file=sys.stderr)

    best = {k: float("inf") for k in ks}
    for w in range(windows):
        for k in ks:
            b = device_batches(k, batch)
            outs = [fn(params, b) for _ in range(reps + 1)]
            float(outs[0])
            t0 = time.perf_counter()
            for o in outs[1:]:
                float(o)
            dt = (time.perf_counter() - t0) / reps
            del outs, b
            print(
                f"# window {w} K={k}: {k * batch / dt:.1f} img/s",
                file=sys.stderr,
            )
            best[k] = min(best[k], dt)
    for k in ks:
        print(f"K={k}: {k * batch / best[k]:.1f} img/s")


if __name__ == "__main__":
    main()
