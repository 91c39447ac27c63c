"""Same-moment e2e A/B/N of env-gated bench variants.

Each CLI arg is one variant: a comma-separated list of ENV=VALUE
assignments applied before that variant's build (bench gates like
BENCH_UNROLL / BENCH_FUSE_BLOCK are read at trace time, so flipping the env
between builds yields distinct jit programs with identical param trees). All
variants share ONE device-resident input + param copy (bench.build reuse
hook — two copies of the K=16 B=128 input are ~5 GB of HBM, enough to
distort the numbers) and are measured in interleaved windows (A B A B ...)
so relay-health drift (PERF_NOTES.md: ±8% run-to-run) cancels out of the
comparison.

Model-internal experiments (e.g. the closed dwconv-taps A/B) are injected by
monkeypatching the relevant module attribute before build, not via env vars
— the production forwards read no environment (VERDICT r3 item 5). A token
whose key starts with ``@`` does exactly that:
``@pkg.mod.ATTR=value`` setattr's ``value`` (int-parsed) on ``pkg.mod``
before the variant's build and restores it after, so module-attribute gates
(ATTN_STAGE1_FOLD, ATTN_TOKEN_GATE, ...) A/B the same way env gates do.

Usage:
    timeout 2600 python tools/bench_ab.py BENCH_UNROLL=1 BENCH_UNROLL=2
    timeout 2600 python tools/bench_ab.py \
        @perspectivefields_tpu.models.mit.ATTN_STAGE1_FOLD=1 \
        @perspectivefields_tpu.models.mit.ATTN_STAGE1_FOLD=0
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

import bench  # noqa: E402


def main():
    specs = sys.argv[1:] or ["BENCH_UNROLL=1", "BENCH_UNROLL=2"]
    on_tpu = jax.default_backend() == "tpu"
    # off-TPU this is a plumbing smoke, not a measurement
    batch = int(os.environ.get("AB_BATCH", "128" if on_tpu else "2"))
    windows = int(os.environ.get("AB_WINDOWS", "6" if on_tpu else "1"))
    reps = 3 if on_tpu else 1

    variants = []
    prev = None
    for spec in specs:
        saved = {}
        saved_attrs = []
        for tok in spec.split(","):
            key, val = tok.split("=", 1)
            if key.startswith("@"):
                import importlib

                mod_path, attr = key[1:].rsplit(".", 1)
                mod = importlib.import_module(mod_path)
                saved_attrs.append((mod, attr, getattr(mod, attr)))
                setattr(mod, attr, int(val))
            else:
                saved[key] = os.environ.get(key)
                os.environ[key] = val
        fn, params, batches = bench.build(batch, on_tpu, reuse=prev)
        # compile + warmup now, while the env/attrs are set (trace time)
        float(fn(params, batches))
        print(f"# {spec} compiled", file=sys.stderr)
        for key, val in saved.items():
            if val is None:
                os.environ.pop(key, None)
            else:
                os.environ[key] = val
        for mod, attr, val in saved_attrs:
            setattr(mod, attr, val)
        variants.append((spec, fn))
        prev = (fn, params, batches)

    k, b = prev[2].shape[0], prev[2].shape[1]
    params, batches = prev[1], prev[2]
    best = {spec: float("inf") for spec, _ in variants}
    for w in range(windows):
        for spec, fn in variants:
            outs = [fn(params, batches) for _ in range(reps + 1)]
            float(outs[0])
            t0 = time.perf_counter()
            for o in outs[1:]:
                float(o)
            dt = (time.perf_counter() - t0) / reps
            print(f"# window {w} {spec}: {k * b / dt:.1f} img/s", file=sys.stderr)
            best[spec] = min(best[spec], dt)
    for spec, _ in variants:
        print(f"{spec}: {k * b / best[spec]:.1f} img/s")


if __name__ == "__main__":
    main()
