"""In-context per-block cost of the dominant backbone stages, by depth
ablation of the FULL e2e bench pipeline.

Standalone stage probes (bench_mit_stages.py) overstate costs — layouts
differ and XLA fuses across op boundaries (PERF_NOTES.md). This probe keeps
the entire bench graph identical and only shrinks one stage's depth:

  full      — depths (3, 4, 18, 3)   (control)
  stage3_9  — depths (3, 4,  9, 3)   -> delta/9  = stage-3 ms/block in context
  stage1_1  — depths (1, 4, 18, 3)   -> delta/2  = stage-1 ms/block in context

Same K-scan + pipelined measurement as bench.py. Weights random (throughput
only). Usage: python tools/bench_stage_ablate.py [full stage3_9 stage1_1]
"""

import dataclasses
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

BATCH = 128
K = 16
DEPTHS = {
    "full": (3, 4, 18, 3),
    "stage3_9": (3, 4, 9, 3),
    "stage1_1": (1, 4, 18, 3),
    "stage2_1": (3, 1, 18, 3),
    "stage4_1": (3, 4, 18, 1),
}


def build(depths):
    from perspectivefields_tpu.config import model_zoo
    from perspectivefields_tpu.models import PersNet
    from perspectivefields_tpu.ops.image import make_fused_preprocess
    from perspectivefields_tpu.ops.postprocess import (
        postprocess_gravity,
        postprocess_latitude,
    )

    cfg = model_zoo["Paramnet-360Cities-edina-centered"]["config"]
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, depths=depths)
    )
    model = PersNet(cfg, dtype=jnp.bfloat16, use_pallas=True)
    pre = make_fused_preprocess(
        (640, 640), (320, 320), cfg.pixel_mean, cfg.pixel_std, jnp.bfloat16
    )

    @jax.jit
    def run_k(params, batches):
        def body(carry, images):
            out = model.apply(params, pre(images), deterministic=True)
            up = jax.vmap(
                lambda p: postprocess_gravity(p, (320, 320), 640, 640, "regression")
            )(out["pred_gravity"].astype(jnp.bfloat16))
            lat = jax.vmap(
                lambda p: postprocess_latitude(p, (320, 320), 640, 640, "regression")
            )(out["pred_latitude"].astype(jnp.bfloat16))
            s = (
                jnp.sum(up.astype(jnp.float32))
                + jnp.sum(lat.astype(jnp.float32))
                + jnp.sum(
                    out["pred_roll"] + out["pred_pitch"] + out["pred_general_vfov"]
                ).astype(jnp.float32)
            )
            return carry + s, ()

        total, _ = lax.scan(body, jnp.float32(0.0), batches)
        return total

    rng = np.random.default_rng(0)
    batches = jnp.asarray(
        rng.integers(0, 256, size=(K, BATCH, 640, 640, 3), dtype=np.uint8)
    )
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 320, 320, 3), jnp.float32)
    )
    prng = np.random.default_rng(42)

    def _fill(path, s):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in ("var", "scale", "gamma"):
            return jnp.ones(s.shape, s.dtype)
        if name in ("mean", "bias"):
            return jnp.zeros(s.shape, s.dtype)
        return jnp.asarray(
            prng.standard_normal(s.shape, dtype=np.float32) * 0.02, s.dtype
        )

    params = jax.device_put(jax.tree_util.tree_map_with_path(_fill, shapes))
    return run_k, params, batches


def measure(fn, params, batches, reps=3, windows=3):
    float(fn(params, batches))
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        outs = [fn(params, batches) for _ in range(reps)]
        for o in outs:
            float(o)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    names = sys.argv[1:] or list(DEPTHS)
    ms = {}
    for name in names:
        fn, params, batches = build(DEPTHS[name])
        t = measure(fn, params, batches)
        ms[name] = t / K * 1000
        print(f"{name}: {ms[name]:.2f} ms/batch  ({K * BATCH / t:.1f} img/s)",
              flush=True)
        del fn, params, batches
    if "full" in ms and "stage3_9" in ms:
        print(f"stage-3 in-context: {(ms['full'] - ms['stage3_9']) / 9:.3f} ms/block")
    if "full" in ms and "stage1_1" in ms:
        print(f"stage-1 in-context: {(ms['full'] - ms['stage1_1']) / 2:.3f} ms/block")
    if "full" in ms and "stage2_1" in ms:
        print(f"stage-2 in-context: {(ms['full'] - ms['stage2_1']) / 3:.3f} ms/block")
    if "full" in ms and "stage4_1" in ms:
        print(f"stage-4 in-context: {(ms['full'] - ms['stage4_1']) / 2:.3f} ms/block")


if __name__ == "__main__":
    main()
