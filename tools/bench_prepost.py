"""Ablate preprocess and postprocess out of the e2e bench pipeline.

Three e2e configs, same methodology as bench.py (K-batch lax.scan, full
checksum, min over reps):
  full     — identical to bench.py's default config (control)
  nopost   — checksum taken directly on the 320px head/ParamNet outputs
             (skips the 320->640 field resizes + decode)
  nopre    — input is a pre-resized/normalized (B, 320, 320, 3) bf16 batch
             (skips the fused 640->320 resize+normalize)
The full-vs-ablated deltas bound what a faster pre/postprocess could buy
in context (standalone per-op numbers overstate — PERF_NOTES.md).

Usage: python tools/bench_prepost.py [full nopost nopre]
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

BATCH = 128
K = 16


def build(mode: str):
    from perspectivefields_tpu.config import model_zoo
    from perspectivefields_tpu.models import PersNet
    from perspectivefields_tpu.ops.image import make_fused_preprocess
    from perspectivefields_tpu.ops.postprocess import (
        postprocess_gravity,
        postprocess_latitude,
    )

    cfg = model_zoo["Paramnet-360Cities-edina-centered"]["config"]
    model = PersNet(cfg, dtype=jnp.bfloat16, use_pallas=True)
    pre = make_fused_preprocess(
        (640, 640), (320, 320), cfg.pixel_mean, cfg.pixel_std, jnp.bfloat16
    )

    def pipeline(params, images):
        x = pre(images) if mode != "nopre" else images
        out = model.apply(params, x, deterministic=True)
        if mode == "nopost":
            up = out["pred_gravity"].astype(jnp.bfloat16)
            lat = out["pred_latitude"].astype(jnp.bfloat16)
        else:
            up = jax.vmap(
                lambda p: postprocess_gravity(p, (320, 320), 640, 640, "regression")
            )(out["pred_gravity"].astype(jnp.bfloat16))
            lat = jax.vmap(
                lambda p: postprocess_latitude(p, (320, 320), 640, 640, "regression")
            )(out["pred_latitude"].astype(jnp.bfloat16))
        return up, lat, out["pred_roll"], out["pred_pitch"], out["pred_general_vfov"]

    @jax.jit
    def run_k(params, batches):
        def body(carry, images):
            up, lat, roll, pitch, vfov = pipeline(params, images)
            s = (
                jnp.sum(up.astype(jnp.float32))
                + jnp.sum(lat.astype(jnp.float32))
                + jnp.sum(roll + pitch + vfov).astype(jnp.float32)
            )
            return carry + s, ()

        total, _ = lax.scan(body, jnp.float32(0.0), batches)
        return total

    rng = np.random.default_rng(0)
    if mode == "nopre":
        batches = jnp.asarray(
            rng.standard_normal((K, BATCH, 320, 320, 3)).astype(np.float32),
            jnp.bfloat16,
        )
    else:
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


def main():
    modes = sys.argv[1:] or ["full", "nopost", "nopre"]
    for mode in modes:
        fn, params, batches = build(mode)
        float(fn(params, batches))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(params, batches))
            best = min(best, time.perf_counter() - t0)
        ips = K * BATCH / best
        print(
            f"{mode:7s}: {ips:7.1f} img/s  ({best * 1e3 / K:.2f} ms/batch)",
            flush=True,
        )


if __name__ == "__main__":
    main()
