"""Throughput benchmark: full inference pipeline images/sec on one chip.

Measures the flagship model (mit_b3 + both heads + ParamNet, bf16 compute)
on the end-to-end device path: 640x640 uint8 BGR batch -> on-device
PIL-equivalent resize to 320x320 -> normalize -> forward -> ParamNet +
postprocess fields back to 640px. This matches the BASELINE.md north-star
metric (640px images/sec; target 5000/s on a v5e-8 => 625/s/chip).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PER_CHIP = 625.0  # 5000 img/s on 8 chips (BASELINE.md north star)


def build_pipeline(batch: int, use_pallas: bool):
    from perspectivefields_tpu.config import model_zoo
    from perspectivefields_tpu.models import PersNet
    from perspectivefields_tpu.ops.image import resize_bilinear
    from perspectivefields_tpu.ops.postprocess import (
        postprocess_gravity,
        postprocess_latitude,
    )

    cfg = model_zoo["Paramnet-360Cities-edina-centered"]["config"]
    model = PersNet(cfg, dtype=jnp.bfloat16, use_pallas=use_pallas)
    mean = jnp.asarray(cfg.pixel_mean)
    std = jnp.asarray(cfg.pixel_std)

    def pipeline(params, images_u8):
        # bf16 device resize: uint8 values are exact in bf16; the fast path
        # trades <=1 LSB of resample error for MXU-speed preprocessing
        x = resize_bilinear(images_u8.astype(jnp.bfloat16), 320, 320, "pil_bilinear")
        x = (x.astype(jnp.float32) - mean) / std
        out = model.apply(params, x, deterministic=True)
        up = jax.vmap(
            lambda p: postprocess_gravity(p, (320, 320), 640, 640, "regression")
        )(out["pred_gravity"].astype(jnp.float32))
        lat = jax.vmap(
            lambda p: postprocess_latitude(p, (320, 320), 640, 640, "regression")
        )(out["pred_latitude"].astype(jnp.float32))
        return up, lat, out["pred_roll"], out["pred_pitch"], out["pred_general_vfov"]

    images = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, size=(batch, 640, 640, 3)),
        jnp.uint8,
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 320, 320, 3), jnp.float32)
    )
    return jax.jit(pipeline), params, images


def measure(fn, params, images, iters=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(params, images))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return images.shape[0] * iters / dt


def main():
    on_tpu = jax.default_backend() == "tpu"
    best = 0.0
    batches = [32, 64, 128] if on_tpu else [2]
    for use_pallas in ([True, False] if on_tpu else [False]):
        for batch in batches:
            try:
                fn, params, images = build_pipeline(batch, use_pallas)
                ips = measure(fn, params, images, iters=20 if on_tpu else 2)
                best = max(best, ips)
            except Exception:
                continue
    print(
        json.dumps(
            {
                "metric": "e2e_640px_inference_throughput",
                "value": round(best, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(best / BASELINE_PER_CHIP, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
