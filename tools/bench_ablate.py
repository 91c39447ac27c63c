"""Surgical e2e ablations at bench shapes: true in-context component costs.

Variants (B=128, bf16, K=16 to amortize the ~25-30 ms fixed dispatch
overhead): full pipeline; paramnet ablated; latitude head ablated; glue
(normalize/clamp) ablated. Differences give honest in-context costs that
standalone component benches misstate (layouts differ, XLA fuses across
boundaries, and the fixed overhead pollutes small numbers).
"""

import dataclasses
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


def main():
    from perspectivefields_tpu.config import model_zoo
    from perspectivefields_tpu.models import PersNet
    from perspectivefields_tpu.ops.image import resize_bilinear
    from perspectivefields_tpu.ops.postprocess import (
        postprocess_gravity,
        postprocess_latitude,
    )

    cfg = model_zoo["Paramnet-360Cities-edina-centered"]["config"]
    mean = jnp.asarray(cfg.pixel_mean)
    std = jnp.asarray(cfg.pixel_std)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, size=(B, 640, 640, 3)), jnp.uint8)

    variants = {
        "full": cfg,
        "no_paramnet": dataclasses.replace(cfg, param=None),
        "no_latitude": dataclasses.replace(cfg, latitude=None, param=None),
    }

    base_model = PersNet(cfg, dtype=jnp.bfloat16, use_pallas=True)
    params = jax.jit(base_model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 320, 320, 3), jnp.float32)
    )

    def pre(u8):
        x = resize_bilinear(u8.astype(jnp.bfloat16), 320, 320, "pil_bilinear")
        return (x.astype(jnp.float32) - mean) / std

    def post(out):
        s = jnp.float32(0)
        if "pred_gravity" in out:
            up = jax.vmap(
                lambda p: postprocess_gravity(p, (320, 320), 640, 640, "regression")
            )(out["pred_gravity"].astype(jnp.bfloat16))
            s += jnp.sum(up.astype(jnp.float32))
        if "pred_latitude" in out:
            la = jax.vmap(
                lambda p: postprocess_latitude(p, (320, 320), 640, 640, "regression")
            )(out["pred_latitude"].astype(jnp.bfloat16))
            s += jnp.sum(la.astype(jnp.float32))
        if "pred_roll" in out:
            s += jnp.sum(out["pred_roll"])
        return s

    for name, vcfg in variants.items():
        model = PersNet(vcfg, dtype=jnp.bfloat16, use_pallas=True)

        def e2e(p, u8, model=model):
            out = model.apply(p, pre(u8), deterministic=True)
            return post(out)

        def kfn(p, u8, e2e=e2e):
            def body(c, _):
                return c + e2e(p, u8 + c.astype(jnp.uint8)), ()

            o, _ = lax.scan(body, jnp.float32(0.0), None, length=K)
            return o

        f = jax.jit(kfn)
        try:
            float(f(params, img))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
            continue
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(f(params, img))
            best = min(best, time.perf_counter() - t0)
        ms = best / K * 1000
        print(f"{name}: {ms:.2f} ms/batch ({B / (best / K):.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
