"""Bisect the e2e bench pipeline: time cumulative prefixes in one process.

Explains the gap between the sum of component times (profile_components.py)
and the e2e bench: each prefix is timed with the same K-loop-in-jit
methodology at bench shapes (B=128, bf16, 640px in/out).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = 128
K = 4
REPS = 3


def main():
    from perspectivefields_tpu.config import model_zoo
    from perspectivefields_tpu.models import PersNet
    from perspectivefields_tpu.models.heads import LowLevelEncoder
    from perspectivefields_tpu.models.mit import MixViT
    from perspectivefields_tpu.ops.image import resize_bilinear
    from perspectivefields_tpu.ops.postprocess import (
        postprocess_gravity,
        postprocess_latitude,
    )

    cfg = model_zoo["Paramnet-360Cities-edina-centered"]["config"]
    model = PersNet(cfg, dtype=jnp.bfloat16, use_pallas=False)
    mean = jnp.asarray(cfg.pixel_mean)
    std = jnp.asarray(cfg.pixel_std)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, size=(B, 640, 640, 3)), jnp.uint8)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 320, 320, 3), jnp.float32)
    )

    def pre(images_u8):
        x = resize_bilinear(images_u8.astype(jnp.bfloat16), 320, 320, "pil_bilinear")
        return (x.astype(jnp.float32) - mean) / std

    def post(out):
        up = jax.vmap(
            lambda p: postprocess_gravity(p, (320, 320), 640, 640, "regression")
        )(out["pred_gravity"].astype(jnp.bfloat16))
        la = jax.vmap(
            lambda p: postprocess_latitude(p, (320, 320), 640, 640, "regression")
        )(out["pred_latitude"].astype(jnp.bfloat16))
        return up, la

    stages = {}
    stages["1_pre"] = lambda u8: jnp.sum(pre(u8).astype(jnp.float32))

    bb = MixViT(cfg.backbone, jnp.bfloat16, False)
    pbb = {"params": params["params"]["backbone"]}
    lle = LowLevelEncoder(dtype=jnp.bfloat16)
    pll = {"params": params["params"]["ll_enc"]}

    def s2(u8):
        x = pre(u8)
        hl = bb.apply(pbb, x, True)
        ll = lle.apply(pll, x)
        return sum(jnp.sum(h.astype(jnp.float32)) for h in hl) + jnp.sum(
            ll.astype(jnp.float32)
        )

    stages["2_pre+backbone+ll"] = s2

    def s3(u8):
        x = pre(u8)
        out = model.apply(params, x, deterministic=True)
        return jnp.sum(out["pred_gravity"].astype(jnp.float32)) + jnp.sum(
            out["pred_latitude"].astype(jnp.float32)
        ) + jnp.sum(out["pred_roll"])

    stages["3_pre+full_model"] = s3

    def s4(u8):
        x = pre(u8)
        out = model.apply(params, x, deterministic=True)
        up, la = post(out)
        return (
            jnp.sum(up.astype(jnp.float32))
            + jnp.sum(la.astype(jnp.float32))
            + jnp.sum(out["pred_roll"])
        )

    stages["4_full_e2e"] = s4

    for name, fn in stages.items():
        def kfn(u8, fn=fn):
            def body(c, _):
                return c + fn(u8 + c.astype(jnp.uint8)), ()

            o, _ = lax.scan(body, jnp.float32(0.0), None, length=K)
            return o

        f = jax.jit(kfn)
        float(f(img))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(f(img))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best / K * 1000:.2f} ms/batch "
              f"({B / (best / K):.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
