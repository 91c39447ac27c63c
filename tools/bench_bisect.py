"""Bisect the e2e bench pipeline: time cumulative prefixes in one process.

Explains gaps between the sum of component times (profile_components.py)
and the e2e bench: each prefix is timed with the same K-loop-in-jit
methodology at bench shapes (B=128, bf16, 640px in/out). Params are passed
as arguments (closure capture would bake them as HLO constants and blow the
remote-compile request size).
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
    bb = MixViT(cfg.backbone, jnp.bfloat16, False)
    pbb = {"params": params["params"]["backbone"]}
    lle = LowLevelEncoder(dtype=jnp.bfloat16)
    pll = {"params": params["params"]["ll_enc"]}

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

    def fsum(t):
        return jnp.sum(jnp.asarray(t, jnp.float32))

    stages = {
        "1_pre": lambda p, u8: fsum(pre(u8)),
        "2_pre+ll": lambda p, u8: fsum(lle.apply(p[1], pre(u8))),
        "3_pre+backbone": lambda p, u8: sum(
            fsum(h) for h in bb.apply(p[0], pre(u8), True)
        ),
        "4_pre+backbone+ll": lambda p, u8: sum(
            fsum(h) for h in bb.apply(p[0], pre(u8), True)
        )
        + fsum(lle.apply(p[1], pre(u8))),
        "5_pre+full_model": lambda p, u8: (
            lambda out: fsum(out["pred_gravity"])
            + fsum(out["pred_latitude"])
            + fsum(out["pred_roll"])
        )(model.apply(p[2], pre(u8), deterministic=True)),
        "6_full_e2e": lambda p, u8: (
            lambda out: (lambda ul: fsum(ul[0]) + fsum(ul[1]))(post(out))
            + fsum(out["pred_roll"])
        )(model.apply(p[2], pre(u8), deterministic=True)),
    }

    allp = (pbb, pll, params)
    for name, fn in stages.items():
        def kfn(p, u8, fn=fn):
            def body(c, _):
                return c + fn(p, u8 + c.astype(jnp.uint8)), ()

            o, _ = lax.scan(body, jnp.float32(0.0), None, length=K)
            return o

        f = jax.jit(kfn)
        try:
            float(f(allp, img))
        except Exception as e:  # keep bisecting even if one stage fails
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(f(allp, img))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best / K * 1000:.2f} ms/batch "
              f"({B / (best / K):.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
