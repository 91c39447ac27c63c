"""Per-component timing of the e2e bench pipeline at bench shapes.

Times (K-loop-inside-jit, bf16, batch configurable): input resize 640->320,
backbone, one decode head, paramnet, postprocess-to-640. Keeps PERF_NOTES.md
honest when the model changes.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timeit(name, fn, *args, iters=4, reps=3):
    # block_until_ready does not sync under the remote relay — only a value
    # readback does. All benched fns return scalars; min over reps.
    f = jax.jit(fn)
    float(jnp.sum(jnp.asarray(f(*args), jnp.float32)))  # compile + sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(jnp.asarray(f(*args), jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    dt = best / iters * 1000
    print(f"{name}: {dt:.2f} ms/batch", flush=True)
    return dt


def kloop(body, iters):
    def run(x, *rest):
        def step(carry, _):
            y = body(carry, *rest)
            return carry + 1e-6 * jnp.mean(y).astype(carry.dtype), ()

        out, _ = lax.scan(step, x, None, length=iters)
        return jnp.sum(out[:1, :1, :1])

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()
    B, K = args.batch, args.iters

    from perspectivefields_tpu.config import model_zoo
    from perspectivefields_tpu.models import PersNet
    from perspectivefields_tpu.models.heads import LowLevelEncoder, SegFormerDecoder
    from perspectivefields_tpu.models.mit import MixViT
    from perspectivefields_tpu.models.paramnet import ParamNetHead
    from perspectivefields_tpu.ops.image import resize_bilinear
    from perspectivefields_tpu.ops.postprocess import (
        postprocess_gravity,
        postprocess_latitude,
    )

    cfg = model_zoo["Paramnet-360Cities-edina-centered"]["config"]
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    img640 = jnp.asarray(rng.integers(0, 256, size=(B, 640, 640, 3)), jnp.uint8)
    x320 = jnp.asarray(rng.normal(size=(B, 320, 320, 3)) * 50, dt)

    # input resize (carry IS the 640px batch so the op can't be hoisted)
    def resize_k(img):
        def step(carry, _):
            y = resize_bilinear(carry, 320, 320, "pil_bilinear")
            return carry + 1e-6 * jnp.mean(y).astype(carry.dtype), ()

        o, _ = lax.scan(step, img.astype(dt), None, length=K)
        return jnp.sum(o[:1, :1, :1])

    timeit("resize 640->320 (bf16)", resize_k, img640, iters=K)

    # backbone
    bb = MixViT(cfg.backbone, dt, False)
    pb = bb.init(jax.random.PRNGKey(0), x320[:1].astype(jnp.float32))

    def bb_fwd(x, p):
        return bb.apply(p, x, True)[0]

    timeit("backbone mit_b3", kloop(bb_fwd, K), x320, pb, iters=K)

    # one head (+ hl/ll fixed)
    hl_shapes = [(B, 80, 80, 64), (B, 40, 40, 128), (B, 20, 20, 320), (B, 10, 10, 512)]
    hl = [jnp.asarray(rng.normal(size=s) * 0.1, dt) for s in hl_shapes]
    ll = jnp.asarray(rng.normal(size=(B, 160, 160, 64)) * 0.1, dt)
    head = SegFormerDecoder(2, 768, 256, dt)
    ph = head.init(jax.random.PRNGKey(0), [h[:1] for h in hl], ll[:1])

    def head_fwd(l0, hl1, hl2, hl3, ll_, p):
        return head.apply(p, [l0, hl1, hl2, hl3], ll_)

    f = jax.jit(head_fwd)
    out = f(hl[0], hl[1], hl[2], hl[3], ll, ph)
    jax.block_until_ready(out)

    def head_k(l0, hl1, hl2, hl3, ll_, p):
        def step(carry, _):
            y = head.apply(p, [carry, hl1, hl2, hl3], ll_)
            return carry + 1e-6 * jnp.mean(y).astype(carry.dtype), ()

        o, _ = lax.scan(step, l0, None, length=K)
        return jnp.sum(o[:1, :1, :1])

    timeit("decode head (x1)", head_k, hl[0], hl[1], hl[2], hl[3], ll, ph, iters=K)

    # paramnet
    g = jnp.asarray(rng.normal(size=(B, 320, 320, 2)) * 0.3, dt)
    latf = jnp.asarray(rng.uniform(-1, 1, size=(B, 320, 320, 1)), dt)
    pn = ParamNetHead(cfg.param, cfg.recover_pp, dt)
    pp = pn.init(jax.random.PRNGKey(0), g[:1], latf[:1])

    def pn_k(g_, lat_, p):
        def step(carry, _):
            y = pn.apply(p, carry, lat_)["pred_roll"]
            return carry + 1e-6 * jnp.mean(y).astype(carry.dtype), ()

        o, _ = lax.scan(step, g_, None, length=K)
        return jnp.sum(o[:1, :1, :1])

    timeit("paramnet", pn_k, g, latf, pp, iters=K)

    # postprocess to 640
    def post(g_, lat_):
        up = jax.vmap(
            lambda p: postprocess_gravity(p, (320, 320), 640, 640, "regression")
        )(g_)
        la = jax.vmap(
            lambda p: postprocess_latitude(p, (320, 320), 640, 640, "regression")
        )(lat_)
        return jnp.sum(up[:1, :1, :1]) + jnp.sum(la[:1, :1, :1])

    def post_k(g_, lat_):
        def step(carry, _):
            y = post(carry, lat_)
            return carry + 1e-6 * y.astype(carry.dtype), ()

        o, _ = lax.scan(step, g_, None, length=K)
        return jnp.sum(o[:1, :1, :1])

    timeit("postprocess->640 (both fields)", post_k, g, latf, iters=K)


if __name__ == "__main__":
    main()
