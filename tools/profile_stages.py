"""Stage-level timing of the inference pipeline on TPU.

Times each pipeline stage as its own jit program (batch x stage matrix) to
locate the bottleneck: device preprocess resize, backbone, heads, paramnet,
postprocess. Approximate (no overlap between stages when run separately), but
points the kernel work in the right direction.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(batch=64, use_pallas=True):
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
    u8 = jnp.asarray(rng.integers(0, 256, (batch, 640, 640, 3)), jnp.uint8)
    x320 = jnp.asarray(rng.normal(size=(batch, 320, 320, 3)), jnp.float32)

    results = {}

    # 1. device preprocess (640 -> 320 bf16 resize)
    pre = jax.jit(
        lambda im: resize_bilinear(im.astype(jnp.bfloat16), 320, 320, "pil_bilinear")
    )
    results["preprocess_resize"] = timeit(pre, u8)

    # 2. backbone
    bb = MixViT(cfg.backbone, jnp.bfloat16, use_pallas)
    bb_params = jax.jit(bb.init)(jax.random.PRNGKey(0), x320[:1])
    bb_fn = jax.jit(lambda p, x: bb.apply(p, x, deterministic=True))
    results["backbone"] = timeit(bb_fn, bb_params, x320)
    hl = bb_fn(bb_params, x320)

    # 3. low-level encoder + one head
    ll = LowLevelEncoder(dtype=jnp.bfloat16)
    ll_params = jax.jit(ll.init)(jax.random.PRNGKey(0), x320[:1])
    ll_fn = jax.jit(ll.apply)
    results["ll_enc"] = timeit(ll_fn, ll_params, x320)
    llf = ll_fn(ll_params, x320)

    head = SegFormerDecoder(2, dtype=jnp.bfloat16)
    head_params = jax.jit(head.init)(
        jax.random.PRNGKey(0), jax.tree.map(lambda a: a[:1], hl), llf[:1]
    )
    head_fn = jax.jit(head.apply)
    results["one_head"] = timeit(head_fn, head_params, hl, llf)
    g = head_fn(head_params, hl, llf)

    # 4. paramnet (full-res ConvNeXt variant)
    pn = ParamNetHead(cfg.param, cfg.recover_pp, jnp.bfloat16)
    field_g = jnp.asarray(rng.normal(size=(batch, 320, 320, 2)), jnp.float32)
    field_l = jnp.asarray(rng.normal(size=(batch, 320, 320, 1)), jnp.float32)
    pn_params = jax.jit(pn.init)(jax.random.PRNGKey(0), field_g[:1], field_l[:1])
    pn_fn = jax.jit(pn.apply)
    results["paramnet"] = timeit(pn_fn, pn_params, field_g, field_l)

    # 5. postprocess both fields to 640
    post = jax.jit(
        lambda gg, ll_: (
            jax.vmap(lambda p: postprocess_gravity(p, (320, 320), 640, 640))(gg),
            jax.vmap(lambda p: postprocess_latitude(p, (320, 320), 640, 640))(ll_),
        )
    )
    results["postprocess"] = timeit(post, field_g, field_l)

    # 6. full model for reference
    model = PersNet(cfg, dtype=jnp.bfloat16, use_pallas=use_pallas)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x320[:1])
    full = jax.jit(lambda p, x: model.apply(p, x, deterministic=True))
    results["full_forward"] = timeit(full, params, x320)

    print(f"batch={batch} pallas={use_pallas}")
    for k, v in results.items():
        print(f"  {k:20s} {v * 1e3:8.2f} ms  {batch / v:9.1f} img/s")


if __name__ == "__main__":
    main(batch=int(sys.argv[1]) if len(sys.argv) > 1 else 64,
         use_pallas=(sys.argv[2] != "0") if len(sys.argv) > 2 else True)
