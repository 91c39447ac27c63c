"""Honest per-component TPU timing (K-loop inside one XLA program).

Under this environment's remote execution, block_until_ready does not reliably
wait, so each component is timed by running K iterations inside one jit
program (fori_loop with a data dependency) and reading back one scalar.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed_loop(apply_fn, params, x, batch, K=5, reps=3):
    """apply_fn(params, x) -> pytree; times K chained applications."""

    @functools.partial(jax.jit, static_argnames=("k",))
    def loop(p, xx, k):
        def body(i, acc):
            out = apply_fn(p, jax.tree.map(lambda a: a + acc * 1e-30, xx))
            leaves = jax.tree.leaves(out)
            return acc + jnp.sum(leaves[0]).astype(jnp.float32) * 1e-30

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    float(loop(params, x, k=K))  # compile + warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(params, x, k=K))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"  {apply_fn.__name__:18s} {best * 1e3:9.2f} ms  {batch / best:9.1f} img/s", flush=True)
    return best


def main(batch=64, use_pallas=True):
    from perspectivefields_tpu.config import model_zoo
    from perspectivefields_tpu.models import PersNet
    from perspectivefields_tpu.models.heads import LowLevelEncoder, SegFormerDecoder
    from perspectivefields_tpu.models.mit import MixViT
    from perspectivefields_tpu.models.paramnet import ParamNetHead

    cfg = model_zoo["Paramnet-360Cities-edina-centered"]["config"]
    rng = np.random.default_rng(0)
    x320 = jnp.asarray(rng.normal(size=(batch, 320, 320, 3)), jnp.float32)
    print(f"batch={batch} pallas={use_pallas}", flush=True)

    bb = MixViT(cfg.backbone, jnp.bfloat16, use_pallas)
    bb_params = jax.jit(bb.init)(jax.random.PRNGKey(0), x320[:1])

    def backbone(p, x):
        return bb.apply(p, x, deterministic=True)

    timed_loop(backbone, bb_params, x320, batch)
    hl = jax.jit(backbone)(bb_params, x320)

    ll = LowLevelEncoder(dtype=jnp.bfloat16)
    ll_params = jax.jit(ll.init)(jax.random.PRNGKey(0), x320[:1])
    llf = jax.jit(ll.apply)(ll_params, x320)

    head = SegFormerDecoder(2, dtype=jnp.bfloat16)
    head_params = jax.jit(head.init)(
        jax.random.PRNGKey(0), jax.tree.map(lambda a: a[:1], hl), llf[:1]
    )

    def one_head(p, inp):
        return head.apply(p, inp["hl"], inp["ll"])

    timed_loop(one_head, head_params, {"hl": hl, "ll": llf}, batch)

    pn = ParamNetHead(cfg.param, cfg.recover_pp, jnp.bfloat16)
    fg = jnp.asarray(rng.normal(size=(batch, 320, 320, 2)), jnp.float32)
    fl = jnp.asarray(rng.normal(size=(batch, 320, 320, 1)), jnp.float32)
    pn_params = jax.jit(pn.init)(jax.random.PRNGKey(0), fg[:1], fl[:1])

    def paramnet(p, inp):
        return pn.apply(p, inp["g"], inp["l"])

    timed_loop(paramnet, pn_params, {"g": fg, "l": fl}, batch)

    model = PersNet(cfg, dtype=jnp.bfloat16, use_pallas=use_pallas)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x320[:1])

    def full_forward(p, x):
        return model.apply(p, x, deterministic=True)

    timed_loop(full_forward, params, x320, batch)


if __name__ == "__main__":
    main(batch=int(sys.argv[1]) if len(sys.argv) > 1 else 64,
         use_pallas=(sys.argv[2] != "0") if len(sys.argv) > 2 else True)
