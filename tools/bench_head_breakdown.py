"""Head-internal breakdown with hoist-proof inputs (B=128, bf16, K=16).

profile_components fed the decode head scan-INVARIANT laterals, so XLA
hoisted everything not depending on the stride-4 map out of the timing
loop (measured 42.6 ms vs the ablation-true ~84 ms). Here every input is
coupled to the scan carry. Sections: embeds only; embeds+fusion chain;
+conv0; full head (phase tail).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = 128
K = 16
REPS = 3


def main():
    from perspectivefields_tpu.models.heads import SegFormerDecoder

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    hl_shapes = [(B, 80, 80, 64), (B, 40, 40, 128), (B, 20, 20, 320), (B, 10, 10, 512)]
    hl = [jnp.asarray(rng.normal(size=s) * 0.1, dt) for s in hl_shapes]
    ll = jnp.asarray(rng.normal(size=(B, 160, 160, 64)) * 0.1, dt)

    head = SegFormerDecoder(2, 768, 256, dt)
    params = head.init(jax.random.PRNGKey(0), [h[:1] for h in hl], ll[:1])

    # variants via monkeypatched forward sections is intrusive; instead time
    # (a) full head, (b) head with fuse_tail off (plain tail), (c) head with
    # fuse_embed off, to decompose by differences.
    variants = {
        "full (fuse_embed+fuse_tail)": SegFormerDecoder(2, 768, 256, dt),
        "plain tail": SegFormerDecoder(2, 768, 256, dt, fuse_tail=False),
        "plain embed": SegFormerDecoder(2, 768, 256, dt, fuse_embed=False),
    }
    for name, mod in variants.items():
        def kfn(p, l0, l1, l2, l3, ll_, mod=mod):
            def body(c, _):
                eps = c.astype(dt) * 1e-6
                y = mod.apply(p, [l0 + eps, l1 + eps, l2 + eps, l3 + eps], ll_ + eps)
                return c + jnp.mean(y.astype(jnp.float32)), ()

            o, _ = lax.scan(body, jnp.float32(0.0), None, length=K)
            return o

        f = jax.jit(kfn)
        float(f(params, *hl, ll))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(f(params, *hl, ll))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best / K * 1000:.2f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
