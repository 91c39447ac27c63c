"""Section-level decode-head probe with hoist-proof inputs (B=128, bf16,
K=16): embeds, fusion chain, conv0+tail — measured as standalone graphs at
the real shapes, every input coupled to the scan carry."""

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


def timeit(name, make_mod, inputs):
    """make_mod() -> (module, apply_fn(params, *arrays))."""
    mod, apply_fn = make_mod()
    params = jax.jit(
        lambda *a: mod.init(jax.random.PRNGKey(0), *[x[:1] for x in a])
    )(*inputs)

    def kfn(p, *arrays):
        def body(c, _):
            eps = c.astype(arrays[0].dtype) * 1e-6
            y = apply_fn(p, *[a + eps for a in arrays])
            return c + jnp.mean(y.astype(jnp.float32)), ()

        o, _ = lax.scan(body, jnp.float32(0.0), None, length=K)
        return o

    f = jax.jit(kfn)
    float(f(params, *inputs))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(f(params, *inputs))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best / K * 1000:.2f} ms/batch", flush=True)


def main():
    from perspectivefields_tpu.models.heads import (
        FeatureFusionBlock,
        ResidualConvUnit,
        SegFormerDecoder,
    )

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    # (a) the four fused embed_proc convs (inputs at real backbone shapes)
    hl = [
        jnp.asarray(rng.normal(size=(B, s, s, c)) * 0.1, dt)
        for s, c in [(80, 64), (40, 128), (20, 320), (10, 512)]
    ]
    ll = jnp.asarray(rng.normal(size=(B, 160, 160, 64)) * 0.1, dt)

    # embed section == 4 convs 3x3 Cin->256 at the four scales (the fused
    # embed+proc composition); measure as plain convs with those shapes.
    class EmbedConvs(nn.Module):
        @nn.compact
        def __call__(self, c1, c2, c3, c4):
            outs = []
            for i, c in enumerate([c1, c2, c3, c4]):
                outs.append(
                    nn.Conv(256, (3, 3), padding=1, dtype=dt, name=f"e{i}")(c)
                )
            return sum(jnp.mean(o.astype(jnp.float32)) for o in outs)

    timeit("embeds (4x conv3x3 ->256)", lambda: (EmbedConvs(), lambda p, *a: EmbedConvs().apply(p, *a)), hl)

    # (b) fusion chain: fusion4..fusion1 at real shapes
    class Chain(nn.Module):
        @nn.compact
        def __call__(self, e1, e2, e3, e4):
            x = FeatureFusionBlock(256, True, dt, name="f4")(e4)
            x = FeatureFusionBlock(256, False, dt, name="f3")(x, e3)
            x = FeatureFusionBlock(256, False, dt, name="f2")(x, e2)
            x = FeatureFusionBlock(256, False, dt, name="f1")(x, e1)
            return x

    es = [
        jnp.asarray(rng.normal(size=(B, s, s, 256)) * 0.1, dt)
        for s in (80, 40, 20, 10)
    ]
    timeit("fusion chain (f4->f1, out 160^2)", lambda: (Chain(), lambda p, *a: Chain().apply(p, *a)), es)

    # (c) conv0 + phase tail, inputs at 160^2
    class Tail(nn.Module):
        @nn.compact
        def __call__(self, a, ll_):
            # same ops/shapes as the decoder tail: split conv0 + relu +
            # the real phase-packed _fused_tail
            x = nn.Conv(64, (3, 3), padding=1, dtype=dt, name="c0a")(a)
            x = x + nn.Conv(64, (3, 3), padding=1, dtype=dt, name="c0b")(ll_)
            x = nn.relu(x)
            from perspectivefields_tpu.models.heads import _ConvParams

            cf1 = _ConvParams(3, 3, 64, 32, name="cf1")
            pred = _ConvParams(1, 1, 32, 2, name="pred")
            dmod = SegFormerDecoder(2, 768, 256, dt)
            return dmod._fused_tail(x, cf1, pred)

    a160 = jnp.asarray(rng.normal(size=(B, 160, 160, 256)) * 0.1, dt)
    timeit("conv0+phase tail (160^2 -> 320^2)", lambda: (Tail(), lambda p, *x: Tail().apply(p, *x)), [a160, ll])


if __name__ == "__main__":
    main()
