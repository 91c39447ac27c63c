"""Fused MixFFN Pallas kernel vs the flax MixFFN (interpret mode).

kernels/mixffn.py fuses fc1 -> dw3x3 -> GELU -> fc2 in VMEM; must match
MixFFN exactly in f32 (GELU uses the A&S-polynomial erf, abs err 1.5e-7).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perspectivefields_tpu.kernels.mixffn import mixffn_fused
from perspectivefields_tpu.models.mit import Block, MixFFN


def _rand(p, rng, scale=0.3):
    return jax.tree.map(
        lambda a: jnp.asarray(rng.normal(size=a.shape) * scale, a.dtype), p
    )


@pytest.mark.parametrize(
    "h,w,c,hd,th,nb,pad",
    [
        (16, 16, 8, 32, 8, 1, False),
        (10, 10, 8, 32, 5, 2, False),
        (20, 12, 16, 64, 4, 1, False),
        (16, 16, 8, 32, None, None, True),  # 128-lane padding path
    ],
)
def test_fused_mixffn_matches_flax(h, w, c, hd, th, nb, pad):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, h, w, c)), jnp.float32)
    ffn = MixFFN(hd, c)
    p = _rand(ffn.init(jax.random.PRNGKey(1), x), rng)
    ref = ffn.apply(p, x)
    q = p["params"]
    got = mixffn_fused(
        x,
        q["fc1"]["kernel"], q["fc1"]["bias"],
        q["dwconv"]["kernel"], q["dwconv"]["bias"],
        q["fc2"]["kernel"], q["fc2"]["bias"],
        th=th, nb=nb, interpret=True, pad_lanes=pad,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-6, rtol=1e-5)


def test_block_fuse_ffn_same_tree_and_output():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 8)), jnp.float32)
    b0 = Block(dim=8, num_heads=2, sr_ratio=2)
    b1 = Block(dim=8, num_heads=2, sr_ratio=2, fuse_ffn=True)
    p = _rand(b0.init(jax.random.PRNGKey(0), x), rng)
    assert jax.tree.structure(p) == jax.tree.structure(
        b1.init(jax.random.PRNGKey(0), x)
    )
    y0 = b0.apply(p, x)
    y1 = b1.apply(p, x)  # kernel auto-interprets off-TPU
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=5e-6, rtol=1e-5)
