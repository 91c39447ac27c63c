"""Fused ConvNeXt-block Pallas kernel vs the flax block (interpret mode).

The kernel fuses dw7x7 + LayerNorm + MLP(GELU) + layer-scale + residual
(kernels/convnext_block.py); semantics must match ConvNeXtBlock exactly
(f32: to rounding; the kernel accumulates everything in f32).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perspectivefields_tpu.kernels.convnext_block import convnext_block_fused
from perspectivefields_tpu.models.convnext import ConvNeXt, ConvNeXtBlock


def _rand_params(p, rng, scale=0.3):
    return jax.tree.map(
        lambda a: jnp.asarray(rng.normal(size=a.shape) * scale, a.dtype), p
    )


def _run_fused(x, q, **kw):
    return convnext_block_fused(
        x,
        q["dwconv"]["kernel"],
        q["dwconv"]["bias"],
        q["norm"]["scale"],
        q["norm"]["bias"],
        q["pwconv1"]["kernel"],
        q["pwconv1"]["bias"],
        q["pwconv2"]["kernel"],
        q["pwconv2"]["bias"],
        q["gamma"],
        interpret=True,
        **kw,
    )


@pytest.mark.parametrize(
    "h,w,c,th,nb,pad",
    [
        (16, 16, 8, 8, 1, False),
        (10, 10, 8, 5, 2, False),
        (20, 12, 16, 4, 1, False),
        (16, 16, 8, None, None, False),
        # exercise the 128-lane channel-padding path the TPU build uses
        (16, 16, 8, 8, 1, True),
    ],
)
def test_fused_block_matches_flax(h, w, c, th, nb, pad):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, h, w, c)), jnp.float32)
    blk = ConvNeXtBlock(c)
    p = _rand_params(blk.init(jax.random.PRNGKey(1), x), rng)
    ref = blk.apply(p, x)
    got = _run_fused(x, p["params"], th=th, nb=nb, pad_lanes=pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_xla_fallback_matches_flax():
    """The oversize-tile XLA fallback (_xla_reference) must match the flax
    block like the kernel does — it's what large-channel stages get on TPU
    when even a minimal tile overflows scoped VMEM."""
    from perspectivefields_tpu.kernels.convnext_block import _xla_reference

    rng = np.random.default_rng(2)
    h, w, c = 12, 10, 8
    x = jnp.asarray(rng.normal(size=(2, h, w, c)), jnp.float32)
    blk = ConvNeXtBlock(c)
    p = _rand_params(blk.init(jax.random.PRNGKey(1), x), rng)
    ref = blk.apply(p, x)
    q = p["params"]
    got = _xla_reference(
        x,
        q["dwconv"]["kernel"],
        q["dwconv"]["bias"],
        q["norm"]["scale"],
        q["norm"]["bias"],
        q["pwconv1"]["kernel"],
        q["pwconv1"]["bias"],
        q["pwconv2"]["kernel"],
        q["pwconv2"]["bias"],
        q["gamma"],
        1e-6,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_flag_same_tree_and_output():
    """ConvNeXt(fused_blocks=True) has the identical param tree and (in
    interpret-capable sizes) output as the unfused model."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    m0 = ConvNeXt(num_classes=4, depths=(1, 1, 1, 1), dims=(8, 8, 16, 16))
    m1 = ConvNeXt(
        num_classes=4, depths=(1, 1, 1, 1), dims=(8, 8, 16, 16), fused_blocks=True
    )
    p = _rand_params(m0.init(jax.random.PRNGKey(0), x), rng)
    t0 = jax.tree.structure(p)
    t1 = jax.tree.structure(m1.init(jax.random.PRNGKey(0), x))
    assert t0 == t1
    y1 = m1.apply(p, x)  # kernel auto-interprets off-TPU
    y0 = m0.apply(p, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=2e-5, rtol=2e-5)
