"""Tap-accumulation depthwise conv (ops/dwconv.py) parity vs the stock
nn.Conv grouped lowering, standalone and through MixFFN / ConvNeXtBlock
(same param tree, PF_DW_TAPS-gated)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perspectivefields_tpu.ops.dwconv import dwconv_taps


def _ref_conv(x, kernel, bias, pad, dtype):
    c = kernel.shape[-1]
    mod = nn.Conv(
        c, kernel_size=kernel.shape[:2], padding=pad,
        feature_group_count=c, dtype=dtype,
    )
    return mod.apply({"params": {"kernel": kernel, "bias": bias}}, x)


@pytest.mark.parametrize("k,pad", [(3, 1), (7, 3)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_dwconv_taps_matches_nn_conv(k, pad, dtype):
    rng = np.random.default_rng(k)
    x = jnp.asarray(rng.standard_normal((2, 10, 12, 16), np.float32), dtype)
    kernel = jnp.asarray(
        rng.standard_normal((k, k, 1, 16), np.float32) * 0.2, jnp.float32
    )
    bias = jnp.asarray(rng.standard_normal(16, np.float32) * 0.1, jnp.float32)
    got = dwconv_taps(x, kernel.astype(dtype), bias, pad=pad)
    want = _ref_conv(x, kernel, bias, pad, dtype)
    assert got.shape == want.shape and got.dtype == want.dtype
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=tol, atol=tol,
    )


def test_dwconv_taps_rejects_non_depthwise():
    x = jnp.zeros((1, 4, 4, 8))
    with pytest.raises(ValueError):
        dwconv_taps(x, jnp.zeros((3, 3, 8, 8)), pad=1)
    with pytest.raises(ValueError):
        dwconv_taps(x, jnp.zeros((3, 3, 1, 4)), pad=1)


def _ab_module(monkeypatch, module, x):
    """Apply `module` with PF_DW_TAPS off and on, same params; return both."""
    monkeypatch.delenv("PF_DW_TAPS", raising=False)
    params = module.init(jax.random.PRNGKey(0), x)
    base = module.apply(params, x)
    monkeypatch.setenv("PF_DW_TAPS", "1")
    taps = module.apply(params, x)
    return base, taps


def test_mixffn_taps_parity(monkeypatch):
    from perspectivefields_tpu.models.mit import MixFFN

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 8, 8, 24)), jnp.float32
    )
    base, taps = _ab_module(
        monkeypatch, MixFFN(hidden_dim=48, out_dim=24), x
    )
    np.testing.assert_allclose(
        np.asarray(taps), np.asarray(base), rtol=1e-5, atol=1e-5
    )


def test_convnext_block_taps_parity(monkeypatch):
    from perspectivefields_tpu.models.convnext import ConvNeXtBlock

    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 9, 9, 32)), jnp.float32
    )
    base, taps = _ab_module(monkeypatch, ConvNeXtBlock(dim=32), x)
    np.testing.assert_allclose(
        np.asarray(taps), np.asarray(base), rtol=1e-5, atol=1e-5
    )
