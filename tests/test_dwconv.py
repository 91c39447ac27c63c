"""Tap-accumulation depthwise conv (ops/dwconv.py) parity vs the stock
nn.Conv grouped lowering. The op is a measured-losing probe alternative
(PERF_NOTES.md round 3: 451 vs 625 img/s e2e) — nothing in the production
forwards calls it; these tests keep the op itself correct and prove it
remains drop-in param-compatible with the models' nn.Conv dwconvs."""

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


@pytest.mark.parametrize(
    "builder,k,pad",
    [
        (
            lambda: __import__(
                "perspectivefields_tpu.models.mit", fromlist=["MixFFN"]
            ).MixFFN(hidden_dim=48, out_dim=24),
            3,
            1,
        ),
        (
            lambda: __import__(
                "perspectivefields_tpu.models.convnext", fromlist=["ConvNeXtBlock"]
            ).ConvNeXtBlock(dim=24),
            7,
            3,
        ),
    ],
    ids=["mixffn", "convnext_block"],
)
def test_taps_drop_in_compatible_with_model_dwconv(builder, k, pad):
    """The production modules' dwconv param trees still feed dwconv_taps
    directly: probe code can inject the op without any param remapping."""
    module = builder()
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 8, 8, 24)), jnp.float32
    )
    params = module.init(jax.random.PRNGKey(0), x)
    dw = jax.tree_util.tree_map(
        lambda a: a, params["params"]["dwconv"]
    )
    assert dw["kernel"].shape == (k, k, 1, dw["kernel"].shape[-1])
    hid = jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (2, 8, 8, dw["kernel"].shape[-1])
        ),
        jnp.float32,
    )
    got = dwconv_taps(hid, dw["kernel"], dw["bias"], pad=pad)
    want = _ref_conv(hid, dw["kernel"], dw["bias"], pad, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
