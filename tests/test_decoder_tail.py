"""Fused decoder-tail kernel vs the unfused XLA composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perspectivefields_tpu.kernels.decoder_tail import (
    decoder_tail,
    xla_decoder_tail,
)


def _mk(b=2, h=32, w=24, ca=12, cl=6, c0=8, c1=4, co=2, seed=0):
    r = np.random.default_rng(seed)
    return dict(
        a=jnp.asarray(r.normal(size=(b, h, w, ca)), jnp.float32),
        ll=jnp.asarray(r.normal(size=(b, h, w, cl)), jnp.float32),
        w0=jnp.asarray(r.normal(size=(3, 3, ca + cl, c0)) * 0.2, jnp.float32),
        b0=jnp.asarray(r.normal(size=(c0,)), jnp.float32),
        w1=jnp.asarray(r.normal(size=(3, 3, c0, c1)) * 0.2, jnp.float32),
        b1=jnp.asarray(r.normal(size=(c1,)), jnp.float32),
        wp=jnp.asarray(r.normal(size=(1, 1, c1, co)) * 0.5, jnp.float32),
        bp=jnp.asarray(r.normal(size=(co,)), jnp.float32),
    )


def test_xla_tail_matches_unfused_model_composition():
    """xla_decoder_tail reproduces the SegFormerDecoder tail ops exactly."""
    from perspectivefields_tpu.ops.image import resize_bilinear

    kw = _mk()
    out = xla_decoder_tail(**kw)
    # manual composition
    x = jnp.concatenate([kw["a"], kw["ll"]], axis=-1)
    from jax import lax

    x = lax.conv_general_dilated(
        x, kw["w0"], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + kw["b0"]
    x = jax.nn.relu(x)
    x = resize_bilinear(x, 64, 48, "torch_bilinear")
    x = lax.conv_general_dilated(
        x, kw["w1"], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + kw["b1"]
    x = jax.nn.relu(x)
    x = jnp.einsum("bhwc,co->bhwo", x, kw["wp"][0, 0]) + kw["bp"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


@pytest.mark.parametrize("tile_rows", [8, 16, 32])
def test_fused_kernel_matches_xla_interpret(tile_rows):
    kw = _mk()
    want = np.asarray(xla_decoder_tail(**kw))
    got = np.asarray(decoder_tail(**kw, tile_rows=tile_rows, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fused_kernel_single_tile_interpret():
    kw = _mk(h=16, w=16)
    want = np.asarray(xla_decoder_tail(**kw))
    got = np.asarray(decoder_tail(**kw, tile_rows=16, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4)
