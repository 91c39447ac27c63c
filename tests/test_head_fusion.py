"""Embed+proc fusion: fused single-conv path == reference two-op path."""

import jax
import jax.numpy as jnp
import numpy as np

from perspectivefields_tpu.models.heads import SegFormerDecoder


def test_fused_embed_proc_matches_plain():
    rng = np.random.default_rng(0)
    hl = [
        jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32),
        jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32),
        jnp.asarray(rng.normal(size=(2, 4, 4, 24)), jnp.float32),
        jnp.asarray(rng.normal(size=(2, 2, 2, 32)), jnp.float32),
    ]
    ll = jnp.asarray(rng.normal(size=(2, 32, 32, 64)), jnp.float32)

    plain = SegFormerDecoder(2, embed_dim=48, fusion_dim=16, fuse_embed=False)
    fused = SegFormerDecoder(2, embed_dim=48, fusion_dim=16, fuse_embed=True)
    params = jax.jit(plain.init)(jax.random.PRNGKey(0), hl, ll)
    # identical param trees
    import jax.tree_util as jtu

    p2 = jax.jit(fused.init)(jax.random.PRNGKey(0), hl, ll)
    assert jtu.tree_structure(params) == jtu.tree_structure(p2)

    out_plain = jax.jit(plain.apply)(params, hl, ll)
    out_fused = jax.jit(fused.apply)(params, hl, ll)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_plain), atol=5e-5
    )


def test_fused_tail_matches_plain():
    """Phase-packed subpixel tail == materialized upsample+conv path,
    including the 2px border frame (bilinear clamp + conv zero-pad)."""
    rng = np.random.default_rng(2)
    hl = [
        jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32),
        jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32),
        jnp.asarray(rng.normal(size=(2, 4, 4, 24)), jnp.float32),
        jnp.asarray(rng.normal(size=(2, 2, 2, 32)), jnp.float32),
    ]
    ll = jnp.asarray(rng.normal(size=(2, 32, 32, 64)), jnp.float32)

    plain = SegFormerDecoder(3, embed_dim=48, fusion_dim=16, fuse_tail=False)
    fused = SegFormerDecoder(3, embed_dim=48, fusion_dim=16, fuse_tail=True)
    params = jax.jit(plain.init)(jax.random.PRNGKey(3), hl, ll)
    import jax.tree_util as jtu

    p2 = jax.jit(fused.init)(jax.random.PRNGKey(3), hl, ll)
    assert jtu.tree_structure(params) == jtu.tree_structure(p2)

    out_plain = np.asarray(jax.jit(plain.apply)(params, hl, ll))
    out_fused = np.asarray(jax.jit(fused.apply)(params, hl, ll))
    assert out_plain.shape == out_fused.shape == (2, 64, 64, 3)
    # borders exact too
    np.testing.assert_allclose(out_fused, out_plain, atol=5e-5)


def test_fused_conv0_matches_plain():
    """Phase-composed fusion1-upsample+conv0 == materialized upsample path,
    including the 2px border frame (bilinear clamp + conv zero-pad)."""
    rng = np.random.default_rng(5)
    hl = [
        jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32),
        jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32),
        jnp.asarray(rng.normal(size=(2, 4, 4, 24)), jnp.float32),
        jnp.asarray(rng.normal(size=(2, 2, 2, 32)), jnp.float32),
    ]
    ll = jnp.asarray(rng.normal(size=(2, 32, 32, 64)), jnp.float32)

    plain = SegFormerDecoder(2, embed_dim=48, fusion_dim=16, fuse_conv0=False)
    fused = SegFormerDecoder(2, embed_dim=48, fusion_dim=16, fuse_conv0=True)
    params = jax.jit(plain.init)(jax.random.PRNGKey(7), hl, ll)
    import jax.tree_util as jtu

    p2 = jax.jit(fused.init)(jax.random.PRNGKey(7), hl, ll)
    assert jtu.tree_structure(params) == jtu.tree_structure(p2)

    out_plain = np.asarray(jax.jit(plain.apply)(params, hl, ll))
    out_fused = np.asarray(jax.jit(fused.apply)(params, hl, ll))
    assert out_plain.shape == out_fused.shape == (2, 64, 64, 2)
    np.testing.assert_allclose(out_fused, out_plain, atol=5e-5)


def test_fused_conv0_grad_matches_plain():
    """The composed path is trainable: gradients match the plain path."""
    rng = np.random.default_rng(6)
    hl = [
        jnp.asarray(rng.normal(size=(1, 8, 8, 8)), jnp.float32),
        jnp.asarray(rng.normal(size=(1, 4, 4, 16)), jnp.float32),
        jnp.asarray(rng.normal(size=(1, 2, 2, 24)), jnp.float32),
        jnp.asarray(rng.normal(size=(1, 1, 1, 32)), jnp.float32),
    ]
    ll = jnp.asarray(rng.normal(size=(1, 16, 16, 64)), jnp.float32)
    plain = SegFormerDecoder(2, embed_dim=48, fusion_dim=16, fuse_conv0=False)
    fused = SegFormerDecoder(2, embed_dim=48, fusion_dim=16, fuse_conv0=True)
    params = jax.jit(plain.init)(jax.random.PRNGKey(1), hl, ll)

    def loss(mod):
        def f(p):
            return jnp.sum(jnp.sin(mod.apply(p, hl, ll)))
        return f

    from jax.flatten_util import ravel_pytree

    g_plain = jax.jit(jax.grad(loss(plain)))(params)
    g_fused = jax.jit(jax.grad(loss(fused)))(params)
    flat_p, _ = ravel_pytree(g_plain)
    flat_f, _ = ravel_pytree(g_fused)
    np.testing.assert_allclose(
        np.asarray(flat_f), np.asarray(flat_p), atol=2e-4, rtol=1e-3
    )


def test_split_conv0_matches_concat_composition():
    """The decoder's split conv_fuse_conv0 equals conv over the concat."""
    import flax.linen as nn
    from jax import lax

    rng = np.random.default_rng(1)
    hl = [
        jnp.asarray(rng.normal(size=(1, 8, 8, 8)), jnp.float32),
        jnp.asarray(rng.normal(size=(1, 4, 4, 16)), jnp.float32),
        jnp.asarray(rng.normal(size=(1, 2, 2, 24)), jnp.float32),
        jnp.asarray(rng.normal(size=(1, 1, 1, 32)), jnp.float32),
    ]
    ll = jnp.asarray(rng.normal(size=(1, 16, 16, 64)), jnp.float32)
    dec = SegFormerDecoder(2, embed_dim=48, fusion_dim=16)
    params = jax.jit(dec.init)(jax.random.PRNGKey(0), hl, ll)
    out = jax.jit(dec.apply)(params, hl, ll)

    # reference composition for the tail's first conv, recomputed manually:
    # run the decoder pyramid up to _c1 by calling a decoder with identity
    # tail is hard; instead verify at the op level with the same kernel
    k = params["params"]["conv_fuse_conv0"]["kernel"]
    b = params["params"]["conv_fuse_conv0"]["bias"]
    a = jnp.asarray(rng.normal(size=(1, 16, 16, 16)), jnp.float32)
    llx = jnp.asarray(rng.normal(size=(1, 16, 16, 64)), jnp.float32)
    cat = jnp.concatenate([a, llx], axis=-1)
    want = lax.conv_general_dilated(
        cat, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    got = (
        lax.conv_general_dilated(
            a, k[:, :, :16, :], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + lax.conv_general_dilated(
            llx, k[:, :, 16:, :], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + b
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    assert out.shape == (1, 32, 32, 2)
