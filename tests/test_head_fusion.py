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
