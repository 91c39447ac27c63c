"""Whole-block fused kernel (kernels/fused_block.py) parity.

Two layers of evidence, both on the CPU mesh:
* interpret-mode runs of the Pallas kernel body against the XLA reference
  composition — exercises the in-kernel LN2 moments, the zero-padded
  dwconv taps, KV padding, multi-head slicing, and bb>1 tiling;
* the XLA reference composition against an actual flax ``Block`` apply —
  proves the composition implements the module chain's semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from perspectivefields_tpu.kernels.fused_block import (
    _xla_reference,
    fused_block,
    fused_block_viable,
)


def _weights(rng, c, hdim, dt):
    w = lambda *s: jnp.asarray(rng.normal(size=s) * 0.05, dt)
    return dict(
        wq=w(c, c), bq=w(c), wkv=w(c, 2 * c), bkv=w(2 * c),
        wproj=w(c, c), bproj=w(c),
        ln2s=jnp.asarray(1.0 + 0.1 * rng.normal(size=(c,)), dt),
        ln2b=w(c),
        w1=w(c, hdim), b1=w(hdim),
        dwk=w(3, 3, 1, hdim), dwb=w(hdim),
        w2=w(hdim, c), b2=w(c),
    )


@pytest.mark.parametrize(
    "b,h,w,c,heads,m,dt",
    [
        (4, 5, 5, 128, 2, 7, jnp.float32),   # mpad 7->8, odd grid, bb=4
        (2, 4, 8, 128, 2, 8, jnp.bfloat16),  # rectangular grid, bf16 gelu
        (1, 10, 10, 320, 5, 25, jnp.bfloat16),  # stage-3-like: 5 heads
    ],
)
def test_kernel_matches_reference_interpret(b, h, w, c, heads, m, dt):
    rng = np.random.default_rng(0)
    n = h * w
    ws = _weights(rng, c, 4 * c, dt)
    ln1x = jnp.asarray(rng.normal(size=(b, n, c)) * 0.5, dt)
    kv = jnp.asarray(rng.normal(size=(b, m, c)) * 0.5, dt)
    res = jnp.asarray(rng.normal(size=(b, n, c)) * 0.5, dt)
    scale = (c / heads) ** -0.5
    got = fused_block(
        ln1x, kv, res, *ws.values(), heads, scale, h, w, interpret=True
    )
    want = _xla_reference(
        ln1x, kv, res, *ws.values(), heads, scale, h, w, 1e-6
    )
    tol = 1e-5 if dt == jnp.float32 else 0.05
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=tol
    )


@pytest.mark.parametrize("dt,interpret", [
    (jnp.float32, False),
    (jnp.float32, True),
    (jnp.bfloat16, True),
])
def test_reference_matches_flax_block(dt, interpret):
    """The composition (and, with interpret, the kernel itself) reproduces
    models/mit.py Block at sr_ratio=1 where kv_in == ln1(x)."""
    import flax.linen as nn

    from perspectivefields_tpu.models.mit import Block

    b, h, w, c, heads = 2, 4, 4, 128, 2
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)) * 0.5, dt)
    block = Block(dim=c, num_heads=heads, sr_ratio=1, dtype=dt)
    params = block.init(jax.random.PRNGKey(0), x[:1])["params"]
    want = block.apply({"params": params}, x, True)

    ln1 = nn.LayerNorm(epsilon=1e-6, dtype=dt).apply(
        {"params": params["norm1"]}, x
    ).reshape(b, h * w, c)
    a = params["attn"]
    f = params["mlp"]
    args = (
        ln1, ln1, x.reshape(b, h * w, c).astype(dt),
        a["q"]["kernel"].astype(dt), a["q"]["bias"].astype(dt),
        a["kv"]["kernel"].astype(dt), a["kv"]["bias"].astype(dt),
        a["proj"]["kernel"].astype(dt), a["proj"]["bias"].astype(dt),
        params["norm2"]["scale"].astype(dt), params["norm2"]["bias"].astype(dt),
        f["fc1"]["kernel"].astype(dt), f["fc1"]["bias"].astype(dt),
        f["dwconv"]["kernel"].astype(dt), f["dwconv"]["bias"].astype(dt),
        f["fc2"]["kernel"].astype(dt), f["fc2"]["bias"].astype(dt),
    )
    scale = (c / heads) ** -0.5
    got = fused_block(*args, heads, scale, h, w, interpret=interpret)
    tol = 2e-5 if dt == jnp.float32 else 0.05
    np.testing.assert_allclose(
        np.asarray(got, np.float32).reshape(b, h, w, c),
        np.asarray(want, np.float32),
        atol=tol,
    )


def test_viability_gate():
    # stage 3 (n=400, c=320) and stage 4 (n=100, c=512) fit
    assert fused_block_viable(128, 400, 320, 1280, 100, 5)
    assert fused_block_viable(128, 100, 512, 2048, 100, 8)
    # stage 1 is token-count gated; stage 2 overflows the VMEM budget
    assert not fused_block_viable(128, 6400, 64, 256, 100, 1)
    assert not fused_block_viable(128, 1600, 128, 512, 100, 2)
    # f32 (itemsize 4) overflows at the stage-3 shapes bf16 admits — the
    # gate must agree with the kernel's own budget check, or f32 models pay
    # the kernel's param plumbing only to fall back inside
    assert not fused_block_viable(128, 400, 320, 1280, 100, 5, itemsize=4)


def test_backbone_fuse_block_same_tree_and_outputs(monkeypatch):
    """MixViT with fuse_block on consumes the SAME param tree as the plain
    path and produces the same features (CPU: the kernel wrapper takes its
    identical-math XLA composition, so this proves the module wiring,
    parameter-tree compatibility, and gating)."""
    from perspectivefields_tpu.config import BackboneConfig
    from perspectivefields_tpu.models import mit

    monkeypatch.setattr(mit, "_fused_backend_ok", lambda: True)
    calls = []
    real = mit.fused_block
    monkeypatch.setattr(
        mit, "fused_block", lambda *a, **k: calls.append(1) or real(*a, **k)
    )
    spec = BackboneConfig(
        dims=(32, 64, 128, 256),
        depths=(1, 1, 2, 1),
        num_heads=(1, 1, 2, 4),
        sr_ratios=(8, 4, 2, 1),
    )
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    plain = mit.MixViT(spec, dtype=jnp.float32)
    fused = mit.MixViT(spec, dtype=jnp.float32, fuse_block=True)
    params = plain.init(jax.random.PRNGKey(0), x[:1])["params"]
    # identical tree: fused init produces the same structure
    fparams = fused.init(jax.random.PRNGKey(0), x[:1])["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        fparams
    )
    outs_p = plain.apply({"params": params}, x, True)
    calls.clear()
    outs_f = fused.apply({"params": params}, x, True)
    # head_dim gates stage 1 (32) out; stages 2-4 (64) take the fused path
    assert len(calls) == 4
    for op, of in zip(outs_p, outs_f):
        np.testing.assert_allclose(
            np.asarray(of), np.asarray(op), atol=2e-5, rtol=1e-5
        )
