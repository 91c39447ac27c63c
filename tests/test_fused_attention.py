"""Fused attention-block kernel: kernel-body parity (interpret mode),
fallback identity, and param-tree stability.

The interpret-mode tests run the actual Pallas kernel body (_kernel) on CPU
— multi-head static slicing, KV sublane padding + -inf masking, bb/tn
tiling, the in-kernel residual fold, and the oversize-VMEM fallback gate —
against _xla_reference. The on-TPU numeric check (max rel err ~8e-3 at
bf16, consistent with bf16 rounding) ran in the (since-pruned) bench_fused_attn probe — PERF_NOTES.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perspectivefields_tpu.kernels.fused_attention import (
    _xla_reference,
    fused_attention,
)
from perspectivefields_tpu.models.mit import SRAttention


def _attn_inputs(rng, b, n, m, c):
    f32 = jnp.float32
    return dict(
        x=jnp.asarray(rng.normal(size=(b, n, c)), f32),
        kv_in=jnp.asarray(rng.normal(size=(b, m, c)), f32),
        wq=jnp.asarray(rng.normal(size=(c, c)) * 0.05, f32),
        bq=jnp.asarray(rng.normal(size=(c,)) * 0.01, f32),
        wkv=jnp.asarray(rng.normal(size=(c, 2 * c)) * 0.05, f32),
        bkv=jnp.asarray(rng.normal(size=(2 * c,)) * 0.01, f32),
        wproj=jnp.asarray(rng.normal(size=(c, c)) * 0.05, f32),
        bproj=jnp.asarray(rng.normal(size=(c,)) * 0.01, f32),
    )


@pytest.mark.parametrize(
    "b,n,m,c,heads",
    [
        (1, 16, 8, 64, 1),       # single head, aligned KV
        (2, 16, 5, 128, 2),      # multi-head slicing + KV pad 5->8 masking
        (4, 64, 7, 64, 1),       # bb > 1 batch tiling + KV masking
        (2, 100, 4, 128, 2),     # stage-3-like shapes (N=100 tokens, M=4)
    ],
)
def test_kernel_body_matches_xla_reference(b, n, m, c, heads):
    rng = np.random.default_rng(b * 1000 + n + m + c + heads)
    kw = _attn_inputs(rng, b, n, m, c)
    scale = (c // heads) ** -0.5
    got = fused_attention(num_heads=heads, scale=scale, interpret=True, **kw)
    want = _xla_reference(num_heads=heads, scale=scale, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5)


def test_kernel_body_tn_tiling_large_n():
    """N > 2048 engages the tn query-tile split (tn = largest divisor
    <= 1600 -> 1280 here), the stage-1/2 shape class."""
    rng = np.random.default_rng(11)
    b, n, m, c, heads = 1, 2560, 10, 64, 1
    kw = _attn_inputs(rng, b, n, m, c)
    scale = (c // heads) ** -0.5
    got = fused_attention(num_heads=heads, scale=scale, interpret=True, **kw)
    want = _xla_reference(num_heads=heads, scale=scale, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5)


def test_kernel_body_residual_fold():
    rng = np.random.default_rng(12)
    b, n, m, c, heads = 2, 24, 6, 128, 2
    kw = _attn_inputs(rng, b, n, m, c)
    res = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    scale = (c // heads) ** -0.5
    got = fused_attention(
        num_heads=heads, scale=scale, interpret=True, residual=res, **kw
    )
    want = res + _xla_reference(num_heads=heads, scale=scale, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5)


def test_oversize_tile_falls_back_to_xla(monkeypatch):
    """When even a single batch item overflows the VMEM budget the function
    must take the XLA path without ever building a Pallas program — and
    conversely a small shape must reach pallas_call."""
    import importlib

    # the kernels package re-exports the function under the same name, so a
    # plain dotted import resolves to the function — fetch the module itself
    fa = importlib.import_module("perspectivefields_tpu.kernels.fused_attention")

    calls = []
    real = fa.pl.pallas_call

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(fa.pl, "pallas_call", spy)
    rng = np.random.default_rng(13)
    # per_bb = tn*(c*24 + mpad*8) at f32; tn=n=2048, c=512 -> ~25 MB > budget
    kw = _attn_inputs(rng, 1, 2048, 8, 512)
    got = fused_attention(num_heads=1, scale=512**-0.5, interpret=True, **kw)
    want = _xla_reference(num_heads=1, scale=512**-0.5, **kw)
    assert not calls, "oversize shape should not reach pallas_call"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5)

    kw2 = _attn_inputs(rng, 1, 32, 8, 64)
    fused_attention(num_heads=1, scale=64**-0.5, interpret=True, **kw2)
    assert calls, "small shape should use the Pallas kernel"


def test_vmem_budget_attr_crosses_jit_boundary(monkeypatch):
    """Patching VMEM_BUDGET_MB must change the traced program for the SAME
    input shapes: the eager wrapper resolves the attribute into a static
    argument of the jitted body. (Regression: a nested-jit body reading
    the module attribute directly caches its jaxpr on avals only, so A/B
    probes patching the attribute silently re-measure the first variant.)"""
    import importlib

    fa = importlib.import_module("perspectivefields_tpu.kernels.fused_attention")

    calls = []
    real = fa.pl.pallas_call

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(fa.pl, "pallas_call", spy)
    rng = np.random.default_rng(7)
    kw = _attn_inputs(rng, 2, 64, 4, 64)
    args = dict(num_heads=1, scale=64**-0.5, interpret=True, **kw)

    # default budget: kernel path
    y_kernel = fused_attention(**args)
    assert calls, "default budget should reach pallas_call"

    # budget 0: same avals, but the patched attribute must reach the body
    # and force the XLA fallback (no new pallas_call)
    calls.clear()
    monkeypatch.setattr(fa, "VMEM_BUDGET_MB", 0)
    y_xla = fused_attention(**args)
    assert not calls, "budget=0 must fall back to XLA for identical shapes"
    np.testing.assert_allclose(
        np.asarray(y_kernel), np.asarray(y_xla), atol=2e-5, rtol=1e-5
    )


def test_use_pallas_param_tree_and_fallback_identity(monkeypatch):
    # Force the fused branch on the CPU mesh (fused_attention itself then
    # falls back to its identical-math XLA path) so the _DenseHolder param
    # tree and the residual plumbing are genuinely exercised off-TPU.
    from perspectivefields_tpu.models import mit as mit_mod

    monkeypatch.setattr(mit_mod, "_fused_backend_ok", lambda: True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 320)), jnp.float32)
    plain = SRAttention(320, 5, sr_ratio=2, use_pallas=False)
    fused = SRAttention(320, 5, sr_ratio=2, use_pallas=True)
    p1 = jax.jit(plain.init)(jax.random.PRNGKey(0), x)
    p2 = jax.jit(fused.init)(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    # holders must produce the same kernel/bias SHAPES as nn.Dense too
    assert jax.tree_util.tree_all(
        jax.tree.map(lambda a, b: a.shape == b.shape, p1, p2)
    )
    y1 = jax.jit(plain.apply)(p1, x)
    y2 = jax.jit(fused.apply)(p1, x)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=2e-5, rtol=1e-5)
    # residual folding == external add
    res = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    yr1 = res + jax.jit(plain.apply)(p1, x)
    yr2 = jax.jit(lambda p, a, r: fused.apply(p, a, residual=r))(p1, x, res)
    np.testing.assert_allclose(np.asarray(yr2), np.asarray(yr1), atol=2e-5, rtol=1e-5)


def test_xla_reference_matches_inline_math():
    rng = np.random.default_rng(1)
    b, n, m, c, h = 2, 16, 4, 128, 2
    dh = c // h
    x = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    kv_in = jnp.asarray(rng.normal(size=(b, m, c)), jnp.float32)
    wq = jnp.asarray(rng.normal(size=(c, c)) * 0.05, jnp.float32)
    bq = jnp.asarray(rng.normal(size=(c,)) * 0.01, jnp.float32)
    wkv = jnp.asarray(rng.normal(size=(c, 2 * c)) * 0.05, jnp.float32)
    bkv = jnp.asarray(rng.normal(size=(2 * c,)) * 0.01, jnp.float32)
    wp = jnp.asarray(rng.normal(size=(c, c)) * 0.05, jnp.float32)
    bp = jnp.asarray(rng.normal(size=(c,)) * 0.01, jnp.float32)
    scale = dh**-0.5

    got = fused_attention(x, kv_in, wq, bq, wkv, bkv, wp, bp, h, scale)

    q = (x @ wq + bq).reshape(b, n, h, dh)
    kv = (kv_in @ wkv + bkv).reshape(b, m, 2, h, dh)
    k, v = kv[:, :, 0], kv[:, :, 1]
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
    attn = jax.nn.softmax(attn, axis=-1)
    want = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c) @ wp + bp
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5)
    # and the module-level reference helper too
    ref = _xla_reference(x, kv_in, wq, bq, wkv, bkv, wp, bp, h, scale)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(want), atol=2e-5, rtol=1e-5)
