"""Fused attention-block kernel: fallback identity + param-tree stability.

On non-TPU backends (these tests run on the CPU mesh) `fused_attention`
falls back to the unfused XLA path, so here we verify (a) use_pallas=True
produces identical params AND outputs to use_pallas=False, and (b) the
kernel's XLA reference matches the inline SRAttention math exactly. The
on-TPU numeric check (max rel err ~8e-3 at bf16, consistent with bf16
rounding) runs in tools/bench_fused_attn.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from perspectivefields_tpu.kernels.fused_attention import (
    _xla_reference,
    fused_attention,
)
from perspectivefields_tpu.models.mit import SRAttention


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
