"""Lane-packed stage-1 attention kernel: kernel-body parity (interpret
mode), eligibility gate, fallbacks, and SRAttention routing.

Interpret-mode tests run the actual Pallas kernel body on CPU — the
token-pair lane packing, MPAD=128 KV masking, bb/row tiling, and the
in-kernel residual fold — against the shared _xla_reference. The on-TPU
numeric + perf check runs in tools/bench_stage1_attn.py.
"""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perspectivefields_tpu.kernels.fused_attention import _xla_reference
from perspectivefields_tpu.kernels.stage1_attention import (
    MPAD,
    eligible,
    stage1_attention,
)


def _inputs(rng, b, n, m, c=64):
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
    "b,n,m",
    [
        (1, 32, 16),     # minimal packed shape
        (2, 64, 5),      # KV pad 5 -> 128 masking
        (4, 128, 100),   # bb > 1 batch tiling, stage-1 M=100
        (1, 6400, 100),  # the real stage-1 token grid (row tiling engages)
    ],
)
def test_kernel_body_matches_xla_reference(b, n, m):
    rng = np.random.default_rng(b * 1000 + n + m)
    kw = _inputs(rng, b, n, m)
    got = stage1_attention(scale=64**-0.5, interpret=True, **kw)
    want = _xla_reference(num_heads=1, scale=64**-0.5, **kw)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_kernel_body_residual_fold():
    rng = np.random.default_rng(7)
    b, n, m = 2, 96, 10
    kw = _inputs(rng, b, n, m)
    res = jnp.asarray(rng.normal(size=(b, n, 64)), jnp.float32)
    got = stage1_attention(
        scale=64**-0.5, interpret=True, residual=res, **kw
    )
    want = res + _xla_reference(num_heads=1, scale=64**-0.5, **kw)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_eligibility_gate():
    assert eligible(6400, 64, 100, 1)          # the stage-1 shape
    assert not eligible(6400, 128, 100, 1)     # C != 64
    assert not eligible(6401, 64, 100, 1)      # odd N can't pack pairs
    assert not eligible(6400, 64, MPAD + 1, 1)  # KV set > one lane register
    assert not eligible(6400, 64, 100, 2)      # multi-head
    with pytest.raises(ValueError):
        rng = np.random.default_rng(0)
        stage1_attention(
            scale=64**-0.5, interpret=True, **_inputs(rng, 1, 31, 8)
        )


def test_non_tpu_backend_takes_xla_path(monkeypatch):
    """Without interpret, a CPU backend must route to _xla_reference and
    never build a Pallas program."""
    s1 = importlib.import_module(
        "perspectivefields_tpu.kernels.stage1_attention"
    )
    calls = []
    real = s1.pl.pallas_call

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(s1.pl, "pallas_call", spy)
    rng = np.random.default_rng(3)
    kw = _inputs(rng, 1, 64, 9)
    got = stage1_attention(scale=64**-0.5, **kw)
    want = _xla_reference(num_heads=1, scale=64**-0.5, **kw)
    assert not calls
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_sr_attention_folded_single_head(monkeypatch):
    """The folded single-head path (ATTN_STAGE1_FOLD — default OFF after a
    measured -2.1% e2e loss, PERF_NOTES round 5; kept as a tested opt-in)
    must match the plain einsum path: both N-row projections are
    algebraically folded into the M-row KV side, so the only deviation is
    float reassociation noise. Checks f32 + bf16, residual fold, gradient
    flow, and that the param tree is unchanged."""
    from perspectivefields_tpu.models import mit as mit_mod

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 48, 48, 64)), jnp.float32)
    res = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    plain = mit_mod.SRAttention(64, 1, sr_ratio=8, use_pallas=False)
    folded = mit_mod.SRAttention(64, 1, sr_ratio=8, use_pallas=True)
    p = jax.jit(plain.init)(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
        jax.jit(folded.init)(jax.random.PRNGKey(0), x)
    )

    assert not mit_mod.ATTN_STAGE1_FOLD  # default-off (measured e2e loss)
    monkeypatch.setattr(mit_mod, "ATTN_STAGE1_FOLD", True)
    y_plain = jax.jit(lambda p, a, r: plain.apply(p, a, residual=r))(p, x, res)
    y_fold = jax.jit(lambda p, a, r: folded.apply(p, a, residual=r))(p, x, res)
    np.testing.assert_allclose(
        np.asarray(y_fold), np.asarray(y_plain), atol=2e-5, rtol=1e-5
    )
    # flag off -> identical programs (bit-equal to the plain path)
    monkeypatch.setattr(mit_mod, "ATTN_STAGE1_FOLD", False)
    y_off = jax.jit(lambda p, a, r: folded.apply(p, a, residual=r))(p, x, res)
    np.testing.assert_array_equal(np.asarray(y_off), np.asarray(y_plain))
    monkeypatch.setattr(mit_mod, "ATTN_STAGE1_FOLD", True)

    # bf16 compute dtype: deviation bounded by bf16 resolution
    f16 = mit_mod.SRAttention(
        64, 1, sr_ratio=8, use_pallas=True, dtype=jnp.bfloat16
    )
    p16f = mit_mod.SRAttention(
        64, 1, sr_ratio=8, use_pallas=False, dtype=jnp.bfloat16
    )
    yb = jax.jit(p16f.apply)(p, x.astype(jnp.bfloat16))
    yf = jax.jit(f16.apply)(p, x.astype(jnp.bfloat16))
    scale = float(jnp.max(jnp.abs(yb.astype(jnp.float32)))) + 1e-6
    err = float(
        jnp.max(jnp.abs(yb.astype(jnp.float32) - yf.astype(jnp.float32)))
    )
    assert err / scale < 2e-2, (err, scale)

    # differentiable (the trainer may run with use_pallas=True on CPU mesh)
    g = jax.grad(lambda p: jnp.sum(folded.apply(p, x, residual=res) ** 2))(p)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(g))


def test_sr_attention_routes_stage1_shapes(monkeypatch):
    """SRAttention with stage-1 hyperparameters (dim 64, heads 1, sr 8,
    token grid above the gate) must take the stage-1 branch when the
    backend gate is forced on — and produce the plain path's numbers (the
    kernel falls back to its identical-math XLA path off-TPU). Also checks
    the param tree is unchanged by the routing."""
    from perspectivefields_tpu.models import mit as mit_mod

    monkeypatch.setattr(mit_mod, "_fused_backend_ok", lambda: True)
    monkeypatch.setattr(mit_mod, "ATTN_STAGE1_KERNEL", True)

    taken = []
    real = mit_mod.stage1_attention

    def spy(*a, **k):
        taken.append(1)
        return real(*a, **k)

    monkeypatch.setattr(mit_mod, "stage1_attention", spy)

    rng = np.random.default_rng(5)
    # 48x48 grid = 2304 tokens > ATTN_TOKEN_GATE (2048), sr 8 -> M=36
    x = jnp.asarray(rng.normal(size=(1, 48, 48, 64)), jnp.float32)
    plain = mit_mod.SRAttention(64, 1, sr_ratio=8, use_pallas=False)
    fused = mit_mod.SRAttention(64, 1, sr_ratio=8, use_pallas=True)
    p1 = jax.jit(plain.init)(jax.random.PRNGKey(0), x)
    p2 = jax.jit(fused.init)(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(
        p2
    )
    y1 = jax.jit(plain.apply)(p1, x)
    y2 = jax.jit(fused.apply)(p1, x)
    assert taken, "stage-1 branch was not taken"
    np.testing.assert_allclose(
        np.asarray(y2), np.asarray(y1), atol=2e-5, rtol=1e-5
    )
    # residual folding == external add
    res = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    yr1 = res + y1
    yr2 = jax.jit(lambda p, a, r: fused.apply(p, a, residual=r))(p1, x, res)
    np.testing.assert_allclose(
        np.asarray(yr2), np.asarray(yr1), atol=2e-5, rtol=1e-5
    )


def test_unaligned_row_tile_falls_back_to_xla(monkeypatch):
    """A shape that passes eligible() but whose packed row count has no
    sublane-aligned tiling (90x90 grid -> half=4050 = 2*3^4*5^2, no factor
    of 16) must take the XLA path instead of emitting a reshape Mosaic
    would reject."""
    s1 = importlib.import_module(
        "perspectivefields_tpu.kernels.stage1_attention"
    )
    calls = []
    real = s1.pl.pallas_call

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(s1.pl, "pallas_call", spy)
    rng = np.random.default_rng(9)
    kw = _inputs(rng, 1, 8100, 121)  # eligible: even N, M<=128, C=64
    got = stage1_attention(scale=64**-0.5, interpret=True, **kw)
    want = _xla_reference(num_heads=1, scale=64**-0.5, **kw)
    assert not calls, "unaligned half-rows must not reach pallas_call"
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )
