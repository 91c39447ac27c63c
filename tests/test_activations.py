"""Dtype-matched GELU: exhaustive bf16 accuracy evidence + f32 exactness.

The bf16 compute path uses the tanh GELU form (ops/activations.py). These
tests pin the claims that justify it:

1. f32 inputs take the exact-erf path bit-for-bit (reference parity mode
   unchanged).
2. Over ALL finite bf16 inputs, the tanh form mismatches the correctly
   rounded exact GELU about as often as XLA's erf path does (both are
   dominated by subnormal flushing) — i.e. the swap is accuracy-neutral at
   bf16 resolution.
3. In the normal activation range the disagreement between the two paths is
   at most a few bf16 ulp.
"""

import numpy as np
import jax
import jax.numpy as jnp
from scipy import special as sp

from perspectivefields_tpu.ops.activations import gelu


def _all_finite_bf16():
    bits = np.arange(65536, dtype=np.uint16)
    f32 = (bits.astype(np.uint32) << 16).view(np.float32)
    return f32[np.isfinite(f32)]


def _true_rounded_bf16(x32):
    x64 = x32.astype(np.float64)
    y = 0.5 * x64 * (1.0 + sp.erf(x64 / np.sqrt(2.0)))
    return np.asarray(jnp.asarray(y).astype(jnp.bfloat16), np.float32)


def _ulp_dist_bf16(a, b):
    ua = (a.view(np.uint32) >> 16).astype(np.int64)
    ub = (b.view(np.uint32) >> 16).astype(np.int64)
    oa = np.where(ua >= 0x8000, -(ua - 0x8000), ua)
    ob = np.where(ub >= 0x8000, -(ub - 0x8000), ub)
    return np.abs(oa - ob)


def test_f32_path_is_exact_erf():
    x = jnp.asarray(np.linspace(-10, 10, 4097), jnp.float32)
    got = np.asarray(gelu(x))
    want = np.asarray(jax.nn.gelu(x, approximate=False))
    np.testing.assert_array_equal(got, want)


def test_bf16_path_accuracy_matches_erf_path():
    x32 = _all_finite_bf16()
    xb = jnp.asarray(x32).astype(jnp.bfloat16)
    true_b = _true_rounded_bf16(x32)

    ours = np.asarray(gelu(xb), np.float32)
    erf_path = np.asarray(jax.nn.gelu(xb, approximate=False), np.float32)

    valid = ~(np.isnan(ours) & np.isnan(true_b))
    mism_ours = int((ours[valid] != true_b[valid]).sum())
    mism_erf = int((erf_path[valid] != true_b[valid]).sum())
    # both ~1600 of 65280 (subnormal flushing); the swap must not be
    # meaningfully worse than the erf lowering it replaces
    assert mism_ours <= mism_erf + 200, (mism_ours, mism_erf)


def test_bf16_absolute_error_not_worse_than_erf_path():
    """Global max |error| vs exact f64 GELU: the tanh path's 9.3e-3 is
    *smaller* than the erf path's 9.8e-3 — both are dominated by bf16
    output quantization at |x|~4, so the swap is accuracy-neutral."""
    x32 = _all_finite_bf16()
    sel = np.abs(x32) <= 1e4  # avoid inf-x edge handling noise
    x32 = x32[sel]
    xb = jnp.asarray(x32).astype(jnp.bfloat16)
    x64 = x32.astype(np.float64)
    true64 = 0.5 * x64 * (1.0 + sp.erf(x64 / np.sqrt(2.0)))
    ours = np.asarray(gelu(xb), np.float32).astype(np.float64)
    erf_path = np.asarray(jax.nn.gelu(xb, approximate=False), np.float32).astype(
        np.float64
    )
    assert np.abs(ours - true64).max() <= np.abs(erf_path - true64).max() + 1e-3


def test_bf16_core_range_ulp():
    """Where activations live (|x| <= 2): within a dozen bf16 ulp of the
    correctly-rounded exact GELU, bit-identical on ~70% of inputs. (The
    negative tail x < -2 has growing *relative* error — the standard
    tanh-form behavior — but its *absolute* error stays below the bf16
    quantization scale, covered by the test above.)"""
    x32 = _all_finite_bf16()
    sel = (np.abs(x32) >= 2.0**-10) & (np.abs(x32) <= 2.0)
    x32 = x32[sel]
    xb = jnp.asarray(x32).astype(jnp.bfloat16)
    ours = np.asarray(gelu(xb), np.float32)
    true_b = _true_rounded_bf16(x32)
    d = _ulp_dist_bf16(ours, true_b)
    assert int(d.max()) <= 16, (int(d.max()), x32[np.argmax(d)])
    assert (d == 0).mean() > 0.65, (d == 0).mean()
