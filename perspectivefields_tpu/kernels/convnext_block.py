"""Fused ConvNeXt block kernel (Pallas TPU): 7x7 depthwise conv + LayerNorm
+ pointwise MLP (GELU) + layer-scale + residual in one VMEM-resident pass.

ParamNet's ConvNeXt trunk (reference: modeling/backbone/convnext.py:16-60)
is the most VPU-bound component of the flagship model: the 7x7 depthwise
conv alone is ~50 ms/batch at B=128 under XLA, and each block makes ~6 HBM
round trips of the activation tensor (dwconv out, LN out, 4x-expanded MLP
in/out, layer scale, residual). This kernel tiles images over rows, DMAs a
halo'd row-tile once, and computes the whole block from VMEM:

  dw 7x7: 7 sublane-shifted column windows x 7 free row shifts, f32 vreg
          accumulation (no materialized shifted copies);
  LN:     lane-dim (channel) moments in f32;
  MLP:    two MXU matmuls (C -> 4C -> C) with f32 accumulation, exact
          erf-GELU between;
  out:    x + gamma * mlp  (residual read from the same VMEM tile).

Numerics: all reductions/accumulations in f32 regardless of compute dtype,
so the fused path is at least as precise as the unfused XLA bf16 path.
Verified against the flax ConvNeXtBlock in tests/test_convnext_kernel.py
(interpret mode on CPU + real TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf_f32(x):
    """f32 erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7) — Mosaic
    has no erf primitive; exp is supported. Used in interpret mode too so
    tests exercise the same numerics that run on hardware."""
    a1, a2, a3 = jnp.float32(0.254829592), jnp.float32(-0.284496736), jnp.float32(1.421413741)
    a4, a5 = jnp.float32(-1.453152027), jnp.float32(1.061405429)
    p = jnp.float32(0.3275911)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t * jnp.exp(-ax * ax)
    return s * y


def _gelu_exact_f32(x):
    """erf-based GELU (torch nn.GELU default; convnext.py:38) in f32."""
    return 0.5 * x * (1.0 + _erf_f32(x * jnp.float32(0.7071067811865476)))


def _gelu_tanh_f32(x):
    """tanh-form GELU in f32 (the bf16 compute-mode form; activations.py)."""
    c = jnp.float32(0.7978845608028654)  # sqrt(2/pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + jnp.float32(0.044715) * (x * x * x))))


def _gelu_f32(x, compute_dtype):
    """Match ops.activations.gelu's dtype rule inside kernels (f32 math)."""
    if compute_dtype == jnp.bfloat16:
        return _gelu_tanh_f32(x)
    return _gelu_exact_f32(x)


def _block_kernel(
    x_hbm, dwk, dwb, lns, lnb, w1, b1, w2, b2, gamma, out_ref, xbuf, sem,
    *, nb, th, w, c, c_real, eps,
):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(bi * nb, nb), pl.ds(i * th, th + 6)], xbuf, sem
    )
    cp.start()
    cp.wait()

    # depthwise 7x7 (padding handled by the caller's zero-pad): for each of
    # the 7 column offsets take one shifted window, then the 7 row offsets
    # are free slices of the untiled row dim.
    acc = jnp.zeros((nb, th, w, c), jnp.float32)
    for dq in range(7):
        xdq = xbuf[:, :, dq : dq + w, :]  # (nb, th+6, w, c)
        for dp in range(7):
            tap = dwk[dp, dq].astype(jnp.float32)  # (c,)
            acc = acc + xdq[:, dp : dp + th].astype(jnp.float32) * tap
    z = acc + dwb[:].astype(jnp.float32)

    # LayerNorm over channels, f32 moments. Fast variance (E[x^2] - E[x]^2)
    # to match flax nn.LayerNorm's default bit-for-bit. Channel padding (for
    # Mosaic's 128-lane DMA alignment) is zero through the whole pipeline
    # (zero taps/bias/scale), so sums over the padded lane dim divided by
    # the REAL channel count give exact moments.
    inv_c = jnp.float32(1.0 / c_real)
    mu = jnp.sum(z, axis=-1, keepdims=True) * inv_c
    var = jnp.sum(z * z, axis=-1, keepdims=True) * inv_c - mu * mu
    y = (z - mu) * jax.lax.rsqrt(var + eps)
    y = y * lns[:].astype(jnp.float32) + lnb[:].astype(jnp.float32)

    # pointwise MLP on the MXU, f32 accumulation
    cdt = xbuf.dtype
    m = jnp.dot(
        y.reshape(nb * th * w, c).astype(cdt),
        w1[:],
        preferred_element_type=jnp.float32,
    ) + b1[:].astype(jnp.float32)
    g = _gelu_f32(m, cdt)
    h = jnp.dot(
        g.astype(cdt), w2[:], preferred_element_type=jnp.float32
    ) + b2[:].astype(jnp.float32)
    h = h.reshape(nb, th, w, c) * gamma[:].astype(jnp.float32)

    x_res = xbuf[:, 3 : 3 + th, 3 : 3 + w, :].astype(jnp.float32)
    out_ref[:] = (x_res + h).astype(out_ref.dtype)


def _xla_reference(x, dwk, dwb, lns, lnb, w1, b1, w2, b2, gamma, eps):
    """Unfused block with the kernel's exact numerics (f32 accumulation,
    dtype-matched GELU) — the fallback when a tile cannot fit scoped VMEM."""
    cdt = x.dtype
    c = x.shape[-1]
    z = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        dwk.astype(jnp.float32),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    ) + dwb.astype(jnp.float32)
    mu = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(z * z, axis=-1, keepdims=True) - mu * mu
    y = (z - mu) * jax.lax.rsqrt(var + jnp.float32(eps))
    y = y * lns.astype(jnp.float32) + lnb.astype(jnp.float32)
    m = jnp.dot(
        y.astype(cdt), w1, preferred_element_type=jnp.float32
    ) + b1.astype(jnp.float32)
    g = _gelu_f32(m, cdt)
    h = jnp.dot(
        g.astype(cdt), w2, preferred_element_type=jnp.float32
    ) + b2.astype(jnp.float32)
    h = h * gamma.astype(jnp.float32)
    return (x.astype(jnp.float32) + h).astype(cdt)


def convnext_block_fused(
    x, dwk, dwb, lns, lnb, w1, b1, w2, b2, gamma,
    *, eps=1e-6, th=None, nb=None, interpret=None, pad_lanes=None,
):
    """Apply one ConvNeXt block to x (B, H, W, C), fused in VMEM.

    dwk: (7, 7, 1, C) depthwise kernel (flax grouped-conv layout);
    w1: (C, 4C); w2: (4C, C); vectors are (C,)/(4C,) as appropriate.
    interpret=None auto-selects interpreter mode off-TPU (tests).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = x.shape
    c_real = c
    if pad_lanes is None:
        pad_lanes = not interpret
    cpad = -(-c // 128) * 128 if pad_lanes else c

    def _tile_bytes(nb_, th_):
        # xbuf halo tile (cdt) + out tile (cdt) + dw/LN f32 transients
        # (acc, y, h ~ 3 copies) + MLP hidden (f32 + cdt copy at 4C) +
        # weight blocks. Computed with the lane-padded channel count.
        isz = x.dtype.itemsize
        wp_ = -(-(w + 6) // 8) * 8
        return (
            nb_
            * (
                (th_ + 6) * wp_ * cpad * isz
                + th_ * w * cpad * (isz + 12)
                + th_ * w * 4 * cpad * (4 + isz)
            )
            + 8 * cpad * cpad * isz
        )

    budget = 11 * 2**20
    if th is None:
        th = min(h, max(8, 2048 // w))
    while h % th:
        th -= 1
    if nb is None:
        nb = max(1, 1024 // (th * max(w, 1)))
        while b % nb:
            nb -= 1
        while nb > 1 and _tile_bytes(nb, th) > budget:
            nb -= 1
            while b % nb:
                nb -= 1
    while th > 8 and _tile_bytes(nb, th) > budget:
        nt = th - 1
        while nt > 1 and h % nt:
            nt -= 1
        if nt >= th:
            break
        th = nt
    if not interpret and _tile_bytes(nb, th) > budget:
        # even the minimal tile overflows scoped VMEM (large-channel stages
        # at non-default resolutions) — identical-math XLA path instead
        return _xla_reference(x, dwk, dwb, lns, lnb, w1, b1, w2, b2, gamma, eps)

    # Mosaic DMA slices need 128-aligned lane dims: zero-pad channels (and
    # every per-channel parameter) up; padded lanes stay exactly zero end to
    # end (see the moment note in _block_kernel), and the caller's channel
    # slice below restores the original width.
    if cpad != c:
        pc = ((0, 0), (0, 0), (0, 0), (0, cpad - c))
        x = jnp.pad(x, pc)
        dwk = jnp.pad(dwk, ((0, 0), (0, 0), (0, 0), (0, cpad - c)))
        dwb, lns, lnb, gamma = (
            jnp.pad(v, (0, cpad - c)) for v in (dwb, lns, lnb, gamma)
        )
        w1 = jnp.pad(w1, ((0, cpad - c), (0, 0)))
        w2 = jnp.pad(w2, ((0, 0), (0, cpad - c)))
        b2 = jnp.pad(b2, (0, cpad - c))
        c = cpad
    # zero-pad: +3 rows top/bottom; width padded left by 3 and right to the
    # next multiple of 8 past w+3 (Mosaic DMA sublane alignment).
    wp = -(-(w + 6) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, wp - w - 3), (0, 0)))
    dwk2 = dwk.reshape(7, 7, dwk.shape[-1])
    grid = (b // nb, h // th)
    flops = 2 * b * h * w * c * (49 + 4 * c + 4 * c)
    out = pl.pallas_call(
        functools.partial(
            _block_kernel, nb=nb, th=th, w=w, c=c, c_real=c_real, eps=float(eps)
        ),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=pl.BlockSpec(
            (nb, th, w, c), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((nb, th + 6, wp, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * b * h * w * c * x.dtype.itemsize,
            transcendentals=b * h * w * 4 * c,
        ),
        interpret=interpret,
    )(xp, dwk2, dwb, lns, lnb, w1, b1, w2, b2, gamma)
    return out[..., :c_real] if c != c_real else out
