"""Whole transformer block fused in VMEM: attention + LN2 + MixFFN + skips.

Extends the fused attention sub-block kernel (fused_attention.py) to cover
the ENTIRE MiT block after LN1 (reference semantics:
mix_transformers.py:144-202 Block.forward):

    a   = proj(softmax(q k^T) v)          (attention, _attn_core)
    x2  = res + a                         (first skip)
    y   = LayerNorm(x2)                   (norm2; f32 fast-variance moments)
    m   = y @ W1 + b1                     (fc1 -> 4C hidden)
    d   = dwconv3x3(m) + db               (zero-padded, taps as row shifts)
    g   = GELU(d)                         (dtype-matched form, f32 math)
    o   = g @ W2 + b2                     (fc2)
    out = x2 + o                          (second skip)

Why: the e2e depth ablation (tools/bench_stage_ablate.py, round 3) puts a
stage-3 block at 1.47 ms in context while its matmul floor is ~0.95 ms —
the gap is the HBM round trips of every intermediate above (the 4C hidden
tensor alone is 131 MB/batch at stage 3). Here only ln1(x), kv_in and the
residual are read and one output written; every intermediate lives in VMEM.

The whole token grid of one image is processed per grid step (no token
tiling), so the 3x3 depthwise conv needs no halo exchange: tokens are
row-major (n = H*W rows of the 2-D working set), spatial row shifts are
sublane shifts of +-W rows, column shifts are +-1 row, and zero padding is
an in-VMEM concat of zero rows around the (bb, H, W, 4C) hidden map. This
gates the kernel to the later stages (n <= ~2048: stages 3-4 at the 320px
zoo resolution); stage 2 overflows the VMEM budget and stage 1 keeps the
measured-better XLA attention path (PERF_NOTES.md).

Numerics match the unfused flax path at compute-dtype resolution: f32
matmul accumulation, f32 LN moments (fast variance, like flax), f32 GELU
of the dtype-matched form (tanh at bf16, A&S-erf at f32), casts to the
compute dtype at the same points the module chain casts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .convnext_block import _gelu_f32
from .fused_attention import _attn_core, _xla_reference as _attn_xla


def _xla_reference(
    ln1x, kv_in, res, wq, bq, wkv, bkv, wproj, bproj,
    ln2s, ln2b, w1, b1, dwk, dwb, w2, b2,
    num_heads, scale, h, w, eps,
):
    """Unfused composition with the flax Block's numerics (models/mit.py):
    used on non-TPU backends, on VMEM overflow, and as the parity oracle."""
    b, n, c = ln1x.shape
    a = _attn_xla(ln1x, kv_in, wq, bq, wkv, bkv, wproj, bproj, num_heads, scale)
    x2 = res + a
    xf = x2.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = (y * ln2s + ln2b).astype(ln1x.dtype)
    m = (
        jnp.dot(y, w1, preferred_element_type=jnp.float32) + b1
    ).astype(ln1x.dtype)
    m = m.reshape(b, h, w, -1)
    d = jax.lax.conv_general_dilated(
        m.astype(jnp.float32),
        dwk.astype(jnp.float32),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=m.shape[-1],
    ) + dwb
    g = _gelu_f32(d, ln1x.dtype).astype(ln1x.dtype).reshape(b, n, -1)
    o = (
        jnp.dot(g, w2, preferred_element_type=jnp.float32) + b2
    ).astype(ln1x.dtype)
    return x2 + o


def _kernel(
    x_ref, kv_ref, res_ref, wq_ref, bq_ref, wkv_ref, bkv_ref, wp_ref,
    bp_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref, dwk_ref, dwb_ref, w2_ref,
    b2_ref, o_ref,
    *, num_heads: int, scale: float, m_true: int, h: int, w: int,
    eps: float, approx_gelu: bool,
):
    bb, n, c = x_ref.shape
    hdim = w1_ref.shape[1]
    cdt = x_ref.dtype

    x = x_ref[...].reshape(bb * n, c)
    a = _attn_core(
        x, kv_ref, wq_ref, bq_ref, wkv_ref, bkv_ref, wp_ref, bp_ref,
        num_heads=num_heads, scale=scale, m_true=m_true, bb=bb, n=n,
    )
    x2 = res_ref[...].reshape(bb * n, c) + a  # first skip, compute dtype

    # LN2: f32 fast-variance moments over the channel lanes (flax default)
    xf = x2.astype(jnp.float32)
    inv_c = jnp.float32(1.0 / c)
    mu = jnp.sum(xf, axis=-1, keepdims=True) * inv_c
    var = jnp.sum(xf * xf, axis=-1, keepdims=True) * inv_c - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(var + jnp.float32(eps))
    y = (
        y * ln2s_ref[...].astype(jnp.float32)
        + ln2b_ref[...].astype(jnp.float32)
    ).astype(cdt)

    m = (
        jax.lax.dot_general(
            y, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1_ref[...].astype(jnp.float32)
    ).astype(cdt)  # (bb*n, hdim)

    # 3x3 depthwise conv, zero ("SAME") padding. The hidden map is
    # (bb, h, w, hdim); pad one zero row/col on each spatial side in VMEM,
    # then the 9 taps are pure static slices (spatial dims are all
    # sublane-major, the lane dim stays hdim throughout).
    m4 = m.reshape(bb, h, w, hdim)
    zr = jnp.zeros((bb, 1, w, hdim), cdt)
    mp = jnp.concatenate([zr, m4, zr], axis=1)          # (bb, h+2, w, hdim)
    zc = jnp.zeros((bb, h + 2, 1, hdim), cdt)
    mp = jnp.concatenate([zc, mp, zc], axis=2)          # (bb, h+2, w+2, hdim)
    acc = jnp.zeros((bb, h, w, hdim), jnp.float32)
    for dp in range(3):
        for dq in range(3):
            tap = dwk_ref[dp, dq].astype(jnp.float32)   # (hdim,)
            acc = acc + mp[:, dp : dp + h, dq : dq + w, :].astype(
                jnp.float32
            ) * tap
    g = _gelu_f32(
        acc + dwb_ref[...].astype(jnp.float32),
        jnp.bfloat16 if approx_gelu else jnp.float32,
    ).astype(cdt)

    o = (
        jax.lax.dot_general(
            g.reshape(bb * n, hdim), w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b2_ref[...].astype(jnp.float32)
    ).astype(cdt)
    o_ref[...] = (x2 + o).reshape(bb, n, c)


def _tile_bytes(n, c, hdim, mpad, h, w, isz, bb):
    """Scoped-VMEM estimate per grid step (same style as fused_attention's
    validated accounting): token-sized attention state + the FFN hidden
    working set (f32 fc1 transient, padded cdt map, f32 tap accumulator,
    cdt gelu output) + grid-invariant weight blocks."""
    attn = n * (c * (5 * isz + 8) + mpad * (4 + isz))
    ffn = n * hdim * (4 + 4 + isz) + (h + 2) * (w + 2) * hdim * isz + n * c * 4
    weights = (4 * c * c + 2 * c * hdim) * isz
    return bb * (attn + ffn) + weights


def fused_block_viable(b, n, c, hdim, m, num_heads, itemsize: int = 2) -> bool:
    """True when the whole-block kernel fits scoped VMEM at this stage's
    shapes (callers keep the attention-only fused path otherwise).

    ``itemsize`` must match the compute dtype fused_block will run at —
    the kernel re-checks the budget with the real itemsize and silently
    falls back to XLA on overflow, so an optimistic gate here would pay
    the kernel's param-plumbing for nothing."""
    if n > 2048 or c % num_heads or (c // num_heads) % 64:
        return False
    mpad = -(-m // 8) * 8
    side = int(round(n ** 0.5))
    return _tile_bytes(n, c, hdim, mpad, side, side, itemsize, 1) <= 13 * 2**20


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "scale", "h", "w", "eps", "force_xla", "interpret"
    ),
)
def fused_block(
    ln1x, kv_in, res, wq, bq, wkv, bkv, wproj, bproj,
    ln2s, ln2b, w1, b1, dwk, dwb, w2, b2,
    num_heads: int, scale: float, h: int, w: int, eps: float = 1e-6,
    force_xla: bool = False, interpret: bool = False,
):
    """One MiT block after LN1, fused in VMEM.

    Args:
        ln1x: (B, N, C) LN1'd tokens (attention queries), N = h*w.
        kv_in: (B, M, C) spatially-reduced + LN'd tokens for K/V.
        res: (B, N, C) the block input (pre-LN1 skip source).
        wq/bq, wkv/bkv, wproj/bproj: attention projections as in
            fused_attention.
        ln2s/ln2b: (C,) norm2 scale/bias. w1/b1: (C, 4C)/(4C,) fc1.
        dwk: (3, 3, 1, 4C) depthwise kernel (flax nn.Conv layout).
        dwb: (4C,). w2/b2: (4C, C)/(C,) fc2.
    Returns:
        (B, N, C) block output (both skips applied).
    """
    b, n, c = ln1x.shape
    hdim = w1.shape[1]
    m = kv_in.shape[1]
    dwk3 = dwk.reshape(3, 3, hdim)
    if force_xla or (not interpret and jax.default_backend() != "tpu"):
        return _xla_reference(
            ln1x, kv_in, res, wq, bq, wkv, bkv, wproj, bproj,
            ln2s, ln2b, w1, b1, dwk, dwb, w2, b2, num_heads, scale, h, w, eps,
        )

    mpad = -(-m // 8) * 8
    if mpad != m:
        kv_in = jnp.pad(kv_in, ((0, 0), (0, mpad - m), (0, 0)))

    isz = ln1x.dtype.itemsize
    budget = 13 * 2**20
    if _tile_bytes(n, c, hdim, mpad, h, w, isz, 1) > budget:
        return _xla_reference(
            ln1x, kv_in[:, :m], res, wq, bq, wkv, bkv, wproj, bproj,
            ln2s, ln2b, w1, b1, dwk, dwb, w2, b2, num_heads, scale, h, w, eps,
        )
    bb = 1
    for cand in (8, 4, 2, 1):
        if b % cand == 0 and _tile_bytes(n, c, hdim, mpad, h, w, isz, cand) <= budget:
            bb = cand
            break

    grid = (b // bb,)
    tok = pl.BlockSpec((bb, n, c), lambda i: (i, 0, 0))
    inv = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s))
    out = pl.pallas_call(
        functools.partial(
            _kernel, num_heads=num_heads, scale=scale, m_true=m, h=h, w=w,
            eps=eps, approx_gelu=ln1x.dtype == jnp.bfloat16,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, c), ln1x.dtype),
        grid=grid,
        in_specs=[
            tok,
            pl.BlockSpec((bb, mpad, c), lambda i: (i, 0, 0)),
            tok,
            inv(c, c), inv(c), inv(c, 2 * c), inv(2 * c), inv(c, c), inv(c),
            inv(c), inv(c),
            inv(c, hdim), inv(hdim), inv(3, 3, hdim), inv(hdim),
            inv(hdim, c), inv(c),
        ],
        out_specs=tok,
        interpret=interpret,
    )(
        ln1x, kv_in, res, wq, bq, wkv, bkv, wproj, bproj,
        ln2s, ln2b, w1, b1, dwk3, dwb, w2, b2,
    )
    return out
