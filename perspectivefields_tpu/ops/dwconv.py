"""Depthwise conv as explicit tap accumulation (VPU-floor formulation).

XLA lowers ``feature_group_count == C`` convolutions through its generic
grouped-convolution path. On TPU that path has historically run well off the
VPU arithmetic floor for fully-depthwise kernels (the reference's MixFFN
3x3 dwconv — mix_transformers.py:497-508 — and ConvNeXt's 7x7 dwconv —
convnext.py:16-152 — are both of this form, and together account for tens of
GFLOP/batch that can never touch the MXU).

This module states the same convolution as kh*kw shifted slice-FMAs over a
once-padded input. XLA fuses the whole accumulation into a single elementwise
loop: each output tile is produced by kh*kw VPU FMAs over VMEM-resident
shifted views, which IS the arithmetic floor for a depthwise conv. Products
accumulate in f32 regardless of the input dtype — the same contract as the
MXU path nn.Conv takes (bf16 inputs, f32 accumulator) — so results match the
``nn.Conv`` lowering to within add-reordering rounding.

Stride-1, symmetric ``pad`` only (all depthwise convs in this model family
are stride-1 SAME).

VERDICT on v5e (PERF_NOTES.md round 3): this formulation LOST the e2e A/B by
28% (451.0 vs 625.3 img/s, same-moment interleaved control) — XLA's grouped
conv lowering is already near the VPU floor, and the kh*kw full-tensor f32
transients here don't fuse away. The op is kept (tested, correct) for future
hardware where the balance differs, but NOTHING in the production model
forwards calls it; probe code injects it explicitly if re-measuring.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def dwconv_taps(x, kernel, bias=None, *, pad: int):
    """Depthwise conv, stride 1, symmetric zero padding ``pad``.

    Args:
        x: (B, H, W, C) feature map.
        kernel: (kh, kw, 1, C) — flax ``nn.Conv(feature_group_count=C)``
            kernel layout.
        bias: optional (C,).
        pad: symmetric spatial zero padding (kh//2 for SAME odd kernels).

    Returns:
        (B, H, W', C) in ``x.dtype`` (W' per the usual conv arithmetic; for
        pad == kh//2 with odd kernels the spatial shape is preserved).
    """
    kh, kw, kin, c = kernel.shape
    if kin != 1:
        raise ValueError(f"kernel is not depthwise: {kernel.shape}")
    b, h, w, cx = x.shape
    if cx != c:
        raise ValueError(f"channel mismatch: x {cx} vs kernel {c}")
    oh = h + 2 * pad - kh + 1
    ow = w + 2 * pad - kw + 1
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    kf = kernel.astype(jnp.float32)
    acc = jnp.zeros((b, oh, ow, c), jnp.float32)
    for dy in range(kh):
        for dx in range(kw):
            tap = lax.slice(
                xp, (0, dy, dx, 0), (b, dy + oh, dx + ow, c)
            ).astype(jnp.float32)
            acc = acc + tap * kf[dy, dx, 0]
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)
    return acc.astype(x.dtype)
