"""ConvNeXt trunk (used by ParamNet) — flax, channels-last.

Architecture contract (reference: modeling/backbone/convnext.py:16-152):
stem 4x4/s4 conv + LN; three LN + 2x2/s2 downsample layers; stages of blocks
(7x7 depthwise conv -> LN -> 1x1 expand 4x -> GELU -> 1x1 project -> layer
scale gamma -> residual); final LN over globally average-pooled features; an
optional linear head.

In NHWC the reference's "channels_first vs channels_last LayerNorm" split
(convnext.py:155-182) disappears — every LN is a plain last-axis LN.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.activations import gelu
from .holders import _ConvParams as _ConvHolder, _LinearParams as _DenseHolder


class _Affine(nn.Module):
    """Parameter holder matching nn.LayerNorm's tree (scale/bias)."""

    features: int

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.features,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.features,))


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    # Run the whole block as one VMEM-resident Pallas kernel (7x7 dw conv +
    # LN + MLP + layer scale + residual; kernels/convnext_block.py). Same
    # parameter tree as the unfused path, so converted checkpoints work
    # unchanged. Inference-only (no VJP); training uses the unfused path.
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        if self.fused:
            from ..kernels.convnext_block import convnext_block_fused

            dim = self.dim
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init),
                (dim,),
                jnp.float32,
            )
            # param holders with trees identical to the unfused submodules
            dwh = _ConvHolder(7, 7, 1, dim, name="dwconv")
            ln = _Affine(dim, name="norm")
            pw1 = _DenseHolder(dim, 4 * dim, name="pwconv1")
            pw2 = _DenseHolder(4 * dim, dim, name="pwconv2")
            cdt = self.dtype
            return convnext_block_fused(
                x.astype(cdt),
                dwh.kernel.astype(cdt),
                dwh.bias,
                ln.scale,
                ln.bias,
                pw1.kernel.astype(cdt),
                pw1.bias,
                pw2.kernel.astype(cdt),
                pw2.bias,
                gamma,
            )
        inp = x
        # XLA's grouped-conv lowering is the measured-fastest depthwise path
        # on v5e; the tap-accumulation alternative (ops/dwconv.py) LOST 28%
        # e2e (PERF_NOTES.md round 3) and lives only in probe code now.
        x = nn.Conv(
            self.dim,
            kernel_size=(7, 7),
            padding=3,
            feature_group_count=self.dim,
            dtype=self.dtype,
            name="dwconv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(x)
        # dtype-matched GELU (exact erf at f32, tanh at bf16 — activations.py)
        x = gelu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        gamma = self.param(
            "gamma",
            nn.initializers.constant(self.layer_scale_init),
            (self.dim,),
            jnp.float32,
        )
        x = x * gamma.astype(x.dtype)
        return inp + x


class ConvNeXt(nn.Module):
    """ConvNeXt-tiny by default (depths 3/3/9/3, dims 96/192/384/768), the
    configuration ParamNet instantiates (reference: param_network.py:43,180).

    num_classes == 0 returns pooled features (reference: convnext.py:124-127).
    """

    num_classes: int = 1000
    depths: Tuple[int, ...] = (3, 3, 9, 3)
    dims: Tuple[int, ...] = (96, 192, 384, 768)
    dtype: jnp.dtype = jnp.float32
    fused_blocks: bool = False  # inference-only fused block kernel

    @nn.compact
    def __call__(self, x):
        for i in range(4):
            if i == 0:
                x = nn.Conv(
                    self.dims[0],
                    kernel_size=(4, 4),
                    strides=(4, 4),
                    padding="VALID",
                    dtype=self.dtype,
                    name="stem_conv",
                )(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
            else:
                x = nn.LayerNorm(
                    epsilon=1e-6, dtype=self.dtype, name=f"downsample{i}_norm"
                )(x)
                x = nn.Conv(
                    self.dims[i],
                    kernel_size=(2, 2),
                    strides=(2, 2),
                    padding="VALID",
                    dtype=self.dtype,
                    name=f"downsample{i}_conv",
                )(x)
            for j in range(self.depths[i]):
                x = ConvNeXtBlock(
                    self.dims[i],
                    dtype=self.dtype,
                    fused=self.fused_blocks,
                    name=f"stage{i}_{j}",
                )(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool (N, C)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if self.num_classes != 0:
            x = nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
        return x
