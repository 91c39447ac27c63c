"""Parameter-holder modules matching flax's nn.Dense / nn.Conv trees.

Used by fused execution paths that consume raw kernels/biases directly:
the holder declares parameters with the exact names and shapes the plain
module would, so the parameter tree (and therefore every converted
reference checkpoint) is identical in fused and unfused modes.
"""

from __future__ import annotations

import flax.linen as nn


class _LinearParams(nn.Module):
    """Parameter holder matching nn.Dense's param tree (kernel/bias)."""

    features_in: int
    features_out: int

    def setup(self):
        self.kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.features_in, self.features_out),
        )
        self.bias = self.param("bias", nn.initializers.zeros, (self.features_out,))


class _ConvParams(nn.Module):
    """Parameter holder matching nn.Conv's param tree (kernel/bias)."""

    kh: int
    kw: int
    features_in: int
    features_out: int

    def setup(self):
        self.kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kh, self.kw, self.features_in, self.features_out),
        )
        self.bias = self.param("bias", nn.initializers.zeros, (self.features_out,))


class _LayerNormParams(nn.Module):
    """Parameter holder matching nn.LayerNorm's param tree (scale/bias)."""

    features: int

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.features,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.features,))
