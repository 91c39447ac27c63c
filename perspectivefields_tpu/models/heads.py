"""Dense decode heads: SegFormer-MLP decoder pyramid + low-level encoder.

Architecture contract (reference: modeling/persformer_heads/decode_head.py,
gravity_head.py:39-197, latitude_head.py:39-193 — the two heads share one
topology differing only in output channels):

  per-scale Dense embed -> 768  (MLP "linear_cX")
  3x3 conv -> 256               ("linear_cX_proc")
  top-down FeatureFusion chain, each step: (+ residual-conv-unit of lateral)
      -> residual-conv-unit -> 2x bilinear upsample
  concat stride-2 low-level features (64ch)
  3x3 conv -> 64 (+ReLU), 2x upsample, 3x3 conv -> 32 (+ReLU), 1x1 -> out.

All convs channels-last; the 2x upsamples use the exact resize-as-matmul op
(align_corners=False parity with F.interpolate, decode_head.py:284-287).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from ..ops.image import resize_bilinear
from .holders import _ConvParams, _LinearParams


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm with stored statistics as parameters.

    The reference's LowLevelEncoder uses nn.BatchNorm2d in eval mode
    (reference: perspectivefields.py:70-83); at inference it is the affine map
    y = (x - mean) / sqrt(var + eps) * gamma + beta, which XLA fuses into the
    preceding conv.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (self.features,), jnp.float32)
        inv = (scale / jnp.sqrt(var + self.eps)).astype(x.dtype)
        return x * inv + (bias - mean * scale / jnp.sqrt(var + self.eps)).astype(x.dtype)


class LowLevelEncoder(nn.Module):
    """7x7/s2 conv (no bias) + frozen BN + ReLU -> 64ch stride-2 features.

    Reference: perspectivefields.py:70-83."""

    feat_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.feat_dim,
            kernel_size=(7, 7),
            strides=(2, 2),
            padding=3,
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = FrozenBatchNorm(self.feat_dim, name="bn1")(x)
        return nn.relu(x)


class ResidualConvUnit(nn.Module):
    """relu -> conv3x3 -> relu -> conv3x3, residual around the FIRST relu.

    Reference: decode_head.py:224-256. Note the reference's ReLU is
    ``inplace=True`` (decode_head.py:242), so ``out = self.relu(x)`` mutates
    ``x`` itself and the final ``out + x`` actually adds ``relu(x)`` — the
    skip connection carries the rectified input. Verified against the real
    reference graph in tests/test_reference_parity.py.
    """

    features: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        skip = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv1")(skip)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv2")(out)
        return out + skip


class FeatureFusionBlock(nn.Module):
    """Top-down fusion + 2x bilinear upsample.

    Reference: decode_head.py:259-288. ``upsample=False`` returns the
    pre-upsample RCU output (same params) so the caller can compose the 2x
    upsample into the following conv (see SegFormerDecoder.fuse_conv0)."""

    features: int = 256
    unit2only: bool = False
    dtype: jnp.dtype = jnp.float32
    upsample: bool = True

    @nn.compact
    def __call__(self, x, lateral=None):
        out = x
        if lateral is not None:
            out = out + ResidualConvUnit(self.features, self.dtype, name="resConfUnit1")(
                lateral
            )
        out = ResidualConvUnit(self.features, self.dtype, name="resConfUnit2")(out)
        if not self.upsample:
            return out
        h, w = out.shape[-3], out.shape[-2]
        return resize_bilinear(out, 2 * h, 2 * w, "torch_bilinear")


class SegFormerDecoder(nn.Module):
    """Shared decoder topology for the gravity and latitude heads.

    out_channels: 2 (gravity regression) / 73 (gravity cls) / 1 (latitude
    regression) / 180 (latitude cls). Reference: gravity_head.py:139-176,
    latitude_head.py:138-175 (identical layer stacks).
    """

    out_channels: int
    embed_dim: int = 768
    fusion_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    # Compose the per-scale Dense(embed_dim) with the following 3x3 conv into
    # one 3x3 conv whose kernel is the product of the two linear maps — the
    # same function with ~12x fewer FLOPs at stride 4 (and no 768-wide
    # intermediate in HBM). Exact up to float rounding: the embed bias's
    # contribution through the conv's zero padding is restored with a
    # ones-map conv (see _fused_embed_proc). Parameter tree is identical in
    # both modes, so converted reference checkpoints work unchanged.
    fuse_embed: bool = True
    # Phase-packed subpixel tail: compose the 2x bilinear upsample with
    # conv_fuse_conv1 into four per-phase 3x3 convs at half resolution
    # (output channels 4x32, MXU-friendly), apply linear_pred per phase, and
    # depth-to-space. Same FLOPs as the plain conv1 but no 320^2x64
    # intermediate in HBM and 4x better MXU N-utilization (measured 22.7 ->
    # ~7 ms per head at B=64 bf16, tools/bench_dualhead4.py). Exact incl.
    # borders: the 2px frame (where bilinear edge-clamp meets conv zero-pad)
    # is recomputed with the plain path on thin slabs and pasted over.
    fuse_tail: bool = True
    # Same composition one level up: fusion1's 2x upsample folded into the
    # _c1 block-row of conv_fuse_conv0 (per-phase 3x3 convs at the stride-4
    # grid, out 4x64, then depth-to-space). Removes the (B, H/2, W/2, 256)
    # upsample intermediate (1.7 GB bf16 @B128/320px) and runs the dominant
    # conv at N=256 instead of N=64: measured 45.2 -> 14.6 ms per head for
    # the whole conv0+tail back-end (tools/bench_phasev2.py, B=128 bf16).
    # Exact incl. borders via the same plain-path slab pasting.
    fuse_conv0: bool = True

    def _fused_embed_proc(self, c, emb: _LinearParams, proc: _ConvParams):
        compute = self.dtype
        # compose in f32, cast once
        fused_k = jnp.einsum(
            "ce,hwef->hwcf", emb.kernel, proc.kernel, precision="highest"
        ).astype(compute)
        y = lax.conv_general_dilated(
            c.astype(compute),
            fused_k,
            (1, 1),
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # embed-bias contribution: b_e flows through every conv tap that lands
        # inside the (zero-padded) embedded map — a 3x3 conv of a ones map.
        bias_k = jnp.einsum(
            "e,hwef->hwf", emb.bias, proc.kernel, precision="highest"
        ).astype(compute)[:, :, None, :]
        ones = jnp.ones((1, c.shape[1], c.shape[2], 1), compute)
        bias_map = lax.conv_general_dilated(
            ones,
            bias_k,
            (1, 1),
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias_map + proc.bias.astype(compute)

    def _plain_embed_proc(self, c, emb: _LinearParams, proc: _ConvParams):
        compute = self.dtype
        e = (
            jnp.dot(c.astype(compute), emb.kernel.astype(compute))
            + emb.bias.astype(compute)
        )
        y = lax.conv_general_dilated(
            e,
            proc.kernel.astype(compute),
            (1, 1),
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + proc.bias.astype(compute)

    @nn.compact
    def __call__(self, hl_features, ll_features):
        c1, c2, c3, c4 = hl_features

        def embed_proc(c, idx):
            emb = _LinearParams(c.shape[-1], self.embed_dim, name=f"linear_c{idx}")
            proc = _ConvParams(
                3, 3, self.embed_dim, self.fusion_dim, name=f"linear_c{idx}_proc"
            )
            if self.fuse_embed:
                return self._fused_embed_proc(c, emb, proc)
            return self._plain_embed_proc(c, emb, proc)

        _c4 = embed_proc(c4, 4)
        _c4 = FeatureFusionBlock(self.fusion_dim, True, self.dtype, name="fusion4")(_c4)
        _c3 = embed_proc(c3, 3)
        _c3 = FeatureFusionBlock(self.fusion_dim, False, self.dtype, name="fusion3")(
            _c4, _c3
        )
        _c2 = embed_proc(c2, 2)
        _c2 = FeatureFusionBlock(self.fusion_dim, False, self.dtype, name="fusion2")(
            _c3, _c2
        )
        _c1 = embed_proc(c1, 1)
        _c1 = FeatureFusionBlock(
            self.fusion_dim,
            False,
            self.dtype,
            upsample=not self.fuse_conv0,
            name="fusion1",
        )(_c2, _c1)

        # conv0 over concat([upsample2x(_c1), ll]) computed as two split
        # convs summed — identical math (block-row decomposition of the
        # kernel), but avoids materializing the (B, H, W, 320) concat in HBM
        # (measured 1.6x faster at batch 64 on v5e). Param tree matches
        # nn.Conv. With fuse_conv0, the _c1 block-row additionally composes
        # the 2x upsample into per-phase convs at the coarse grid.
        ll_dim = ll_features.shape[-1]
        cf0 = _ConvParams(
            3, 3, self.fusion_dim + ll_dim, 64, name="conv_fuse_conv0"
        )
        k0 = cf0.kernel.astype(self.dtype)

        # NOTE: no preferred_element_type=f32 here — a widened output dtype
        # breaks the conv transpose rule under grad (f32 cotangent vs bf16
        # operands). The two partial sums round in compute dtype instead.
        def _conv(x, k):
            return lax.conv_general_dilated(
                x.astype(self.dtype), k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        if self.fuse_conv0:
            x_c1 = self._fused_conv0_c1(_c1, cf0.kernel[:, :, : self.fusion_dim, :])
        else:
            x_c1 = _conv(_c1, k0[:, :, : self.fusion_dim, :])
        x = (
            x_c1
            + _conv(ll_features, k0[:, :, self.fusion_dim :, :])
            + cf0.bias.astype(self.dtype)
        )
        x = nn.relu(x)

        # tail: 2x bilinear upsample -> conv3x3(64->32) -> relu -> 1x1 pred
        # (gravity_head.py:170-175). Param tree identical in both modes.
        cf1 = _ConvParams(3, 3, 64, 32, name="conv_fuse_conv1")
        pred = _ConvParams(1, 1, 32, self.out_channels, name="linear_pred")
        if self.fuse_tail:
            return self._fused_tail(x, cf1, pred)
        return self._plain_tail(x, cf1, pred)

    def _plain_tail(self, x, cf1: _ConvParams, pred: _ConvParams):
        """Reference dataflow: materialized 2x upsample then convs."""
        h, w = x.shape[-3], x.shape[-2]
        up = resize_bilinear(x, 2 * h, 2 * w, "torch_bilinear")
        y = lax.conv_general_dilated(
            up.astype(self.dtype), cf1.kernel.astype(self.dtype), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + cf1.bias.astype(self.dtype)
        y = nn.relu(y)
        y = lax.conv_general_dilated(
            y, pred.kernel.astype(self.dtype), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + pred.bias.astype(self.dtype)
        return y

    # per-dim phase weights: row = conv tap dp in (-1,0,1), col = input offset
    # a in (-1,0,1). Derived from align_corners=False 2x bilinear: output row
    # 2i+di+dp is a 2-tap combination of input rows; collecting terms per
    # input offset gives these matrices (see tests/test_head_fusion.py).
    _W_PHASE0 = ((0.75, 0.25, 0.0), (0.25, 0.75, 0.0), (0.0, 0.75, 0.25))
    _W_PHASE1 = ((0.25, 0.75, 0.0), (0.0, 0.75, 0.25), (0.0, 0.25, 0.75))

    def _plain_conv0_c1(self, a, k_c1):
        """Reference dataflow for the _c1 block-row: 2x upsample, 3x3 conv."""
        h, w = a.shape[-3], a.shape[-2]
        up = resize_bilinear(a.astype(self.dtype), 2 * h, 2 * w, "torch_bilinear")
        return lax.conv_general_dilated(
            up, k_c1.astype(self.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def _fused_conv0_c1(self, a, k_c1):
        """fusion1's 2x upsample composed into conv0's _c1 block-row.

        a: pre-upsample fusion1 output (B, h, w, 256); k_c1: (3, 3, 256, 64).
        Returns conv3x3(upsample2x(a), k_c1) at (B, 2h, 2w, 64) — computed as
        four per-phase 3x3 convs at (h, w) (out 4x64, N=256 on the MXU, no
        (B, 2h, 2w, 256) intermediate) + depth-to-space. Exact in the
        interior; the 2px frame (bilinear edge clamp x conv zero pad) is
        recomputed with the plain path on 3px slabs and pasted over.
        """
        compute = self.dtype
        w0 = jnp.asarray(self._W_PHASE0, jnp.float32)
        w1 = jnp.asarray(self._W_PHASE1, jnp.float32)
        kf = k_c1.astype(jnp.float32)  # (3, 3, 256, 64)
        kphase = jnp.concatenate(
            [
                jnp.einsum("pa,qb,pqio->abio", wv, wh, kf, precision="highest")
                for wv in (w0, w1)
                for wh in (w0, w1)
            ],
            axis=-1,
        ).astype(compute)
        z = lax.conv_general_dilated(
            a.astype(compute), kphase, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        b, h, w, _ = z.shape
        c = k_c1.shape[-1]
        # depth-to-space: phase p = 2*di + dj -> pixel (2i+di, 2j+dj)
        y = (
            z.reshape(b, h, w, 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, 2 * h, 2 * w, c)
        )
        top = self._plain_conv0_c1(a[:, :3], k_c1)[:, :2]
        bot = self._plain_conv0_c1(a[:, -3:], k_c1)[:, -2:]
        left = self._plain_conv0_c1(a[:, :, :3], k_c1)[:, :, :2]
        right = self._plain_conv0_c1(a[:, :, -3:], k_c1)[:, :, -2:]
        y = y.at[:, :2].set(top)
        y = y.at[:, -2:].set(bot)
        y = y.at[:, :, :2].set(left)
        y = y.at[:, :, -2:].set(right)
        return y

    def _fused_tail(self, x, cf1: _ConvParams, pred: _ConvParams):
        """upsample+conv1 composed into 4 phase convs at half resolution.

        y[2i+di, 2j+dj] = (x * K[di,dj])[i, j] with K[di,dj] the composition
        of the bilinear phase weights and the conv1 kernel — exact in the
        interior; the 2px output frame (bilinear edge clamping + conv zero
        padding interact there) is recomputed with the plain path on 3px
        slabs and pasted over.
        """
        compute = self.dtype
        w0 = jnp.asarray(self._W_PHASE0, jnp.float32)
        w1 = jnp.asarray(self._W_PHASE1, jnp.float32)
        k1 = cf1.kernel.astype(jnp.float32)  # (3, 3, 64, 32)
        # (3,3,64,32) per phase -> stack phases on out channels: (3,3,64,128)
        kphase = jnp.concatenate(
            [
                jnp.einsum("pa,qb,pqio->abio", wv, wh, k1, precision="highest")
                for wv in (w0, w1)
                for wh in (w0, w1)
            ],
            axis=-1,
        ).astype(compute)
        z = lax.conv_general_dilated(
            x.astype(compute), kphase, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.tile(cf1.bias, 4).astype(compute)
        z = nn.relu(z)
        b, h, w, _ = z.shape
        zz = z.reshape(b, h, w, 4, 32)
        y4 = (
            jnp.einsum("bhwpi,io->bhwpo", zz, pred.kernel[0, 0].astype(compute))
            + pred.bias.astype(compute)
        )
        c = self.out_channels
        # depth-to-space: phase p = 2*di + dj -> pixel (2i+di, 2j+dj)
        y = (
            y4.reshape(b, h, w, 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, 2 * h, 2 * w, c)
        )
        # exact 2px frame via plain path on thin slabs (full-width rows with
        # exact horizontal clamping, full-height cols with exact vertical)
        top = self._plain_tail(x[:, :3], cf1, pred)[:, :2]
        bot = self._plain_tail(x[:, -3:], cf1, pred)[:, -2:]
        left = self._plain_tail(x[:, :, :3], cf1, pred)[:, :, :2]
        right = self._plain_tail(x[:, :, -3:], cf1, pred)[:, :, -2:]
        y = y.at[:, :2].set(top)
        y = y.at[:, -2:].set(bot)
        y = y.at[:, :, :2].set(left)
        y = y.at[:, :, -2:].set(right)
        return y
