"""MiT (Mix Vision Transformer / SegFormer encoder) — TPU-native flax impl.

Architecture contract from the reference
(reference: perspective2d/modeling/backbone/mix_transformers.py:14-543):
4 hierarchical stages, each = OverlapPatchEmbed (strided conv + LN) followed by
transformer Blocks with (a) spatial-reduction attention — K/V computed from an
sr x sr strided conv of the tokens (sr_ratios per stage) — and (b) Mix-FFN
(fc1 -> 3x3 depthwise conv -> GELU -> fc2). Outputs 4 feature maps at strides
4/8/16/32.

TPU-first design decisions (not a translation):
* channels-last (B, H, W, C) end to end — the native TPU conv layout; the
  reference's NCHW<->(B,N,C) permute churn disappears, attention reshapes are
  free metadata ops on the last two axes.
* dtype-matched GELU: exact erf at f32 (torch nn.GELU parity), tanh form at
  bf16 (equally accurate at bf16 resolution, ~5x cheaper on the VPU — see
  ops/activations.py).
* attention computed head-batched with einsum; q @ k^T contractions sized so
  XLA tiles them onto the MXU (stage-1: N=6400, KV=N/64=100). For the
  latency-bound later stages, the whole attention sub-block (projections +
  softmax) runs as one VMEM-resident Pallas kernel when use_pallas is on
  (kernels/fused_attention.py; +0.8 ms/block at stage 3 @B128 bf16).
* stochastic depth (drop_path) is train-only and folds to identity under
  deterministic=True, so inference traces contain no RNG ops.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.activations import gelu

from ..config import BackboneConfig
from ..kernels.fused_attention import fused_attention
from ..kernels.fused_block import fused_block, fused_block_viable
from ..kernels.stage1_attention import eligible as _stage1_eligible
from ..kernels.stage1_attention import stage1_attention
from .convnext import _ConvHolder, _DenseHolder
from .holders import _LayerNormParams


def mit_spec(name: str) -> BackboneConfig:
    """Named MiT variants b0-b5 (SegFormer family). The reference ships only
    mit_b3 (mix_transformers.py:511); the rest are provided as the natural
    model family extension (same dims/head layout as the SegFormer paper).
    """
    table = {
        "mitb0": ((32, 64, 160, 256), (2, 2, 2, 2)),
        "mitb1": ((64, 128, 320, 512), (2, 2, 2, 2)),
        "mitb2": ((64, 128, 320, 512), (3, 4, 6, 3)),
        "mitb3": ((64, 128, 320, 512), (3, 4, 18, 3)),
        "mitb4": ((64, 128, 320, 512), (3, 8, 27, 3)),
        "mitb5": ((64, 128, 320, 512), (3, 6, 40, 3)),
    }
    if name not in table:
        raise ValueError(f"unknown MiT variant: {name}")
    dims, depths = table[name]
    return BackboneConfig(name=name, dims=dims, depths=depths)


class DropPath(nn.Module):
    """Per-sample stochastic depth. Identity when deterministic."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class MixFFN(nn.Module):
    """fc1 -> 3x3 depthwise conv -> GELU -> fc2 on (B, H, W, C) maps.

    Reference: mix_transformers.py:14-56 (Mlp) + :497-508 (DWConv)."""

    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32
    # One VMEM-resident Pallas kernel for the whole FFN (kernels/mixffn.py):
    # the 4x-wide hidden tensor never touches HBM. Same param tree, so the
    # same weights serve both paths. Inference-only (no VJP).
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        if self.fused:
            from ..kernels.mixffn import mixffn_fused

            fc1 = _DenseHolder(x.shape[-1], self.hidden_dim, name="fc1")
            dw = _ConvHolder(3, 3, 1, self.hidden_dim, name="dwconv")
            fc2 = _DenseHolder(self.hidden_dim, self.out_dim, name="fc2")
            cdt = self.dtype
            return mixffn_fused(
                x.astype(cdt),
                fc1.kernel.astype(cdt),
                fc1.bias,
                dw.kernel.astype(cdt),
                dw.bias,
                fc2.kernel.astype(cdt),
                fc2.bias,
            )
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        # XLA's grouped-conv lowering is the measured-fastest depthwise path
        # on v5e; the tap-accumulation alternative (ops/dwconv.py) LOST 28%
        # e2e (PERF_NOTES.md round 3) and lives only in probe code now.
        x = nn.Conv(
            self.hidden_dim,
            kernel_size=(3, 3),
            padding=1,
            feature_group_count=self.hidden_dim,
            dtype=self.dtype,
            name="dwconv",
        )(x)
        # dtype-matched GELU: exact erf at f32, tanh form at bf16 (equally
        # accurate at bf16 resolution, ~5x cheaper on the VPU — see
        # ops/activations.py)
        x = gelu(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        return x


def _fused_backend_ok() -> bool:
    """Backend gate for the fused attention branch (separate function so
    tests can monkeypatch it and exercise the branch on the CPU mesh, where
    fused_attention itself falls back to the identical-math XLA path)."""
    return jax.default_backend() == "tpu"


# Max token count N for the fused attention kernel (above it, XLA's
# batched-GEMM attention is measured faster — PERF_NOTES.md). The default
# routes stage 1 (N=6400 at the zoo resolution) to XLA and stages 2-4 to the
# kernel. A module attribute (not an env var): production forwards take no
# hidden environment switches; e2e A/B probes monkeypatch this instead.
ATTN_TOKEN_GATE = 2048


def _attn_token_gate() -> int:
    """Indirection so probes/tests can patch ATTN_TOKEN_GATE at runtime."""
    return ATTN_TOKEN_GATE


# Lane-packed single-head kernel for the stage-1 shape class (N above the
# token gate, num_heads=1, C=64 — half the register lane width, which is
# why both XLA and the generic kernel underuse the MXU there). See
# kernels/stage1_attention.py. Module attribute (not an env var); e2e A/B
# probes monkeypatch it. Default OFF: the packed kernel measures 2.8 ms vs
# XLA's 2.0 ms at the stage-1 bench shape (tools/bench_stage1_attn.py,
# PERF_NOTES round 5) — flip only if a variant beats XLA e2e.
ATTN_STAGE1_KERNEL = False


def _attn_stage1_on() -> bool:
    """Indirection so probes/tests can patch ATTN_STAGE1_KERNEL at runtime."""
    return ATTN_STAGE1_KERNEL


# Folded single-head attention (pure XLA, no kernel): with num_heads == 1
# both dense N-row projections fold algebraically into the tiny M-row KV
# side —
#     logits = (x@Wq + bq) @ k^T        = x @ (Wq@k^T)   + bq@k^T
#     out    = (p@v) @ Wp + bp          = p @ (v@Wp)     + bp
# eliminating the q- and out-projection GEMMs over N = H*W tokens (~40% of
# the stage-1 N-row MACs) and their (B, N, C) HBM intermediates. Exact in
# real arithmetic; in floats it reassociates the contraction (the folded
# (C, M) / (M, C) matrices are formed in f32 then cast to the compute
# dtype), which parity tests cover at the model tolerance. Module attribute
# so e2e A/B probes can patch it. Default OFF: measured e2e LOSS of -2.1%
# (611.3 vs 624.4 img/s, 6 interleaved windows, tools/bench_ab.py
# @...ATTN_STAGE1_FOLD=1 vs =0, PERF_NOTES round 5) — deleting the two
# N-row 64x64 GEMMs costs more than it saves because the per-batch-item
# folded operands turn the N-row logits/out GEMMs into batched GEMMs with
# non-shared stationary matrices, which XLA schedules worse than the
# shared-weight projection + shared-free attention pair it replaces.
ATTN_STAGE1_FOLD = False


def _attn_stage1_fold_on() -> bool:
    """Indirection so probes/tests can patch ATTN_STAGE1_FOLD at runtime."""
    return ATTN_STAGE1_FOLD


class SRAttention(nn.Module):
    """Efficient attention with spatial reduction of K/V.

    Reference: mix_transformers.py:59-141. Q from all N=H*W tokens; K/V from
    an (sr x sr)-strided conv + LayerNorm when sr_ratio > 1.
    """

    dim: int
    num_heads: int
    sr_ratio: int = 1
    qkv_bias: bool = True
    ln_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, residual=None):
        """x: LN'd (B, H, W, C) map. ``residual`` (same shape): the block's
        pre-LN skip connection — when given it is added to the output (for
        the fused kernel, inside the kernel, saving the external add's HBM
        round trip; identical math either way)."""
        b, h, w, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5

        if self.sr_ratio > 1:
            kv_in = nn.Conv(
                self.dim,
                kernel_size=(self.sr_ratio, self.sr_ratio),
                strides=(self.sr_ratio, self.sr_ratio),
                padding="VALID",
                dtype=self.dtype,
                name="sr",
            )(x)
            kv_in = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm")(
                kv_in
            )
            kv_in = kv_in.reshape(b, -1, c)
        else:
            kv_in = x.reshape(b, h * w, c)

        # Stage-1 shape class (N above the token gate, single head, C=64):
        # the lane-packed kernel (kernels/stage1_attention.py) processes
        # token pairs at full 128-lane register width with the logits and
        # softmax VMEM-resident.
        use_s1 = (
            self.use_pallas
            and self.qkv_bias
            and self.num_heads == 1
            and h * w > _attn_token_gate()
            and _stage1_eligible(h * w, c, kv_in.shape[1], self.num_heads)
            and _attn_stage1_on()
            and _fused_backend_ok()
        )
        if use_s1:
            qh = _DenseHolder(c, self.dim, name="q")
            kvh = _DenseHolder(c, 2 * self.dim, name="kv")
            ph = _DenseHolder(self.dim, self.dim, name="proj")
            cdt = self.dtype
            out = stage1_attention(
                x.reshape(b, h * w, c).astype(cdt),
                kv_in.astype(cdt),
                qh.kernel.astype(cdt),
                qh.bias,
                kvh.kernel.astype(cdt),
                kvh.bias,
                ph.kernel.astype(cdt),
                ph.bias,
                scale,
                residual=(
                    None
                    if residual is None
                    else residual.reshape(b, h * w, self.dim).astype(cdt)
                ),
            )
            return out.reshape(b, h, w, self.dim)

        # Folded single-head path (see ATTN_STAGE1_FOLD above): both N-row
        # 64x64 projections collapse into the M-row KV side, leaving one
        # N x C @ C x M GEMM + softmax + one N x M @ M x C GEMM. Pure XLA —
        # no backend gate; the CPU test suite exercises the same program.
        use_folded = (
            self.use_pallas
            and self.qkv_bias
            and self.num_heads == 1
            and h * w > _attn_token_gate()
            and not use_s1
            and _attn_stage1_fold_on()
        )
        if use_folded:
            qh = _DenseHolder(c, self.dim, name="q")
            kvh = _DenseHolder(c, 2 * self.dim, name="kv")
            ph = _DenseHolder(self.dim, self.dim, name="proj")
            cdt = self.dtype
            f32 = jnp.float32
            # Tiny side (M ~ N/sr^2 rows), all f32: k/v projections, then
            # the folded (C, M) logit matrix (scale absorbed) and (M, C)
            # value-out matrix, cast once to the compute dtype.
            kv = (
                jnp.einsum(
                    "bmc,cd->bmd", kv_in.astype(f32), kvh.kernel.astype(f32)
                )
                + kvh.bias.astype(f32)
            )
            k, v = kv[..., : self.dim], kv[..., self.dim :]
            kq = jnp.einsum("cd,bmd->bcm", qh.kernel.astype(f32), k) * scale
            lbias = jnp.einsum("d,bmd->bm", qh.bias.astype(f32), k) * scale
            vp = jnp.einsum("bmd,dc->bmc", v, ph.kernel.astype(f32))
            # N-row side: one GEMM in, softmax, one GEMM out.
            logits = (
                jnp.einsum(
                    "bnc,bcm->bnm",
                    x.reshape(b, h * w, c).astype(cdt),
                    kq.astype(cdt),
                    preferred_element_type=f32,
                )
                + lbias[:, None, :]
            )
            p = jax.nn.softmax(logits, axis=-1).astype(cdt)
            out = jnp.einsum(
                "bnm,bmc->bnc", p, vp.astype(cdt), preferred_element_type=f32
            ) + ph.bias.astype(f32)
            out = out.astype(cdt).reshape(b, h, w, self.dim)
            return out if residual is None else residual + out

        # Fully-fused attention sub-block (projections + softmax in one
        # VMEM-resident Pallas kernel; kernels/fused_attention.py): wins
        # where XLA's chain of small batched GEMMs is latency-bound —
        # measured +0.8 ms/block at stage 3 @B128 bf16. Gates: token count
        # (stage 1's N=6400 favors XLA), lane-aligned head_dim, qkv biases
        # present (all zoo models), inference only (no VJP).
        use_fused = (
            self.use_pallas
            and self.qkv_bias
            and h * w <= _attn_token_gate()
            and head_dim % 64 == 0
            and _fused_backend_ok()
        )
        if use_fused:
            qh = _DenseHolder(c, self.dim, name="q")
            kvh = _DenseHolder(c, 2 * self.dim, name="kv")
            ph = _DenseHolder(self.dim, self.dim, name="proj")
            cdt = self.dtype
            out = fused_attention(
                x.reshape(b, h * w, c).astype(cdt),
                kv_in.astype(cdt),
                qh.kernel.astype(cdt),
                qh.bias,
                kvh.kernel.astype(cdt),
                kvh.bias,
                ph.kernel.astype(cdt),
                ph.bias,
                self.num_heads,
                scale,
                residual=(
                    None
                    if residual is None
                    else residual.reshape(b, h * w, self.dim).astype(cdt)
                ),
            )
            return out.reshape(b, h, w, self.dim)

        q = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="q")(x)
        q = q.reshape(b, h * w, self.num_heads, head_dim)
        kv = nn.Dense(
            2 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="kv"
        )(kv_in)
        kv = kv.reshape(b, -1, 2, self.num_heads, head_dim)
        k, v = kv[:, :, 0], kv[:, :, 1]

        # (b, heads, N, M) logits; fp32 softmax accumulation.
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
        out = out.reshape(b, h, w, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        return out if residual is None else residual + out


class _AttnParams(nn.Module):
    """Parameter surface of SRAttention for the whole-block fused path:
    computes kv_in (the real sr conv + LayerNorm) and exposes the q/kv/proj
    projection weights. Param tree is identical to SRAttention's."""

    dim: int
    sr_ratio: int
    ln_eps: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, ln1):
        b, h, w, c = ln1.shape
        if self.sr_ratio > 1:
            kv_in = nn.Conv(
                self.dim,
                kernel_size=(self.sr_ratio, self.sr_ratio),
                strides=(self.sr_ratio, self.sr_ratio),
                padding="VALID",
                dtype=self.dtype,
                name="sr",
            )(ln1)
            kv_in = nn.LayerNorm(
                epsilon=self.ln_eps, dtype=self.dtype, name="norm"
            )(kv_in)
            kv_in = kv_in.reshape(b, -1, c)
        else:
            kv_in = ln1.reshape(b, h * w, c)
        qh = _DenseHolder(c, self.dim, name="q")
        kvh = _DenseHolder(c, 2 * self.dim, name="kv")
        ph = _DenseHolder(self.dim, self.dim, name="proj")
        cdt = self.dtype
        return kv_in, (
            qh.kernel.astype(cdt), qh.bias,
            kvh.kernel.astype(cdt), kvh.bias,
            ph.kernel.astype(cdt), ph.bias,
        )


class _FFNParams(nn.Module):
    """Parameter surface of MixFFN for the whole-block fused path (tree
    identical to MixFFN's fc1/dwconv/fc2)."""

    dim: int
    hidden_dim: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self):
        fc1 = _DenseHolder(self.dim, self.hidden_dim, name="fc1")
        dw = _ConvHolder(3, 3, 1, self.hidden_dim, name="dwconv")
        fc2 = _DenseHolder(self.hidden_dim, self.dim, name="fc2")
        cdt = self.dtype
        return (
            fc1.kernel.astype(cdt), fc1.bias,
            dw.kernel.astype(cdt), dw.bias,
            fc2.kernel.astype(cdt), fc2.bias,
        )


class Block(nn.Module):
    """Pre-LN transformer block: x + attn(LN(x)); x + ffn(LN(x)).

    Reference: mix_transformers.py:144-202."""

    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: int = 4
    qkv_bias: bool = True
    ln_eps: float = 1e-6
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    fuse_ffn: bool = False
    # Whole-block fused kernel (kernels/fused_block.py): attention + LN2 +
    # MixFFN + both skips in one VMEM-resident program. Inference-only;
    # identical param tree. Gates itself to stages whose full token grid
    # fits scoped VMEM (stages 3-4 at the zoo resolution).
    fuse_block: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        head_dim = self.dim // max(self.num_heads, 1)
        if (
            self.fuse_block
            and deterministic
            and self.qkv_bias
            and self.dim % self.num_heads == 0
            and head_dim % 64 == 0
            and _fused_backend_ok()
        ):
            b, h, w, c = x.shape
            msr = (h // self.sr_ratio) * (w // self.sr_ratio)
            if fused_block_viable(
                b, h * w, c, self.dim * self.mlp_ratio, msr, self.num_heads,
                itemsize=jnp.dtype(self.dtype).itemsize,
            ):
                ln1 = nn.LayerNorm(
                    epsilon=self.ln_eps, dtype=self.dtype, name="norm1"
                )(x)
                kv_in, aw = _AttnParams(
                    self.dim, self.sr_ratio, self.ln_eps, self.dtype,
                    name="attn",
                )(ln1)
                ln2 = _LayerNormParams(self.dim, name="norm2")
                fw = _FFNParams(
                    self.dim, self.dim * self.mlp_ratio, self.dtype,
                    name="mlp",
                )()
                cdt = self.dtype
                out = fused_block(
                    ln1.reshape(b, h * w, c).astype(cdt),
                    kv_in.astype(cdt),
                    x.reshape(b, h * w, c).astype(cdt),
                    *aw, ln2.scale, ln2.bias, *fw,
                    self.num_heads, head_dim**-0.5, h, w, self.ln_eps,
                )
                return out.reshape(b, h, w, c)
        attn = SRAttention(
            self.dim,
            self.num_heads,
            self.sr_ratio,
            self.qkv_bias,
            self.ln_eps,
            self.dtype,
            self.use_pallas,
            name="attn",
        )
        ln1 = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm1")(x)
        # NOTE: folding the skip connection into the fused kernel
        # (attn(ln1, residual=x)) was measured NET SLOWER e2e (617 -> 611
        # img/s @B128): the extra VMEM block forces smaller batch tiles,
        # which costs more than the saved external add. Keep the add here.
        x = x + DropPath(self.drop_path, name="drop_path1")(
            attn(ln1), deterministic
        )
        ffn_out = MixFFN(
            self.dim * self.mlp_ratio, self.dim, self.dtype, self.fuse_ffn, name="mlp"
        )(nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm2")(x))
        x = x + DropPath(self.drop_path, name="drop_path2")(ffn_out, deterministic)
        return x


class OverlapPatchEmbed(nn.Module):
    """Strided overlapping conv + LayerNorm.

    Reference: mix_transformers.py:205-249."""

    dim: int
    patch_size: int
    stride: int
    ln_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.stride, self.stride),
            padding=self.patch_size // 2,
            dtype=self.dtype,
            name="proj",
        )(x)
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm")(x)
        return x


class MixViT(nn.Module):
    """4-stage MiT encoder producing stride 4/8/16/32 feature maps (NHWC).

    Reference: mix_transformers.py:252-494 (MixVisionTransformer).
    """

    spec: BackboneConfig = BackboneConfig()
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    fuse_ffn: bool = False
    fuse_block: bool = False
    # jax.checkpoint each Block for the backward pass (training memory);
    # same param tree (lifted transforms keep the module name/scope).
    remat: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> Tuple[jnp.ndarray, ...]:
        spec = self.spec
        # static_argnums=(2,): `deterministic` is a python bool branching
        # the trace (dropout on/off), not a traced value
        block_cls = nn.remat(Block, static_argnums=(2,)) if self.remat else Block
        total_depth = sum(spec.depths)
        # linear stochastic-depth decay (mix_transformers.py:306-308)
        dpr = [
            spec.drop_path_rate * i / max(total_depth - 1, 1)
            for i in range(total_depth)
        ]
        outs = []
        cur = 0
        for s in range(4):
            x = OverlapPatchEmbed(
                dim=spec.dims[s],
                patch_size=7 if s == 0 else 3,
                stride=4 if s == 0 else 2,
                ln_eps=spec.ln_eps,
                dtype=self.dtype,
                name=f"patch_embed{s + 1}",
            )(x)
            for i in range(spec.depths[s]):
                x = block_cls(
                    dim=spec.dims[s],
                    num_heads=spec.num_heads[s],
                    sr_ratio=spec.sr_ratios[s],
                    mlp_ratio=spec.mlp_ratio,
                    qkv_bias=spec.qkv_bias,
                    ln_eps=spec.ln_eps,
                    drop_path=dpr[cur + i],
                    dtype=self.dtype,
                    use_pallas=self.use_pallas,
                    fuse_ffn=self.fuse_ffn,
                    fuse_block=self.fuse_block,
                    name=f"block{s + 1}_{i}",
                )(x, deterministic)
            x = nn.LayerNorm(epsilon=spec.ln_eps, dtype=self.dtype, name=f"norm{s + 1}")(x)
            outs.append(x)
        return tuple(outs)
