"""Fully-fused SR-attention block: QKV projections + softmax + out-proj.

Motivation (attn-precision probe, PERF_NOTES.md round 2; B=128 bf16): the backbone's attention
is latency-bound, not FLOP-bound — ~2.3 ms per stage-3 block against a
~0.03 ms matmul floor, because XLA executes it as a chain of small batched
GEMMs (per-head M=400, N=100, K=64) with the (B, H, N, M) logits and every
projection intermediate round-tripping HBM. Across the 28 MiT blocks that
is ~40 ms of a ~217 ms batch.

This kernel runs the whole sub-block per batch-tile in VMEM:

    q = x @ Wq + bq                       (bb*N, C)   one wide GEMM
    kv = kv_in @ Wkv + bkv                (bb*M, 2C)
    per (item, head):  softmax_f32(q k^T * scale) @ v
    out = concat_heads @ Wproj + bproj    (bb*N, C)

Weights are grid-invariant blocks (fetched once, stay VMEM-resident);
logits never touch HBM. Numerics match the XLA path: f32 logit
accumulation and softmax, cast to the compute dtype before @v (see
models/mit.py SRAttention).

KV length M (= N/sr^2, as small as 100) is padded to a multiple of 8 for
DMA sublane alignment; padded key columns are masked to -inf before the
softmax.

Reference semantics: mix_transformers.py:108-141 (Attention.forward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Scoped-VMEM working-set budget (MB) for the batch-tile (bb) picker below.
# 13 MB fits Mosaic's default 16 MB scoped window; values above it lift the
# window via vmem_limit_bytes so larger batch tiles take FEWER grid steps
# (the s1lab finding: the sub-block is grid-step bound, and bb=8 vs bb=4
# recovered 0.5 ms at the stage-1 shape). Module attribute so e2e A/B
# probes can patch it (tools/bench_ab.py @...VMEM_BUDGET_MB=56).
VMEM_BUDGET_MB = 13

# Whether to pass an explicit vmem_limit_bytes at the default budget (the
# historical behavior passed NO compiler params there). Attributed as a
# REAL +0.46% e2e win (627.2 vs 624.3, same-moment A/B, PERF_NOTES round
# 5): Mosaic's implicit default window picks a slightly worse schedule
# for this kernel's grid.
VMEM_EXPLICIT_LIMIT = True

# The pinned window size (MB) at the default budget. 16 won the sweep
# (PERF_NOTES round 5); raised budgets ignore this and use 2x budget.
VMEM_LIMIT_MB = 16


def _xla_reference(x, kv_in, wq, bq, wkv, bkv, wproj, bproj, num_heads, scale):
    """Unfused path (used on non-TPU backends and in parity tests)."""
    b, n, c = x.shape
    m = kv_in.shape[1]
    dh = c // num_heads
    q = (jnp.dot(x, wq) + bq).reshape(b, n, num_heads, dh)
    kv = (jnp.dot(kv_in, wkv) + bkv).reshape(b, m, 2, num_heads, dh)
    k, v = kv[:, :, 0], kv[:, :, 1]
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
    return jnp.dot(out, wproj) + bproj


def _attn_core(
    x, kv_ref, wq_ref, bq_ref, wkv_ref, bkv_ref, wp_ref, bp_ref,
    *, num_heads: int, scale: float, m_true: int, bb: int, n: int,
):
    """Attention math on VMEM values: x (bb*n, c) LN'd tokens ->
    (bb*n, c) projected attention output. Shared by the attention-only
    kernel below and the whole-block kernel (fused_block.py).

    Mosaic constraint: stay strictly 2-D — reshapes that split/merge the
    lane (last) dim don't lower ("unsupported shape cast"). Heads are
    addressed with static 2-D slices instead (dh = 64 in every MiT stage,
    lane-aligned)."""
    c = x.shape[-1]
    mpad = kv_ref.shape[1]
    dh = c // num_heads
    cdt = x.dtype

    q = (
        jax.lax.dot_general(
            x, wq_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bq_ref[...].astype(jnp.float32)
    ).astype(cdt)  # (bb*n, c)
    kvf = kv_ref[...].reshape(bb * mpad, c)
    kv = (
        jax.lax.dot_general(
            kvf, wkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bkv_ref[...].astype(jnp.float32)
    ).astype(cdt)  # (bb*mpad, 2c): cols [k heads | v heads]

    # mask for padded kv rows: (1, mpad) f32, 0 for valid, -inf for pad
    col = jax.lax.broadcasted_iota(jnp.int32, (1, mpad), 1)
    neg = jnp.where(col < m_true, 0.0, -jnp.inf).astype(jnp.float32)

    outs = []
    for i in range(bb):
        qi_all = q[i * n : (i + 1) * n, :]          # (n, c)
        kvi = kv[i * mpad : (i + 1) * mpad, :]      # (mpad, 2c)
        heads = []
        for h in range(num_heads):
            qi = qi_all[:, h * dh : (h + 1) * dh]   # (n, dh)
            ki = kvi[:, h * dh : (h + 1) * dh]      # (mpad, dh)
            vi = kvi[:, c + h * dh : c + (h + 1) * dh]
            logits = (
                jax.lax.dot_general(
                    qi, ki, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
                + neg
            )
            mx = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - mx)
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(cdt)
            heads.append(
                jax.lax.dot_general(
                    p, vi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(cdt)
            )
        outs.append(
            heads[0] if num_heads == 1 else jnp.concatenate(heads, axis=-1)
        )  # (n, c)
    o = outs[0] if bb == 1 else jnp.concatenate(outs, axis=0)  # (bb*n, c)
    return (
        jax.lax.dot_general(
            o, wp_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bp_ref[...].astype(jnp.float32)
    ).astype(cdt)


def _kernel(
    *refs, num_heads: int, scale: float, m_true: int, has_res: bool
):
    if has_res:
        (x_ref, kv_ref, res_ref, wq_ref, bq_ref, wkv_ref, bkv_ref, wp_ref,
         bp_ref, o_ref) = refs
    else:
        (x_ref, kv_ref, wq_ref, bq_ref, wkv_ref, bkv_ref, wp_ref, bp_ref,
         o_ref) = refs
        res_ref = None
    bb, n, c = x_ref.shape

    x = x_ref[...].reshape(bb * n, c)  # major-dim collapse only
    o = _attn_core(
        x, kv_ref, wq_ref, bq_ref, wkv_ref, bkv_ref, wp_ref, bp_ref,
        num_heads=num_heads, scale=scale, m_true=m_true, bb=bb, n=n,
    )
    o = o.reshape(bb, n, c)
    if res_ref is not None:
        # pre-LN residual folded in (saves the external add's HBM round trip)
        o = res_ref[...] + o
    o_ref[...] = o


def fused_attention(
    x, kv_in, wq, bq, wkv, bkv, wproj, bproj, num_heads: int, scale: float,
    force_xla: bool = False, residual=None, interpret: bool = False,
):
    """Attention sub-block (projections included) on (B, N, C) tokens.

    Args:
        x: (B, N, C) LN'd tokens (queries).
        kv_in: (B, M, C) spatially-reduced + LN'd tokens for K/V.
        wq/bq: (C, C)/(C,); wkv/bkv: (C, 2C)/(2C,); wproj/bproj: (C, C)/(C,).
        residual: optional (B, N, C) tensor added to the output inside the
            kernel (the transformer block's pre-LN skip connection).
        interpret: run the Pallas kernel in interpreter mode (CPU tests of
            the kernel body — tiling, KV masking, head slicing); without it
            non-TPU backends take the XLA reference path.
    Returns:
        (B, N, C) — ``residual + attn`` when residual is given, else attn.

    This eager wrapper resolves ``VMEM_BUDGET_MB`` at call (i.e. outer
    trace) time and passes it to the jitted body as a STATIC argument: a
    nested-jit body that read the module attribute directly would cache
    its jaxpr keyed on avals/statics only, so A/B probes patching the
    attribute between builds would silently re-measure the first
    variant's program.
    """
    limit_mb = (
        VMEM_LIMIT_MB
        if VMEM_BUDGET_MB <= 13
        else min(100, 2 * VMEM_BUDGET_MB)
    )
    return _fused_attention(
        x, kv_in, wq, bq, wkv, bkv, wproj, bproj, num_heads, scale,
        force_xla, residual, interpret, vmem_budget_mb=VMEM_BUDGET_MB,
        explicit_limit=VMEM_EXPLICIT_LIMIT, limit_mb=limit_mb,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "scale", "force_xla", "interpret", "vmem_budget_mb",
        "explicit_limit", "limit_mb",
    ),
)
def _fused_attention(
    x, kv_in, wq, bq, wkv, bkv, wproj, bproj, num_heads: int, scale: float,
    force_xla: bool = False, residual=None, interpret: bool = False,
    *, vmem_budget_mb: int = 13, explicit_limit: bool = True,
    limit_mb: int = 16,
):
    if force_xla or (not interpret and jax.default_backend() != "tpu"):
        out = _xla_reference(
            x, kv_in, wq, bq, wkv, bkv, wproj, bproj, num_heads, scale
        )
        return out if residual is None else residual + out

    b, n, c = x.shape
    m = kv_in.shape[1]
    mpad = -(-m // 8) * 8
    if mpad != m:
        kv_in = jnp.pad(kv_in, ((0, 0), (0, mpad - m), (0, 0)))

    # Query tile: big N (stage 1: 6400) is processed in tn-token tiles with
    # the (tiny) K/V set and all weights grid-invariant. tn = largest
    # divisor of n <= 1600.
    tn = n
    if n > 2048:
        tn = next((t for t in range(1600, 0, -1) if n % t == 0), n)

    # batch tile sized against the 16 MB scoped-VMEM limit. Honest
    # accounting (validated against Mosaic's reported stack usage): the
    # token-sized values live roughly as x + q_cdt + per-item outs + output
    # [+ residual] at itemsize bytes each, plus the q/o f32 transients at
    # 4 bytes each: (4 + has_res)*itemsize + 8 bytes per token-channel,
    # plus (4 + itemsize)*mpad of softmax state per token. At bf16
    # (tn=400, c=320, bb=8) this predicts 16.4 MB — exactly the 17.5 MB
    # overflow Mosaic reported there.
    isz = x.dtype.itemsize
    per_bb = tn * (
        c * ((4 + (1 if residual is not None else 0)) * isz + 8)
        + mpad * (4 + isz)
    )
    budget = vmem_budget_mb * 2**20
    if per_bb > budget:
        # even a single batch item overflows scoped VMEM (large non-default
        # resolutions) — use the identical-math XLA path instead
        out = _xla_reference(
            x, kv_in[:, :m], wq, bq, wkv, bkv, wproj, bproj, num_heads, scale
        )
        return out if residual is None else residual + out
    bb = 1
    for cand in (16, 8, 4, 2, 1):
        if b % cand == 0 and cand * per_bb <= budget:
            bb = cand
            break

    grid = (b // bb, n // tn)
    in_specs = [
        pl.BlockSpec((bb, tn, c), lambda i, j: (i, j, 0)),
        pl.BlockSpec((bb, mpad, c), lambda i, j: (i, 0, 0)),
    ]
    args = [x, kv_in]
    if residual is not None:
        in_specs.append(pl.BlockSpec((bb, tn, c), lambda i, j: (i, j, 0)))
        args.append(residual)
    in_specs += [
        pl.BlockSpec((c, c), lambda i, j: (0, 0)),
        pl.BlockSpec((c,), lambda i, j: (0,)),
        pl.BlockSpec((c, 2 * c), lambda i, j: (0, 0)),
        pl.BlockSpec((2 * c,), lambda i, j: (0,)),
        pl.BlockSpec((c, c), lambda i, j: (0, 0)),
        pl.BlockSpec((c,), lambda i, j: (0,)),
    ]
    args += [wq, bq, wkv, bkv, wproj, bproj]
    out = pl.pallas_call(
        functools.partial(
            _kernel, num_heads=num_heads, scale=scale, m_true=m,
            has_res=residual is not None,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, tn, c), lambda i, j: (i, j, 0)),
        # explicit_limit=False restores the historical no-compiler-params
        # call (Mosaic's own default window); True pins limit_mb (a
        # measured +0.46% at 16 MB, PERF_NOTES round 5).
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=limit_mb * 2**20)
            if explicit_limit
            else None
        ),
        interpret=interpret,
    )(*args)
    return out
