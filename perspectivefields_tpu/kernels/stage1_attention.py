"""Stage-1-specialized fused SR-attention: lane-packed single-head kernel.

Why a second attention kernel exists (VERDICT r4 next-#1): the generic
fused_attention kernel LOSES to XLA at MiT stage 1 (-1.7 ms/block,
PERF_NOTES round 3) and is token-gated off there. Stage 1's shapes are
pathological for both XLA and the generic kernel:

    N = 6400 tokens, C = 64 channels, num_heads = 1, M = N/64 KV tokens

C = 64 is HALF the TPU register lane width (128), so every N-row GEMM in
the sub-block (q proj, logits, p@v, out proj) runs its stationary operand
and its output at 50% lane utilization, and XLA additionally round-trips
the (B, 6400, ~100) logits through HBM.

This kernel exploits num_heads == 1 + C == 64 with a **bitwise-free lane
packing**: `(B, N, 64) -> (B, N/2, 128)` is a row-major reinterpretation
(token 2t in lanes 0-63, token 2t+1 in lanes 64-127), done by plain
reshape outside the kernel. Inside, per batch item:

    q    = xp @ blockdiag(Wq, Wq) + [bq|bq]      (rows/2, 128) full lanes
    kv   = kv_in @ Wkv + bkv                     (Mpad, 128)   tiny
    l1   = q[:, :64] @ k^T * scale  (+ -inf KV-pad mask)   f32
    l2   = q[:, 64:] @ k^T * scale  (+ mask)               f32
    p1,2 = softmax_f32(l1,2) -> cdt
    o    = [p1 @ v | p2 @ v]                     (rows/2, 128) re-packed
    out  = o @ blockdiag(Wp, Wp) + [bp|bp]  (+ packed residual)

The N-row projections run 128-wide with K = 128 contractions (2x the FLOPs
of the unpacked form — irrelevant, the sub-block is latency/bandwidth
bound, not FLOP bound); the packed layout halves the sublane row count;
logits/softmax state never touch HBM; KV is padded to Mpad = 128 so every
lane slice in the kernel is 128-aligned. Numerics match the XLA path
exactly as fused_attention does: f32 logit accumulation and softmax, cast
to the compute dtype before @v.

Reference semantics: mix_transformers.py:108-141 (Attention.forward with
num_heads=1, sr_ratio=8 — the stage-1 row of every MiT variant).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_attention import _xla_reference

# KV tokens are padded to a full lane register so the packed q/k/v lane
# slices stay 128-aligned. Stage 1 at the zoo resolution has M = 100; any
# M <= 128 shape class is eligible.
MPAD = 128


def _kernel(*refs, scale: float, m_true: int, has_res: bool):
    if has_res:
        (xp_ref, kv_ref, res_ref, wq2_ref, bq2_ref, wkv_ref, bkv_ref,
         wp2_ref, bp2_ref, o_ref) = refs
    else:
        (xp_ref, kv_ref, wq2_ref, bq2_ref, wkv_ref, bkv_ref, wp2_ref,
         bp2_ref, o_ref) = refs
        res_ref = None
    bb, tr, c2 = xp_ref.shape      # c2 = 128 = two packed 64-ch tokens
    c = c2 // 2
    mpad = kv_ref.shape[1]
    cdt = xp_ref.dtype

    xp = xp_ref[...].reshape(bb * tr, c2)  # major-dim collapse only
    q = (
        jax.lax.dot_general(
            xp, wq2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bq2_ref[...].astype(jnp.float32)
    ).astype(cdt)  # (bb*tr, 128) packed queries
    kvf = kv_ref[...].reshape(bb * mpad, c)
    kv = (
        jax.lax.dot_general(
            kvf, wkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bkv_ref[...].astype(jnp.float32)
    ).astype(cdt)  # (bb*mpad, 128): lanes [k | v]

    # -inf for the padded KV columns (exp -> 0, so they drop out of softmax)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, mpad), 1)
    neg = jnp.where(col < m_true, 0.0, -jnp.inf).astype(jnp.float32)

    def _soft_pv(qh, k, v):
        logits = (
            jax.lax.dot_general(
                qh, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
            + neg
        )
        mx = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - mx)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(cdt)
        return jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cdt)

    outs = []
    for i in range(bb):
        qi = q[i * tr : (i + 1) * tr, :]
        kvi = kv[i * mpad : (i + 1) * mpad, :]
        k, v = kvi[:, :c], kvi[:, c:]
        o1 = _soft_pv(qi[:, :c], k, v)   # even tokens (tr, 64)
        o2 = _soft_pv(qi[:, c:], k, v)   # odd tokens  (tr, 64)
        outs.append(jnp.concatenate([o1, o2], axis=-1))  # packed (tr, 128)
    o = outs[0] if bb == 1 else jnp.concatenate(outs, axis=0)
    out = (
        jax.lax.dot_general(
            o, wp2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bp2_ref[...].astype(jnp.float32)
    ).astype(cdt)
    out = out.reshape(bb, tr, c2)
    if res_ref is not None:
        out = res_ref[...] + out
    o_ref[...] = out


def _blockdiag2(w):
    """(c, c) -> (2c, 2c) blockdiag(w, w). Tiny; XLA hoists it out of any
    surrounding scan (loop-invariant w.r.t. the params)."""
    c = w.shape[0]
    z = jnp.zeros((c, c), w.dtype)
    return jnp.concatenate(
        [jnp.concatenate([w, z], 1), jnp.concatenate([z, w], 1)], 0
    )


def eligible(n: int, c: int, m: int, num_heads: int) -> bool:
    """Shape class this kernel accelerates: single-head 64-channel stages
    with an even token count and a KV set that fits one lane register."""
    return num_heads == 1 and c == 64 and n % 2 == 0 and m <= MPAD


@functools.partial(
    jax.jit, static_argnames=("scale", "force_xla", "interpret")
)
def stage1_attention(
    x, kv_in, wq, bq, wkv, bkv, wproj, bproj, scale: float,
    force_xla: bool = False, residual=None, interpret: bool = False,
):
    """Single-head attention sub-block on (B, N, 64) tokens, lane-packed.

    Same contract as kernels.fused_attention.fused_attention restricted to
    num_heads == 1, C == 64, even N, M <= 128 (check with ``eligible``
    first). ``residual`` is folded in inside the kernel.
    """
    b, n, c = x.shape
    m = kv_in.shape[1]
    if not eligible(n, c, m, 1):
        raise ValueError(f"stage1_attention: ineligible shape n={n} c={c} m={m}")
    if force_xla or (not interpret and jax.default_backend() != "tpu"):
        out = _xla_reference(x, kv_in, wq, bq, wkv, bkv, wproj, bproj, 1, scale)
        return out if residual is None else residual + out

    half = n // 2
    xp = x.reshape(b, half, 2 * c)  # bitwise-free packing
    resp = None if residual is None else residual.reshape(b, half, 2 * c)
    if m < MPAD:
        kv_in = jnp.pad(kv_in, ((0, 0), (0, MPAD - m), (0, 0)))

    # VMEM accounting per (item, row-tile), bytes: packed-lane values live
    # as x + q(cdt) + out(cdt) + output [+ residual] at itemsize each plus
    # q/out f32 transients (8), and per packed row 2 x (mpad f32 logits +
    # mpad cdt p) of softmax state.
    isz = x.dtype.itemsize

    def per_bb_bytes(tr):
        return tr * (
            2 * c * ((3 + (1 if residual is not None else 0)) * isz + 8)
            + 2 * MPAD * (4 + isz)
        )

    # The sub-block is grid-step-overhead bound, not FLOP bound (a 128-step
    # tiling measured 2.77 ms vs the 0.4 ms traffic floor at the stage-1
    # bench shape) — so take the FEWEST steps VMEM allows: full token rows
    # per step, batch tile as large as fits a 56 MB working budget (the
    # physical VMEM is 128 MB; vmem_limit_bytes below lifts Mosaic's 16 MB
    # default scoped ceiling, same approach as decoder_tail.py).
    budget = 56 * 2**20
    # tr must stay sublane-tile aligned (16 rows covers bf16's 16 and
    # f32's 8): the kernel collapses (bb, tr, 128) -> (bb*tr, 128), and
    # Mosaic rejects that reshape for non-tile-aligned row counts (e.g. a
    # 90x90 grid -> half=4050 passes eligible() but 4050 % 16 != 0).
    tr = half
    if half % 16 or per_bb_bytes(tr) > budget:
        # fall back to row tiling for very large grids (non-zoo resolutions)
        tr = next(
            (t for t in range(half, 0, -1)
             if half % t == 0 and t % 16 == 0 and per_bb_bytes(t) <= budget),
            0,
        )
    if tr == 0:
        out = _xla_reference(
            x, kv_in[:, :m], wq, bq, wkv, bkv, wproj, bproj, 1, scale
        )
        return out if residual is None else residual + out
    per_bb = per_bb_bytes(tr)
    bb = 1
    for cand in (16, 8, 4, 2, 1):
        if b % cand == 0 and cand * per_bb <= budget:
            bb = cand
            break

    wq2, bq2 = _blockdiag2(wq), jnp.concatenate([bq, bq])
    wp2, bp2 = _blockdiag2(wproj), jnp.concatenate([bproj, bproj])

    grid = (b // bb, half // tr)
    in_specs = [
        pl.BlockSpec((bb, tr, 2 * c), lambda i, j: (i, j, 0)),
        pl.BlockSpec((bb, MPAD, c), lambda i, j: (i, 0, 0)),
    ]
    args = [xp, kv_in]
    if resp is not None:
        in_specs.append(pl.BlockSpec((bb, tr, 2 * c), lambda i, j: (i, j, 0)))
        args.append(resp)
    in_specs += [
        pl.BlockSpec((2 * c, 2 * c), lambda i, j: (0, 0)),
        pl.BlockSpec((2 * c,), lambda i, j: (0,)),
        pl.BlockSpec((c, 2 * c), lambda i, j: (0, 0)),
        pl.BlockSpec((2 * c,), lambda i, j: (0,)),
        pl.BlockSpec((2 * c, 2 * c), lambda i, j: (0, 0)),
        pl.BlockSpec((2 * c,), lambda i, j: (0,)),
    ]
    args += [wq2, bq2, wkv, bkv, wp2, bp2]
    out = pl.pallas_call(
        functools.partial(
            _kernel, scale=scale, m_true=m, has_res=resp is not None
        ),
        out_shape=jax.ShapeDtypeStruct((b, half, 2 * c), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, tr, 2 * c), lambda i, j: (i, j, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(b, n, c)  # unpack: bitwise-free
