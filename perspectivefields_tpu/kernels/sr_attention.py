"""Fused spatial-reduction attention (Pallas TPU kernel + XLA fallback).

The MiT backbone's attention (reference: mix_transformers.py:108-141) has a
distinctive shape: N query tokens (up to 6400 at stage 1) attend to M = N/sr^2
spatially-reduced K/V tokens (as few as 100). The whole (N, M) logit tile fits
in VMEM, so the kernel computes QK^T -> softmax -> @V in one pass per
(batch, head) without materializing logits in HBM.

Use `sr_attention(..., force_xla=True)` (or backbone use_pallas=False) for the
plain-XLA path; both are numerically equivalent (fp32 softmax accumulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xla_sr_attention(q, k, v, scale):
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, v)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # Blocks: q (1, TN, D), k (1, M, D), v (1, M, D) for one (batch*head, tile).
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    logits = (
        jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p,
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "force_xla"))
def sr_attention(q, k, v, scale: float, force_xla: bool = False):
    """Attention with small KV set.

    Args:
        q: (B, N, H, D) queries.
        k, v: (B, M, H, D) spatially-reduced keys/values.
        scale: softmax scale (head_dim ** -0.5).
    Returns:
        (B, N, H, D) attention output.
    """
    if force_xla or jax.default_backend() != "tpu":
        return _xla_sr_attention(q, k, v, scale)

    b, n, h, d = q.shape
    m = k.shape[1]
    # Flatten (batch, head) into the grid; tile N with the largest divisor
    # of n <= 1024 (n = H*W is highly composite: 6400 -> 800, 1600 -> 800).
    tn = n
    if n > 1024:
        tn = next((t for t in range(1024, 0, -1) if n % t == 0), n)
    if tn == n and n > 4096:  # pathological prime-ish N: fall back
        return _xla_sr_attention(q, k, v, scale)

    qf = q.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, m, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, m, d)

    grid = (b * h, n // tn)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tn, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, m, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, m, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tn, d), lambda i, j: (i, j, 0)),
    )(qf, kf, vf)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
