"""Fused MixFFN kernel (Pallas TPU): Dense(C->4C) -> 3x3 depthwise conv ->
GELU -> Dense(4C->C), VMEM-resident.

The MiT backbone's MixFFN (reference: mix_transformers.py:14-56 Mlp +
:497-508 DWConv; models/mit.py MixFFN) is HBM-bound under XLA: the 4C
hidden tensor makes ~5 round trips of up to 4x the input size per block
(fc1 out, dwconv in/out, gelu in/out, fc2 in). At B=128 stage 1
(80^2 x 64ch, hidden 256) that is ~2.5 GB of HBM traffic for ~54 GFLOP of
matmul — measured ~5.4 ms/block where compute alone is ~1.5 ms.

This kernel tiles rows with a 1-px halo, computes fc1 on the halo'd tile,
zero-masks the halo that falls outside the image (the reference zero-pads
the *hidden* map, not the input), applies the 3x3 depthwise conv as 3
sublane-shifted column windows x 3 free row shifts with f32 accumulation,
then GELU (A&S-polynomial erf — Mosaic has no erf primitive) and fc2.
HBM traffic: one read of x, one write of out.

Numerics: matmuls accumulate in f32; dw accumulates in f32; GELU in f32.
Verified against the flax MixFFN in tests/test_mixffn_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .convnext_block import _gelu_f32


def _ffn_kernel(
    x_hbm, w1, b1, dwk, dwb, w2, b2, out_ref, xbuf, sem,
    *, nb, th, w, wp, c, hdim, nrows,
):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    # xbuf rows = th+2 halo'd rows of the (3-row zero-padded... 1-row) input
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(bi * nb, nb), pl.ds(i * th, th + 2)], xbuf, sem
    )
    cp.start()
    cp.wait()

    cdt = xbuf.dtype
    # fc1 on the full halo'd tile (pad rows/cols are zero in xbuf, but
    # fc1(0) = b1 != 0 — mask the hidden map back to zero there, matching
    # the reference's zero padding of the *hidden* tensor).
    m = jnp.dot(
        xbuf[:].reshape(nb * (th + 2) * wp, c), w1[:],
        preferred_element_type=jnp.float32,
    ) + b1[:].astype(jnp.float32)
    m = m.reshape(nb, th + 2, wp, hdim)
    # mask: valid image rows are [1, 1+nrows) within the padded array row
    # space [i*th, i*th + th+2); valid cols are [1, 1+w) within wp.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (nb, th + 2, wp, 1), 1) + i * th
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (nb, th + 2, wp, 1), 2)
    valid = (
        (row_ids >= 1)
        & (row_ids < 1 + nrows)
        & (col_ids >= 1)
        & (col_ids < 1 + w)
    )
    m = jnp.where(valid, m, 0.0).astype(cdt)

    # 3x3 depthwise conv: 3 column windows x 3 free row shifts, f32 acc
    acc = jnp.zeros((nb, th, w, hdim), jnp.float32)
    for dq in range(3):
        mdq = m[:, :, dq : dq + w, :]
        for dp in range(3):
            tap = dwk[dp, dq].astype(jnp.float32)
            acc = acc + mdq[:, dp : dp + th].astype(jnp.float32) * tap
    g = _gelu_f32(acc + dwb[:].astype(jnp.float32), cdt)

    out = jnp.dot(
        g.reshape(nb * th * w, hdim).astype(cdt), w2[:],
        preferred_element_type=jnp.float32,
    ) + b2[:].astype(jnp.float32)
    out_ref[:] = out.reshape(nb, th, w, out.shape[-1]).astype(out_ref.dtype)


def mixffn_fused(
    x, w1, b1, dwk, dwb, w2, b2,
    *, th=None, nb=None, interpret=None, pad_lanes=None,
):
    """MixFFN(x): fc1 -> dw3x3 -> gelu -> fc2 for x (B, H, W, C).

    w1: (C, hdim); dwk: (3, 3, 1, hdim); w2: (hdim, C).
    interpret=None auto-selects interpreter mode off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if pad_lanes is None:
        pad_lanes = not interpret
    b, h, w, c = x.shape
    hdim = w1.shape[1]
    c_out = w2.shape[1]
    c_real_out = c_out
    # Mosaic DMA lane alignment: pad input channels to a multiple of 128
    # (zero rows in w1 make this exact); hidden/out dims are handled by the
    # MXU's own padding, but the *output* DMA needs 128-aligned lanes too.
    if pad_lanes:
        cpad = -(-c // 128) * 128
        if cpad != c:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cpad - c)))
            w1 = jnp.pad(w1, ((0, cpad - c), (0, 0)))
            c = cpad
        opad = -(-c_out // 128) * 128
        if opad != c_out:
            w2 = jnp.pad(w2, ((0, 0), (0, opad - c_out)))
            b2 = jnp.pad(b2, (0, opad - c_out))
            c_out = opad
    if th is None:
        th = min(h, max(8, 2048 // w))
    while h % th:
        th -= 1

    def _tile_bytes(nb_, th_):
        # xbuf (cdt) + hidden map m (transient f32 + cdt copy) + f32 acc +
        # weight blocks — all scaled by the actual compute itemsize
        isz = x.dtype.itemsize
        wp_ = -(-(w + 2) // 8) * 8
        return (
            nb_
            * (
                (th_ + 2) * wp_ * (c * isz + hdim * (4 + isz))
                + th_ * w * hdim * 4
            )
            + (c * hdim + hdim * c_out) * isz
        )

    if nb is None:
        nb = max(1, 2048 // (th * max(w, 1)))
        while b % nb:
            nb -= 1
        # respect the 16 MB scoped-VMEM limit (wide-hidden stages at small
        # spatial dims otherwise overflow: stage-4 2048-hidden blew 19.7 MB)
        while nb > 1 and _tile_bytes(nb, th) > 11 * 2**20:
            nb -= 1
            while b % nb:
                nb -= 1
    while th > 8 and _tile_bytes(nb, th) > 11 * 2**20:
        nt = th - 1
        while nt > 1 and h % nt:
            nt -= 1
        if nt >= th:
            break
        th = nt
    wp = -(-(w + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    dwk2 = dwk.reshape(3, 3, hdim)
    grid = (b // nb, h // th)
    out = pl.pallas_call(
        functools.partial(
            _ffn_kernel, nb=nb, th=th, w=w, wp=wp, c=c, hdim=hdim, nrows=h,
        ),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(
            (nb, th, w, c_out), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((nb, th + 2, wp, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * (c * hdim + hdim * c_out + 9 * hdim),
            bytes_accessed=b * h * w * (c + c_out) * x.dtype.itemsize,
            transcendentals=b * h * w * hdim,
        ),
        interpret=interpret,
    )(xp, w1, b1, dwk2, dwb, w2, b2)
    return out[..., :c_real_out] if c_out != c_real_out else out
