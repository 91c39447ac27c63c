"""Fused decoder-tail kernel (Pallas TPU): concat -> conv3x3+relu ->
2x bilinear upsample -> conv3x3+relu -> 1x1 pred, in one VMEM-resident pass.

The SegFormer decoder tail (reference: gravity_head.py:170-176 /
latitude_head.py:169-175) is bandwidth-bound under XLA: at batch 64 it
materializes ~23 GB of intermediates in HBM (concat 4.2GB, conv0 out, the
2x-upsampled 320^2 x 64ch tensor 3.4GB, conv1 out ...). This kernel tiles the
image over rows, keeps every intermediate in VMEM, and writes only the final
(B, 2H, 2W, out) field — ~5x less HBM traffic. Inputs stay in HBM and each
program DMAs its row-tile + halo into scratch (overlapping windows are not
expressible with plain BlockSpecs).

Semantics are bit-faithful to the XLA composition (same zero-padding for the
convs, align_corners=False half-pixel upsampling with edge clamp); verified
against the unfused path in tests/test_decoder_tail.py (interpret mode on CPU
+ real TPU).

Conv-in-kernel strategy: 3x3 conv = 9 shifted (rows*W, Cin) @ (Cin, Cout)
MXU matmuls accumulated in f32 — K=320 for conv0 keeps the MXU busy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def xla_decoder_tail(a, ll, w0, b0, w1, b1, wp, bp):
    """Reference XLA composition (the unfused path)."""
    from ..ops.image import resize_bilinear

    x = jnp.concatenate([a, ll.astype(a.dtype)], axis=-1)
    x = lax.conv_general_dilated(
        x, w0.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b0.astype(x.dtype)
    x = jax.nn.relu(x)
    h, w = x.shape[1], x.shape[2]
    x = resize_bilinear(x, 2 * h, 2 * w, "torch_bilinear")
    x = lax.conv_general_dilated(
        x, w1.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b1.astype(x.dtype)
    x = jax.nn.relu(x)
    wp4 = wp.reshape(1, 1, wp.shape[-2], wp.shape[-1])
    x = lax.conv_general_dilated(
        x, wp4.astype(x.dtype), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bp.astype(x.dtype)
    return x


def _up2_axis0(c):
    """2x upsample along axis 0, align_corners=False interior formula.

    c: (K+1, ...) rows; returns (2K, ...) rows [2*1-1 .. 2*K) in c-row*2
    coordinates: out[2k-1] = 0.75 c[k-1] + 0.25 c[k]; out[2k] = 0.25 c[k-1]
    + 0.75 c[k]... concretely produces interleaved (odd, even) pairs for
    k = 1..K. Border clamping is the caller's job (halo rows).
    """
    lo = c[:-1]
    hi = c[1:]
    odd = 0.75 * lo + 0.25 * hi
    even = 0.25 * lo + 0.75 * hi
    k, *rest = odd.shape
    return jnp.stack([odd, even], axis=1).reshape(2 * k, *rest)


def _conv3x3(xpad, w_flat, out_rows: int, out_cols: int, cin: int, cout: int):
    """xpad: (out_rows+2, out_cols+2, cin) padded buffer; w_flat (9, cin,
    cout). Returns f32 (out_rows, out_cols, cout)."""
    acc = jnp.zeros((out_rows * out_cols, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = xpad[dy : dy + out_rows, dx : dx + out_cols, :].reshape(
                out_rows * out_cols, cin
            )
            acc += lax.dot_general(
                tap,
                w_flat[dy * 3 + dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return acc.reshape(out_rows, out_cols, cout)


def _tail_kernel(
    a_hbm, ll_hbm, w0_ref, b0_ref, w1_ref, b1_ref, wp_ref, bp_ref, o_ref,
    *, th: int, w: int, ca: int, cl: int, c0: int, c1: int, co: int,
):
    bi = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    dtype = o_ref.dtype
    cin = ca + cl
    first = t == 0
    last = t == n_t - 1

    def body(abuf, llbuf, sem_a, sem_l):
        # inputs are pre-padded by 2 rows, so rows [t*th, t*th+th+4) cover
        # image rows [t*th-2, t*th+th+2)
        cpa = pltpu.make_async_copy(
            a_hbm.at[bi, pl.ds(t * th, th + 4)], abuf, sem_a
        )
        cpl = pltpu.make_async_copy(
            ll_hbm.at[bi, pl.ds(t * th, th + 4)], llbuf, sem_l
        )
        cpa.start()
        cpl.start()
        cpa.wait()
        cpl.wait()

        # zero-padded concat buffer (W padding = conv zero pad); built with
        # concats — Mosaic has no scatter lowering for .at[].set
        inner = jnp.concatenate([abuf[:], llbuf[:]], axis=-1)
        zcol = jnp.zeros((th + 4, 1, cin), dtype)
        buf = jnp.concatenate([zcol, inner, zcol], axis=1)

        # conv0 + relu for rows [t*th-1, t*th+th+1) (th+2 rows incl. halo)
        c0f = _conv3x3(buf, w0_ref[:], th + 2, w, cin, c0)
        c0v = jax.nn.relu(c0f + b0_ref[:].astype(jnp.float32)).astype(dtype)
        # at the true image border the halo row came from zero padding —
        # replace with the edge row (upsample index clamp semantics)
        top = jnp.where(first, c0v[1:2], c0v[0:1])
        bot = jnp.where(last, c0v[th : th + 1], c0v[th + 1 : th + 2])
        c0v = jnp.concatenate([top, c0v[1 : th + 1], bot], axis=0)

        # 2x upsample rows: (th+2, w, c0) -> (2th+2, w, c0), rows
        # [2*t*th-1, 2*t*th+2th+1) — exactly conv1's row halo
        u = _up2_axis0(c0v)
        # 2x upsample cols with edge clamp, then conv1's zero col padding
        u_t = u.transpose(1, 0, 2)
        u_t = jnp.concatenate([u_t[:1], u_t, u_t[-1:]], axis=0)
        uc = _up2_axis0(u_t)  # (2w+2, 2th+2, c0): col halo ±1 built in
        uc = uc.transpose(1, 0, 2)  # (2th+2, 2w+2, c0)
        zc = jnp.zeros((2 * th + 2, 1, c0), uc.dtype)
        uc = jnp.concatenate([zc, uc[:, 1 : 2 * w + 1, :], zc], axis=1)
        zr = jnp.zeros((1, 2 * w + 2, c0), uc.dtype)
        topr = jnp.where(first, zr, uc[0:1])
        botr = jnp.where(last, zr, uc[2 * th + 1 : 2 * th + 2])
        uc = jnp.concatenate([topr, uc[1 : 2 * th + 1], botr], axis=0)

        c1f = _conv3x3(uc.astype(dtype), w1_ref[:], 2 * th, 2 * w, c0, c1)
        c1v = jax.nn.relu(c1f + b1_ref[:].astype(jnp.float32)).astype(dtype)

        y = lax.dot_general(
            c1v.reshape(2 * th * 2 * w, c1),
            wp_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bp_ref[:].astype(jnp.float32)
        o_ref[0] = y.reshape(2 * th, 2 * w, co).astype(dtype)

    pl.run_scoped(
        body,
        pltpu.VMEM((th + 4, w, ca), dtype),
        pltpu.VMEM((th + 4, w, cl), dtype),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("tile_rows", "force_xla", "interpret"))
def decoder_tail(a, ll, w0, b0, w1, b1, wp, bp, tile_rows: int = 16,
                 force_xla: bool = False, interpret: bool = False):
    """Fused decoder tail.

    Args:
        a: (B, H, W, Ca) fusion-pyramid output (256ch at stride 2).
        ll: (B, H, W, Cl) low-level features (64ch).
        w0: (3, 3, Ca+Cl, C0), b0: (C0,) — first fuse conv (+relu).
        w1: (3, 3, C0, C1), b1: (C1,) — post-upsample conv (+relu).
        wp: (1, 1, C1, Co) or (C1, Co), bp: (Co,) — prediction 1x1 conv.
    Returns:
        (B, 2H, 2W, Co), dtype of `a`.
    """
    b, h, w, ca = a.shape
    cl = ll.shape[-1]
    c0 = w0.shape[-1]
    c1 = w1.shape[-1]
    wp2 = wp.reshape(wp.shape[-2], wp.shape[-1]) if wp.ndim == 4 else wp
    co = wp2.shape[-1]

    on_tpu = jax.default_backend() == "tpu"
    if force_xla or (not on_tpu and not interpret) or h % tile_rows != 0:
        return xla_decoder_tail(a, ll, w0, b0, w1, b1, wp2, bp)

    dtype = a.dtype
    # manual HBM->VMEM DMA requires the minor dim to be lane-aligned (128):
    # pad channel dims with zeros and add matching zero input rows to w0
    def _lane_pad(n):
        return (-n) % 128

    ca_pad, cl_pad = _lane_pad(ca), _lane_pad(cl)
    ap = jnp.pad(a, ((0, 0), (2, 2), (0, 0), (0, ca_pad)))
    llp = jnp.pad(ll.astype(dtype), ((0, 0), (2, 2), (0, 0), (0, cl_pad)))
    # w0's input rows reordered to [a | a_pad | ll | ll_pad]
    w0p = jnp.concatenate(
        [
            w0[:, :, :ca, :],
            jnp.zeros((3, 3, ca_pad, c0), w0.dtype),
            w0[:, :, ca:, :],
            jnp.zeros((3, 3, cl_pad, c0), w0.dtype),
        ],
        axis=2,
    )
    ca, cl = ca + ca_pad, cl + cl_pad
    w0f = w0p.reshape(9, ca + cl, c0).astype(dtype)
    w1f = w1.reshape(9, c0, c1).astype(dtype)

    grid = (b, h // tile_rows)
    kernel = functools.partial(
        _tail_kernel, th=tile_rows, w=w, ca=ca, cl=cl, c0=c0, c1=c1, co=co
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 2 * h, 2 * w, co), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, ca + cl, c0), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((c0,), lambda i, j: (0,)),
            pl.BlockSpec((9, c0, c1), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((c1,), lambda i, j: (0,)),
            pl.BlockSpec((c1, co), lambda i, j: (0, 0)),
            pl.BlockSpec((co,), lambda i, j: (0,)),
        ],
        out_specs=pl.BlockSpec(
            (1, 2 * tile_rows, 2 * w, co), lambda i, j: (i, j, 0, 0)
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(ap, llp, w0f, b0.astype(dtype), w1f, b1.astype(dtype), wp2.astype(dtype),
      bp.astype(dtype))
