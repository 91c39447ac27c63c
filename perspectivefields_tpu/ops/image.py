"""Image resampling as matrix multiplication — the TPU-native resize.

Resizes in this framework are expressed as two small dense matmuls
(H-weights @ image @ W-weights^T) with weight matrices precomputed on host for
the static (in, out) shape pair. This keeps every resize on the MXU, makes the
semantics exact by construction, and lets XLA fuse the resize into surrounding
ops — replacing three different resampling stacks in the reference:

* ``F.interpolate(mode='bilinear', align_corners=False)`` — used by the decode
  heads' 2x upsampling (reference: persformer_heads/decode_head.py:284-287)
  and by postprocess resize-back (utils.py:483-507).
* PIL uint8 bilinear — the preprocessing resize to 320x320 (reference:
  perspectivefields.py:38-46). ``pil_resize_uint8`` reproduces Pillow's
  fixed-point path bit-exactly on host; ``make_resize_matrix('pil_bilinear')``
  gives the float equivalent for on-device fast-path preprocessing.
* ``F.interpolate(mode='nearest')`` — ParamNet's 320->64 field downsample
  (reference: param_network/param_network.py:197).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

_PRECISION_BITS = 32 - 8 - 2  # Pillow's fixed-point precision for 8bpc


def _torch_bilinear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) weights matching F.interpolate(mode='bilinear',
    align_corners=False, antialias=False)."""
    m = np.zeros((out_size, in_size), dtype=np.float64)
    if in_size == out_size:
        np.fill_diagonal(m, 1.0)
        return m
    # torch computes the source index in float32 (opmath_t) — emulate exactly
    # so the weights are bit-identical to torch's for f32 tensors.
    scale = np.float32(in_size) / np.float32(out_size)
    for i in range(out_size):
        src = np.maximum(
            scale * np.float32(i + 0.5) - np.float32(0.5), np.float32(0.0)
        )
        i0 = int(np.floor(src))
        i1 = min(i0 + 1, in_size - 1)
        w1 = float(src - np.float32(i0))
        m[i, i0] += 1.0 - w1
        m[i, i1] += w1
    return m


def _pil_coeffs(in_size: int, out_size: int):
    """Pillow's precompute_coeffs for the triangle (bilinear) filter.

    Returns (bounds, weights): per-output-pixel (xmin, count) and float
    weights, matching Pillow's Resample.c precompute_coeffs.
    """
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 1.0 * filterscale  # triangle filter support == 1
    ksize = int(np.ceil(support)) * 2 + 1
    bounds = np.zeros((out_size, 2), dtype=np.int64)
    weights = np.zeros((out_size, ksize), dtype=np.float64)
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = int(center - support + 0.5)
        xmin = max(xmin, 0)
        xmax = int(center + support + 0.5)
        xmax = min(xmax, in_size)
        n = xmax - xmin
        ww = 0.0
        for x in range(n):
            arg = (x + xmin - center + 0.5) / filterscale
            w = max(0.0, 1.0 - abs(arg))  # triangle filter
            weights[xx, x] = w
            ww += w
        if ww != 0.0:
            weights[xx, :n] /= ww
        bounds[xx] = (xmin, n)
    return bounds, weights


def _pil_bilinear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) float weights matching PIL bilinear (box-filtered when
    downscaling) — the float-exact version of Pillow's kernel."""
    bounds, weights = _pil_coeffs(in_size, out_size)
    m = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        xmin, n = bounds[i]
        m[i, xmin : xmin + n] = weights[i, :n]
    return m


def _nearest_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) selection matrix matching F.interpolate(mode='nearest'):
    src = floor(i * in / out)."""
    m = np.zeros((out_size, in_size), dtype=np.float64)
    idx = np.minimum((np.arange(out_size) * in_size) // out_size, in_size - 1)
    m[np.arange(out_size), idx] = 1.0
    return m


@functools.lru_cache(maxsize=256)
def make_resize_matrix(in_size: int, out_size: int, method: str = "torch_bilinear"):
    """Precompute a (out_size, in_size) resampling matrix (float32).

    method: 'torch_bilinear' | 'pil_bilinear' | 'nearest'.
    Cached per static shape pair; called at trace time only.
    """
    if method == "torch_bilinear":
        m = _torch_bilinear_matrix(in_size, out_size)
    elif method == "pil_bilinear":
        m = _pil_bilinear_matrix(in_size, out_size)
    elif method == "nearest":
        m = _nearest_matrix(in_size, out_size)
    else:
        raise ValueError(f"unknown resize method: {method}")
    return m.astype(np.float32)


def _up2x_axis_torch(x: jnp.ndarray, axis: int):
    """Exact 2x upsample along `axis` (-3 or -2 of an (..., H, W, C) array)
    matching F.interpolate(bilinear, align_corners=False):
    out[2i] = 0.25 x[i-1] + 0.75 x[i], out[2i+1] = 0.75 x[i] + 0.25 x[i+1]
    (edge-clamped). Same taps as the resize matrix row-for-row, but as
    elementwise VPU ops. Axis-native (no moveaxis): transposing outer dims
    physically reorders memory on TPU and costs full-tensor copies; slicing
    and stacking along the original axis does not."""
    axis = axis % x.ndim
    sl = [slice(None)] * x.ndim

    def take(a, b):
        s = list(sl)
        s[axis] = slice(a, b)
        return x[tuple(s)]

    prev = jnp.concatenate([take(0, 1), take(0, -1)], axis=axis)
    nxt = jnp.concatenate([take(1, None), take(-1, None)], axis=axis)
    c25 = jnp.asarray(0.25, x.dtype)
    c75 = jnp.asarray(0.75, x.dtype)
    even = c25 * prev + c75 * x
    odd = c75 * x + c25 * nxt
    # interleave: insert a length-2 axis right after `axis`, then merge.
    # For axis=-3 (H) the merge is an outer-dim reshape (free); for axis=-2
    # (W) it is one minor-dim relayout.
    y = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] *= 2
    return y.reshape(shape)


def _down2x_axis_pil(x: jnp.ndarray, axis: int):
    """Exact 2x downsample along `axis` matching PIL bilinear (antialiased
    triangle filter): interior out[i] = 0.125 x[2i-1] + 0.375 x[2i]
    + 0.375 x[2i+1] + 0.125 x[2i+2]; first/last rows renormalize the
    truncated 3-tap window (weights [0.75, 0.75, 0.25]/1.75). Identical taps
    to _pil_bilinear_matrix(2n, n), as axis-native elementwise ops (no
    moveaxis — outer-dim transposes are physical copies on TPU)."""
    axis = axis % x.ndim
    sl = [slice(None)] * x.ndim

    def take(a, b, step=1):
        s = list(sl)
        s[axis] = slice(a, b, step)
        return x[tuple(s)]

    n = x.shape[axis] // 2
    xe = take(0, None, 2)
    xo = take(1, None, 2)

    def sub(t, a, b):
        s = list(sl)
        s[axis] = slice(a, b)
        return t[tuple(s)]

    c125 = jnp.asarray(0.125, x.dtype)
    c375 = jnp.asarray(0.375, x.dtype)
    core = c375 * (sub(xe, 1, -1) + sub(xo, 1, -1)) + c125 * (
        sub(xo, 0, -2) + sub(xe, 2, None)
    )
    e = jnp.asarray(np.array([3.0, 3.0, 1.0]) / 7.0, x.dtype)
    first = e[0] * take(0, 1) + e[1] * take(1, 2) + e[2] * take(2, 3)
    last = (
        e[2] * take(2 * n - 3, 2 * n - 2)
        + e[1] * take(2 * n - 2, 2 * n - 1)
        + e[0] * take(2 * n - 1, 2 * n)
    )
    return jnp.concatenate([first, core, last], axis=axis)


def resize_bilinear(
    x: jnp.ndarray,
    out_h: int,
    out_w: int,
    method: str = "torch_bilinear",
    precision: str | None = "auto",
):
    """Resize (..., H, W, C) -> (..., out_h, out_w, C) via two matmuls.

    Runs on the MXU; weight matrices are trace-time constants. The common
    exact-2x cases (2x torch-bilinear upsample in the decode heads; 2x PIL
    downsample in 640->320 preprocessing) dispatch to phase-decomposed
    elementwise fast paths — same taps, ~100x fewer FLOPs than the dense
    matmul, and no MXU lane waste for few-channel images.

    precision: "auto" (default) picks exact 'highest' for float32 inputs
    (bit-parity with the reference resamplers) and the fast default MXU path
    for bfloat16 inputs — so a bf16 model's decoder upsamples stay bf16
    instead of silently promoting the whole head to f32. Pass an explicit
    jax precision to override.
    """
    h, w = x.shape[-3], x.shape[-2]
    # The phase fast paths are elementwise (VPU); with few channels the
    # channels-minor layout wastes most VPU lanes and the MXU matmul wins
    # (measured: 640->320 C=3 preprocess got SLOWER via phases). Gate on C.
    # Integer inputs promote to f32 first (the matrix path does this via
    # matmul dtype promotion; the elementwise taps would otherwise truncate
    # 0.25/0.75 to zero in the input dtype).
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)
    # An explicit precision override (e.g. 'highest' on bf16 input) asks for
    # the matmul path's accumulate-in-f32 semantics — the elementwise 2x fast
    # paths round per-op in the input dtype, so they only apply to "auto".
    wide = x.shape[-1] >= 8 and precision in (None, "auto")
    if wide and method == "torch_bilinear" and out_h == 2 * h and out_w == 2 * w:
        return _up2x_axis_torch(_up2x_axis_torch(x, -3), -2)
    if (
        wide
        and method == "pil_bilinear"
        and 2 * out_h == h
        and 2 * out_w == w
        and out_h >= 2
        and out_w >= 2
    ):
        # PIL resamples horizontally first (Resample.c), then vertically;
        # in exact float arithmetic the passes commute up to rounding.
        return _down2x_axis_pil(_down2x_axis_pil(x, -2), -3)
    if precision == "auto":
        precision = None if x.dtype == jnp.bfloat16 else "highest"
    mat_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    if h != out_h:
        mh = jnp.asarray(make_resize_matrix(h, out_h, method), mat_dtype)
        x = jnp.einsum("oh,...hwc->...owc", mh, x, precision=precision)
    if w != out_w:
        mw = jnp.asarray(make_resize_matrix(w, out_w, method), mat_dtype)
        x = jnp.einsum("ow,...hwc->...hoc", mw, x, precision=precision)
    return x


def make_fused_preprocess(
    in_hw, out_hw, mean, std, dtype=jnp.bfloat16, method: str = "pil_bilinear"
):
    """Build a fused device-preprocess fn: resize + per-channel normalize as
    two matmuls over (w*c)-flattened lanes.

    The H pass contracts rows with the resize matrix; the W pass multiplies
    by kron(Mw, diag(1/std)) so the channel normalize rides along for free,
    and -mean/std becomes the output bias (resize rows sum to 1, so
    normalizing after the resize equals normalizing before). Keeping (w, c)
    flattened in the lane dim avoids every elementwise op on a C=3-minor
    layout (PERF_NOTES.md: C-minor lane waste; measured ~5x faster than the
    per-op pipeline for 640->320 uint8 preprocessing at B=128).

    Returns fn(images_uint8 (B, in_h, in_w, C)) -> (B, out_h, out_w, C) in
    `dtype`, matching ``(resize_bilinear(x, ...) - mean) / std`` to dtype
    rounding.
    """
    in_h, in_w = in_hw
    out_h, out_w = out_hw
    mean64 = np.asarray(mean, np.float64)
    std64 = np.asarray(std, np.float64)
    c = mean64.shape[0]
    mh = jnp.asarray(make_resize_matrix(in_h, out_h, method), dtype)
    mw64 = _pil_bilinear_matrix(in_w, out_w) if method == "pil_bilinear" else (
        _torch_bilinear_matrix(in_w, out_w)
    )
    kr = jnp.asarray(
        np.einsum("ow,cd->wcod", mw64, np.diag(1.0 / std64)).reshape(
            in_w * c, out_w * c
        ),
        dtype,
    )
    bias = jnp.asarray(np.tile(-mean64 / std64, out_w), dtype)

    def fn(images):
        b = images.shape[0]
        xf = images.reshape(b, in_h, in_w * c).astype(dtype)
        x = jnp.einsum("oh,bhX->boX", mh, xf)
        return (x.reshape(b * out_h, in_w * c) @ kr + bias).reshape(
            b, out_h, out_w, c
        )

    return fn


def resize_nearest(x: jnp.ndarray, out_h: int, out_w: int):
    """Nearest-neighbor resize matching torch F.interpolate(mode='nearest')."""
    h, w = x.shape[-3], x.shape[-2]
    idx_h = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    idx_w = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return x[..., idx_h, :, :][..., :, idx_w, :]


# ---------------------------------------------------------------------------
# Bit-exact Pillow uint8 resize (host-side, numpy)
# ---------------------------------------------------------------------------


def _pil_int_weights(in_size: int, out_size: int) -> np.ndarray:
    """Pillow's normalize_coeffs_8bpc: float weights -> fixed-point int32
    with round-half-away-from-zero at 22 bits."""
    m = _pil_bilinear_matrix(in_size, out_size)
    scaled = m * (1 << _PRECISION_BITS)
    return np.where(scaled < 0, (scaled - 0.5).astype(np.int64), (scaled + 0.5).astype(np.int64))


def _pil_pass(img: np.ndarray, out_size: int, axis: int) -> np.ndarray:
    """One fixed-point resampling pass over `axis` with clip8 rounding,
    mirroring Pillow's ImagingResampleHorizontal_8bpc."""
    in_size = img.shape[axis]
    kk = _pil_int_weights(in_size, out_size)  # (out, in) int64
    x = np.moveaxis(img.astype(np.int64), axis, 0)  # (in, ...)
    acc = np.tensordot(kk, x, axes=(1, 0))  # (out, ...)
    acc += 1 << (_PRECISION_BITS - 1)
    out = np.clip(acc >> _PRECISION_BITS, 0, 255).astype(np.uint8)
    # Pillow's clip8 clamps negative accumulators to 0 before the shift;
    # for acc < 0 the arithmetic shift floors, so reclamp explicitly.
    out = np.where(acc <= 0, np.uint8(0), out)
    return np.moveaxis(out, 0, axis)


def pil_resize_uint8(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bit-exact reimplementation of PIL.Image.resize(BILINEAR) for uint8
    HWC / HW images (horizontal pass then vertical pass, fixed-point,
    intermediate uint8 rounding — Pillow's Resample.c two-pass pipeline).

    This is the preprocessing resize of the reference
    (perspectivefields.py:38-46); validated bit-exact against Pillow in
    tests/test_image.py.
    """
    assert img.dtype == np.uint8
    out = img
    if img.shape[1] != out_w:
        out = _pil_pass(out, out_w, axis=1)
    if img.shape[0] != out_h:
        out = _pil_pass(out, out_h, axis=0)
    return out
