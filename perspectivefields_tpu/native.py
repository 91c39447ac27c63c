"""ctypes bindings for the native preprocessing library (native/).

Builds on first use if g++ is available; every entry point has a pure-numpy
fallback (ops.image.pil_resize_uint8), so the package works without a
toolchain. The native path is the host-side hot loop for high-throughput
serving: batched PIL-exact resize + normalize with OpenMP.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SO = os.path.join(_DIR, "libpf_preprocess.so")
_lock = threading.Lock()
_lib = None
_tried = False


# set by _bind: does the loaded .so export the pointer-gather entry points
# (added after the stacked-batch ones)? A prebuilt .so from an older source
# revision that can't be rebuilt (no toolchain) keeps its working stacked
# entry points; only the ptr paths degrade.
_has_ptrs = False


def _bind(lib) -> None:
    """Declare argtypes per symbol GROUP: the core entry points are
    mandatory (raises AttributeError -> caller treats the .so as unusable),
    the newer pointer-gather ones are optional (missing -> _has_ptrs stays
    False and resize_list_u8/preprocess_list fall back to stack + the
    stacked native path instead of disabling native entirely)."""
    global _has_ptrs
    lib.pf_pil_resize_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    lib.pf_preprocess_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
    ]
    lib.pf_resize_batch_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.pf_num_threads.restype = ctypes.c_int
    try:
        lib.pf_resize_batch_u8_ptrs.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.pf_preprocess_batch_ptrs.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        _has_ptrs = True
    except AttributeError:
        _has_ptrs = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        # ALWAYS run make before the first dlopen: it is a no-op when the .so
        # is current, and it rebuilds a stale one from an older source
        # revision. Rebuilding after a failed CDLL would not help — dlopen
        # caches handles by path, so a same-process reload of the same path
        # returns the stale mapping.
        try:
            subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
        except Exception:
            if not os.path.exists(_SO):
                return None
        try:
            lib = ctypes.CDLL(_SO)
            _bind(lib)
        except (OSError, AttributeError):
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def pil_resize_uint8(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bit-exact PIL bilinear resize (native if available, numpy fallback)."""
    lib = _load()
    img = np.ascontiguousarray(img)
    if lib is None or img.ndim != 3:
        from .ops.image import pil_resize_uint8 as np_resize

        return np_resize(img, out_h, out_w)
    out = np.empty((out_h, out_w, img.shape[2]), np.uint8)
    lib.pf_pil_resize_u8(
        img.ctypes.data, img.shape[0], img.shape[1], img.shape[2],
        out.ctypes.data, out_h, out_w,
    )
    return out


def preprocess_batch(
    imgs: np.ndarray,
    out_h: int,
    out_w: int,
    mean,
    std,
    bgr_flip: bool = False,
) -> np.ndarray:
    """(N, H, W, 3) uint8 -> (N, out_h, out_w, 3) float32 normalized.

    Native fused resize+normalize; numpy fallback otherwise."""
    imgs = np.ascontiguousarray(imgs)
    assert imgs.ndim == 4 and imgs.shape[-1] == 3 and imgs.dtype == np.uint8
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    lib = _load()
    if lib is None:
        from .ops.image import pil_resize_uint8 as np_resize

        out = np.empty((imgs.shape[0], out_h, out_w, 3), np.float32)
        for i, im in enumerate(imgs):
            r = np_resize(im, out_h, out_w).astype(np.float32)
            if bgr_flip:
                r = r[..., ::-1]
            out[i] = (r - mean) / std
        return out
    out = np.empty((imgs.shape[0], out_h, out_w, 3), np.float32)
    lib.pf_preprocess_batch(
        imgs.ctypes.data, imgs.shape[0], imgs.shape[1], imgs.shape[2],
        out.ctypes.data, out_h, out_w,
        mean.ctypes.data, std.ctypes.data, int(bgr_flip),
    )
    return out


def resize_batch_u8(
    imgs: np.ndarray, out_h: int, out_w: int, bgr_flip: bool = False
) -> np.ndarray:
    """(N, H, W, 3) uint8 -> (N, out_h, out_w, 3) uint8, bit-exact PIL
    bilinear. The uint8-wire serving path: 4x less host->device traffic than
    the fused float32 preprocess; normalization happens on device (it fuses
    into the first conv). Native OpenMP if available, numpy fallback."""
    imgs = np.ascontiguousarray(imgs)
    assert imgs.ndim == 4 and imgs.shape[-1] == 3 and imgs.dtype == np.uint8
    lib = _load()
    out = np.empty((imgs.shape[0], out_h, out_w, 3), np.uint8)
    if lib is None:
        from .ops.image import pil_resize_uint8 as np_resize

        for i, im in enumerate(imgs):
            r = np_resize(im, out_h, out_w)
            out[i] = r[..., ::-1] if bgr_flip else r
        return out
    lib.pf_resize_batch_u8(
        imgs.ctypes.data, imgs.shape[0], imgs.shape[1], imgs.shape[2],
        out.ctypes.data, out_h, out_w, int(bgr_flip),
    )
    return out


def _ptr_array(imgs, in_hw, pad_to: int = 0):
    """Contiguity-checked array of frame pointers, padded to ``pad_to``
    entries by repeating the last frame's pointer (zero-copy). Keeps frame
    refs alive via the returned list — the caller must hold it until the
    native call returns. Explicit validation (not assert): a mismatched
    frame handed to the native gather would be an out-of-bounds read."""
    held = [np.ascontiguousarray(im) for im in imgs]
    for i, im in enumerate(held):
        if im.shape != (*in_hw, 3) or im.dtype != np.uint8:
            raise ValueError(
                f"frame {i}: expected uint8 {(*in_hw, 3)} (the batch's first"
                f" frame shape), got {im.dtype} {im.shape}"
            )
    n = max(len(held), pad_to)
    ptrs = [im.ctypes.data for im in held]
    ptrs += [ptrs[-1]] * (n - len(held))
    return (ctypes.c_void_p * n)(*ptrs), held


def resize_list_u8(imgs, out_h: int, out_w: int, bgr_flip: bool = False,
                   pad_to: int = 0) -> np.ndarray:
    """List of (H, W, 3) uint8 frames -> (N, out_h, out_w, 3) uint8 batch,
    bit-exact PIL bilinear, WITHOUT stacking the raw frames first (the
    gather happens inside the resize — a full-frame memcpy saved per image,
    which dominates on memory-bandwidth-poor hosts). ``pad_to``: pad the
    batch to this size by repeating the last frame's pointer (zero-copy)."""
    if not imgs:
        raise ValueError("empty frame list")
    in_hw = imgs[0].shape[:2]
    n = max(len(imgs), pad_to)
    lib = _load()
    if lib is None or not _has_ptrs:
        if lib is not None:  # old .so: stacked native path (still fast)
            stacked = np.ascontiguousarray(np.stack(imgs))
            out = np.empty((len(imgs), out_h, out_w, 3), np.uint8)
            lib.pf_resize_batch_u8(
                stacked.ctypes.data, len(imgs), in_hw[0], in_hw[1],
                out.ctypes.data, out_h, out_w, int(bgr_flip),
            )
        else:
            from .ops.image import pil_resize_uint8 as np_resize

            out = np.empty((len(imgs), out_h, out_w, 3), np.uint8)
            for i, im in enumerate(imgs):
                r = np_resize(im, out_h, out_w)
                out[i] = r[..., ::-1] if bgr_flip else r
        if n > len(imgs):  # pad rows: copy the last result, don't recompute
            out = np.concatenate(
                [out, np.broadcast_to(out[-1], (n - len(imgs), *out.shape[1:]))]
            )
        return out
    ptrs, held = _ptr_array(imgs, in_hw, pad_to=n)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    lib.pf_resize_batch_u8_ptrs(
        ptrs, n, in_hw[0], in_hw[1], out.ctypes.data, out_h, out_w,
        int(bgr_flip),
    )
    del held
    return out


def preprocess_list(imgs, out_h: int, out_w: int, mean, std,
                    bgr_flip: bool = False, pad_to: int = 0) -> np.ndarray:
    """List of (H, W, 3) uint8 frames -> (N, out_h, out_w, 3) float32
    normalized batch, without stacking the raw frames first."""
    if not imgs:
        raise ValueError("empty frame list")
    in_hw = imgs[0].shape[:2]
    n = max(len(imgs), pad_to)
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    lib = _load()
    if lib is None or not _has_ptrs:
        if lib is not None:  # old .so: stacked native path (still fast)
            stacked = np.ascontiguousarray(np.stack(imgs))
            out = np.empty((len(imgs), out_h, out_w, 3), np.float32)
            lib.pf_preprocess_batch(
                stacked.ctypes.data, len(imgs), in_hw[0], in_hw[1],
                out.ctypes.data, out_h, out_w,
                mean.ctypes.data, std.ctypes.data, int(bgr_flip),
            )
        else:
            from .ops.image import pil_resize_uint8 as np_resize

            out = np.empty((len(imgs), out_h, out_w, 3), np.float32)
            for i, im in enumerate(imgs):
                r = np_resize(im, out_h, out_w)
                r = r[..., ::-1] if bgr_flip else r
                out[i] = (r.astype(np.float32) - mean) / std
        if n > len(imgs):  # pad rows: copy the last result, don't recompute
            out = np.concatenate(
                [out, np.broadcast_to(out[-1], (n - len(imgs), *out.shape[1:]))]
            )
        return out
    ptrs, held = _ptr_array(imgs, in_hw, pad_to=n)
    out = np.empty((n, out_h, out_w, 3), np.float32)
    lib.pf_preprocess_batch_ptrs(
        ptrs, n, in_hw[0], in_hw[1], out.ctypes.data, out_h, out_w,
        mean.ctypes.data, std.ctypes.data, int(bgr_flip),
    )
    del held
    return out


def num_threads() -> int:
    lib = _load()
    return lib.pf_num_threads() if lib else 1
