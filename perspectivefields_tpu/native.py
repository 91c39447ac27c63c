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


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO):
            try:
                subprocess.run(
                    ["make", "-C", _DIR], check=True, capture_output=True
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.pf_pil_resize_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ]
        lib.pf_preprocess_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.pf_num_threads.restype = ctypes.c_int
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


def num_threads() -> int:
    lib = _load()
    return lib.pf_num_threads() if lib else 1
