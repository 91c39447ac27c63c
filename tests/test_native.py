"""Native preprocessing library: bit-exactness + fallback parity."""

import numpy as np
import pytest
from PIL import Image

from perspectivefields_tpu import native


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_resize_bit_exact_vs_pil():
    rng = np.random.default_rng(0)
    for in_hw in [(480, 640), (123, 457), (1080, 1920)]:
        img = rng.integers(0, 256, size=(*in_hw, 3), dtype=np.uint8)
        want = np.asarray(Image.fromarray(img).resize((320, 320), Image.BILINEAR))
        got = native.pil_resize_uint8(img, 320, 320)
        np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_batch_matches_pil_plus_normalize():
    rng = np.random.default_rng(1)
    batch = rng.integers(0, 256, size=(4, 200, 300, 3), dtype=np.uint8)
    mean = np.array([103.53, 116.28, 123.675], np.float32)
    std = np.array([1.0, 1.0, 1.0], np.float32)
    got = native.preprocess_batch(batch, 320, 320, mean, std)
    for i in range(4):
        ref = np.asarray(
            Image.fromarray(batch[i]).resize((320, 320), Image.BILINEAR)
        ).astype(np.float32)
        np.testing.assert_array_equal(got[i], (ref - mean) / std)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_bgr_flip():
    rng = np.random.default_rng(2)
    batch = rng.integers(0, 256, size=(2, 64, 64, 3), dtype=np.uint8)
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    flipped = native.preprocess_batch(batch, 64, 64, mean, std, bgr_flip=True)
    plain = native.preprocess_batch(batch, 64, 64, mean, std, bgr_flip=False)
    np.testing.assert_array_equal(flipped, plain[..., ::-1])


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_resize_batch_u8_bit_exact():
    rng = np.random.default_rng(4)
    batch = rng.integers(0, 256, size=(3, 200, 300, 3), dtype=np.uint8)
    got = native.resize_batch_u8(batch, 320, 320)
    for i in range(3):
        want = np.asarray(
            Image.fromarray(batch[i]).resize((320, 320), Image.BILINEAR)
        )
        np.testing.assert_array_equal(got[i], want)
    flipped = native.resize_batch_u8(batch, 320, 320, bgr_flip=True)
    np.testing.assert_array_equal(flipped, got[..., ::-1])


def test_resize_list_matches_batch_and_pads():
    """Pointer-array gather-resize == stacked-batch resize; pad_to repeats
    the last frame (native and numpy fallback agree on the contract)."""
    rng = np.random.default_rng(5)
    frames = [
        rng.integers(0, 256, size=(100, 150, 3), dtype=np.uint8)
        for _ in range(3)
    ]
    got = native.resize_list_u8(frames, 64, 64, pad_to=5)
    assert got.shape == (5, 64, 64, 3)
    want = native.resize_batch_u8(np.stack(frames), 64, 64)
    np.testing.assert_array_equal(got[:3], want)
    np.testing.assert_array_equal(got[3], got[2])
    np.testing.assert_array_equal(got[4], got[2])


def test_preprocess_list_matches_batch():
    rng = np.random.default_rng(6)
    frames = [
        rng.integers(0, 256, size=(90, 70, 3), dtype=np.uint8)
        for _ in range(2)
    ]
    mean = np.array([10.0, 20.0, 30.0], np.float32)
    std = np.array([1.0, 2.0, 3.0], np.float32)
    got = native.preprocess_list(frames, 48, 48, mean, std, bgr_flip=True)
    want = native.preprocess_batch(
        np.stack(frames), 48, 48, mean, std, bgr_flip=True
    )
    np.testing.assert_array_equal(got, want)


def test_numpy_fallback_matches_native_shape():
    rng = np.random.default_rng(3)
    batch = rng.integers(0, 256, size=(2, 50, 70, 3), dtype=np.uint8)
    mean = np.array([10.0, 20.0, 30.0], np.float32)
    std = np.array([1.0, 2.0, 3.0], np.float32)
    out = native.preprocess_batch(batch, 32, 32, mean, std)
    assert out.shape == (2, 32, 32, 3) and out.dtype == np.float32


def test_mismatched_frame_raises():
    """A frame whose shape/dtype differs from the batch's first frame must
    raise a clean ValueError (never reach the native gather: that would be
    an out-of-bounds read)."""
    import pytest

    rng = np.random.default_rng(9)
    good = rng.integers(0, 256, size=(50, 60, 3), dtype=np.uint8)
    small = rng.integers(0, 256, size=(40, 60, 3), dtype=np.uint8)
    floaty = good.astype(np.float32)
    if native.available():
        with pytest.raises(ValueError, match="frame 1"):
            native.resize_list_u8([good, small], 32, 32)
        with pytest.raises(ValueError, match="frame 1"):
            native.preprocess_list(
                [good, floaty], 32, 32, np.zeros(3, np.float32),
                np.ones(3, np.float32),
            )
    with pytest.raises(ValueError):
        native.resize_list_u8([], 32, 32)
