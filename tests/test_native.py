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


def test_numpy_fallback_matches_native_shape():
    rng = np.random.default_rng(3)
    batch = rng.integers(0, 256, size=(2, 50, 70, 3), dtype=np.uint8)
    mean = np.array([10.0, 20.0, 30.0], np.float32)
    std = np.array([1.0, 2.0, 3.0], np.float32)
    out = native.preprocess_batch(batch, 32, 32, mean, std)
    assert out.shape == (2, 32, 32, 3) and out.dtype == np.float32
