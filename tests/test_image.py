"""Resize-as-matmul parity vs torch F.interpolate and bit-exactness vs PIL."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from PIL import Image

from perspectivefields_tpu.ops import (
    pil_resize_uint8,
    resize_bilinear,
    resize_nearest,
)


@pytest.mark.parametrize(
    "in_hw,out_hw,channels",
    [((17, 23), (34, 46), 3), ((160, 160), (320, 320), 3),
     ((320, 320), (240, 427), 3), ((10, 10), (20, 20), 3),
     ((64, 48), (31, 77), 3),
     # C >= 8 exercises the phase-decomposed exact-2x fast path
     ((40, 40), (80, 80), 16), ((10, 12), (20, 24), 64)],
)
def test_bilinear_matches_torch_interpolate(in_hw, out_hw, channels):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, *in_hw, channels)).astype(np.float32)
    want = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=out_hw,
            mode="bilinear",
            align_corners=False,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    got = np.asarray(resize_bilinear(x, *out_hw, "torch_bilinear"))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((320, 320), (64, 64)), ((13, 9), (7, 5))])
def test_nearest_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, *in_hw, 2)).astype(np.float32)
    want = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw, mode="nearest")
        .permute(0, 2, 3, 1)
        .numpy()
    )
    got = np.asarray(resize_nearest(x, *out_hw))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((480, 640), (320, 320)), ((320, 320), (320, 320)), ((123, 457), (320, 320)),
     ((100, 100), (320, 320)), ((1080, 1920), (320, 320))],
)
def test_pil_resize_bit_exact(in_hw, out_hw):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(*in_hw, 3), dtype=np.uint8)
    want = np.asarray(
        Image.fromarray(img).resize((out_hw[1], out_hw[0]), Image.BILINEAR)
    )
    got = pil_resize_uint8(img, *out_hw)
    np.testing.assert_array_equal(got, want)


def test_pil_resize_grayscale():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(200, 317), dtype=np.uint8)
    want = np.asarray(Image.fromarray(img, mode="L").resize((320, 320), Image.BILINEAR))
    got = pil_resize_uint8(img, 320, 320)
    np.testing.assert_array_equal(got, want)


def test_device_pil_matrix_close_to_exact():
    """The on-device float 'pil_bilinear' fast path stays within 1 LSB of the
    bit-exact host path (used when preprocessing runs fully on TPU)."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(480, 640, 3), dtype=np.uint8)
    exact = pil_resize_uint8(img, 320, 320).astype(np.float32)
    approx = np.asarray(
        resize_bilinear(img.astype(np.float32), 320, 320, "pil_bilinear")
    )
    assert np.max(np.abs(np.round(approx) - exact)) <= 1.0


def test_fused_preprocess_matches_exact_pipeline():
    """ops/image.make_fused_preprocess == resize-then-normalize to dtype
    rounding (f32 here for exactness)."""
    import jax.numpy as jnp

    from perspectivefields_tpu.ops.image import (
        make_fused_preprocess,
        resize_bilinear,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(2, 64, 64, 3), dtype=np.uint8)
    mean = np.array([103.53, 116.28, 123.675], np.float32)
    std = np.array([2.0, 1.0, 3.0], np.float32)
    fn = make_fused_preprocess((64, 64), (32, 32), mean, std, jnp.float32)
    got = np.asarray(fn(jnp.asarray(img)))
    ref = (
        np.asarray(resize_bilinear(jnp.asarray(img, jnp.float32), 32, 32, "pil_bilinear"))
        - mean
    ) / std
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-5)


def test_phase_fast_path_integer_input_promotes():
    """Exact-2x phase fast paths (C>=8 gate) must promote integer inputs to
    f32 like the matrix path, not truncate the 0.25/0.75 taps to zero."""
    import jax.numpy as jnp
    import numpy as np

    from perspectivefields_tpu.ops.image import resize_bilinear

    rng = np.random.default_rng(0)
    x_u8 = jnp.asarray(rng.integers(0, 256, size=(1, 8, 8, 16)), jnp.uint8)
    up = resize_bilinear(x_u8, 16, 16, "torch_bilinear")  # fast path (C=16)
    ref = resize_bilinear(x_u8.astype(jnp.float32), 16, 16, "torch_bilinear")
    assert up.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(up), np.asarray(ref), atol=1e-5)
    assert float(jnp.max(up)) > 1.0  # not all zeros

    x_d = jnp.asarray(rng.integers(0, 256, size=(1, 16, 16, 16)), jnp.uint8)
    down = resize_bilinear(x_d, 8, 8, "pil_bilinear")
    ref_d = resize_bilinear(x_d.astype(jnp.float32), 8, 8, "pil_bilinear")
    np.testing.assert_allclose(np.asarray(down), np.asarray(ref_d), atol=1e-5)
    assert float(jnp.max(down)) > 1.0
