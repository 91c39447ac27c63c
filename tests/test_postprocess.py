"""Postprocess parity vs torch oracles of the reference semantics.

Oracles replicate the documented behavior: gravity rescales vector components
by (W/320, H/320) BEFORE the spatial resize then renormalizes
(gravity_head.py:237-261); latitude resizes then asin->degrees
(latitude_head.py:195-219); classification decodes bins first.
"""

import numpy as np
import torch
import torch.nn.functional as F

from perspectivefields_tpu.ops.codec import decode_bin, decode_bin_latitude
from perspectivefields_tpu.ops.postprocess import (
    postprocess_gravity,
    postprocess_latitude,
)


def _interp(chw, oh, ow):
    return F.interpolate(
        torch.from_numpy(chw)[None], size=(oh, ow), mode="bilinear", align_corners=False
    )[0].numpy()


def test_gravity_regression_postprocess_matches_oracle():
    rng = np.random.default_rng(0)
    net = rng.normal(size=(20, 20, 2)).astype(np.float32)
    net /= np.linalg.norm(net, axis=-1, keepdims=True)
    oh, ow = 37, 53
    got = np.asarray(postprocess_gravity(net, (20, 20), oh, ow, "regression"))

    scale = np.array([ow / 20, oh / 20], np.float32)
    vec = (net * scale).transpose(2, 0, 1)
    vec = _interp(vec, oh, ow)
    vec = vec / np.maximum(np.linalg.norm(vec, axis=0, keepdims=True), 1e-12)
    want = vec.transpose(1, 2, 0)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_gravity_classification_postprocess_matches_oracle():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(16, 16, 73)).astype(np.float32)
    oh, ow = 32, 24
    got = np.asarray(
        postprocess_gravity(logits, (16, 16), oh, ow, "classification", 73)
    )
    bins = logits.argmax(-1)
    vec = np.asarray(decode_bin(bins, 73))  # (h, w, 2)
    scale = np.array([ow / 16, oh / 16], np.float32)
    v = (vec * scale).transpose(2, 0, 1)
    v = _interp(v, oh, ow)
    v = v / np.maximum(np.linalg.norm(v, axis=0, keepdims=True), 1e-12)
    np.testing.assert_allclose(got, v.transpose(1, 2, 0), atol=1e-5)


def test_latitude_regression_postprocess_matches_oracle():
    rng = np.random.default_rng(2)
    net = rng.uniform(-1, 1, size=(20, 20, 1)).astype(np.float32)
    oh, ow = 41, 29
    got = np.asarray(postprocess_latitude(net, (20, 20), oh, ow, "regression"))
    lat = _interp(net.transpose(2, 0, 1), oh, ow)[0]
    want = np.degrees(np.arcsin(np.clip(lat, -1, 1)))
    # asin amplifies f32 rounding near |x| = 1
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_latitude_classification_postprocess_matches_oracle():
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(16, 16, 180)).astype(np.float32)
    oh, ow = 24, 24
    got = np.asarray(
        postprocess_latitude(logits, (16, 16), oh, ow, "classification", 180)
    )
    binmap = logits.argmax(-1)
    lat = np.asarray(decode_bin_latitude(binmap, 180)).astype(np.float32)
    want = _interp(lat[None], oh, ow)[0]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_gravity_postprocess_upscale_aspect_change():
    """Non-square resize exercises the pre-resize component scaling."""
    rng = np.random.default_rng(4)
    net = rng.normal(size=(10, 10, 2)).astype(np.float32)
    got = np.asarray(postprocess_gravity(net, (10, 10), 40, 20, "regression"))
    assert got.shape == (40, 20, 2)
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-5)
