"""Codec parity vs torch-semantics oracles and round-trip properties."""

import numpy as np
import pytest
import torch

from perspectivefields_tpu.ops import (
    decode_bin,
    decode_bin_latitude,
    encode_bin,
    encode_bin_latitude,
)


def _torch_encode_bin(vector_field_chw: torch.Tensor, num_bin: int):
    # independent oracle with the documented semantics (channel-first like
    # the reference API): angle bins with wraparound + invalid last bin
    angle = (
        torch.atan2(vector_field_chw[1], vector_field_chw[0]) / np.pi * 180 + 180
    ) % 360
    angle_bin = torch.round(angle / (360 / (num_bin - 1))).long()
    angle_bin[angle_bin == num_bin - 1] = 0
    invalid = (vector_field_chw == 0).sum(0) == vector_field_chw.size(0)
    angle_bin[invalid] = num_bin - 1
    return angle_bin


@pytest.mark.parametrize("num_bin", [73, 361])
def test_encode_bin_matches_torch(num_bin):
    rng = np.random.default_rng(0)
    v = rng.normal(size=(2, 33, 17)).astype(np.float32)
    n = np.linalg.norm(v, axis=0, keepdims=True)
    v = v / n
    v[:, 5, 5] = 0.0  # invalid pixel
    expected = _torch_encode_bin(torch.from_numpy(v), num_bin).numpy()
    got = np.asarray(encode_bin(np.moveaxis(v, 0, -1), num_bin))
    np.testing.assert_array_equal(got, expected)


def test_encode_decode_roundtrip():
    num_bin = 73
    bins = np.arange(num_bin)
    vec = np.asarray(decode_bin(bins, num_bin))
    re = np.asarray(encode_bin(vec, num_bin))
    np.testing.assert_array_equal(re, bins)


def test_decode_bin_invalid_is_zero():
    out = np.asarray(decode_bin(np.array([72]), 73))
    np.testing.assert_array_equal(out, np.zeros((1, 2)))


@pytest.mark.parametrize("num_classes", [180, 90])
def test_latitude_bins_match_torch_bucketize(num_classes):
    rng = np.random.default_rng(1)
    lat = rng.uniform(-90, 90, size=(40, 25)).astype(np.float32)
    boundaries = torch.arange(-90, 90, 180 / num_classes)[1:]
    expected = torch.bucketize(torch.from_numpy(lat), boundaries).numpy()
    got = np.asarray(encode_bin_latitude(lat, num_classes))
    np.testing.assert_array_equal(got, expected)


def test_latitude_roundtrip_within_half_bin():
    num_classes = 180
    rng = np.random.default_rng(2)
    lat = rng.uniform(-89.9, 89.9, size=(16, 16)).astype(np.float32)
    dec = np.asarray(decode_bin_latitude(encode_bin_latitude(lat, num_classes), num_classes))
    assert np.max(np.abs(dec - lat)) <= 180 / num_classes / 2 + 1e-4
