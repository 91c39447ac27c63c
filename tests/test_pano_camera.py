"""PanoCam compatibility surface."""

import numpy as np

from perspectivefields_tpu.pano_camera import PanoCam
from tests.test_pano import angle_pano


def test_crop_equi_matches_ops():
    pano = (np.random.default_rng(0).uniform(0, 255, (128, 256, 3))).astype(np.uint8)
    crop = PanoCam.crop_equi(pano, 70.0, 64, 48, 30.0, 20.0, 10.0, 4 / 3)
    assert crop.shape == (48, 64, 3) and crop.dtype == np.uint8


def test_get_up_lat_statics():
    up = PanoCam.get_up(np.radians(60.0), 32, 24, np.radians(20.0), 0.1)
    lat = PanoCam.get_lat(np.radians(60.0), 32, 24, np.radians(20.0), 0.1)
    assert up.shape == (24, 32, 2)
    assert lat.shape == (24, 32)
    np.testing.assert_allclose(np.linalg.norm(up, axis=-1), 1.0, atol=1e-5)


def test_relative_vvp_horizon_contract():
    # elevation 0 -> (inf, inf) like the reference
    out = PanoCam.getRelativeVVP(0.0, 0.1, 1.0, 48, 64)
    assert len(out) == 2 and np.isinf(out[0])
    vx, vy, s = PanoCam.getRelativeVVP(0.3, 0.1, 1.0, 48, 64)
    assert s == 1.0
    h = PanoCam.getRelativeHorizonLineFromAngles(0.0, 0.0, 1.0, 48, 64)
    np.testing.assert_allclose(h, (0.5, 0.5), atol=1e-6)


def test_crop_distortion_returns_reference_tuple():
    pano = angle_pano()
    im, ntheta, nphi, offset, up, lat, xy = PanoCam.crop_distortion(
        pano, 60.0, 0.2, 64, 64, 10.0, 0.0, 0.0
    )
    assert im.shape == (64, 64, 3)
    assert ntheta.shape == nphi.shape == lat.shape == (64, 64)
    assert up.shape == (64, 64, 2) and xy.shape == (64, 64, 2)
    # looking at the horizon: crossing near the image middle
    assert abs(offset - 31.5) < 2.0


def test_gravity_field_from_absvvp():
    field = PanoCam.getGravityField(10, 10, np.array([5.0, -100.0, 1.0]))
    assert field.shape == (10, 10, 2)
    assert np.all(field[..., 1] < 0)  # vvp above image -> arrows point up
