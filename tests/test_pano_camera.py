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


def test_crop_distortion_catadioptric_disk_mask():
    # xi > 1 with f < minfocal: the valid image is a centered disk of
    # radius diskradius(xi, f); pixels outside are zeroed
    # (reference: panocam.py:695-707)
    from perspectivefields_tpu.pano_camera import disk_radius, min_focal

    pano = np.full((64, 128, 3), 200, np.uint8)
    xi, H, W = 1.2, 64, 64
    fmin = min_focal(W / 2.0, H / 2.0, xi)
    assert np.isfinite(fmin)
    f = 0.5 * fmin
    im, *_ = PanoCam.crop_distortion(pano, f, xi, H, W, 0.0, 0.0, 0.0)
    r = disk_radius(xi, f)
    assert r < 32  # the disk actually clips this crop
    assert np.all(im[0, 0] == 0) and np.all(im[-1, -1] == 0)  # corners masked
    assert np.all(im[H // 2, W // 2] > 0)  # center kept
    # a crop with f >= fmin is untouched at the corners
    im2, *_ = PanoCam.crop_distortion(pano, 2.0 * fmin, xi, H, W, 0.0, 0.0, 0.0)
    assert np.all(im2[0, 0] > 0)
