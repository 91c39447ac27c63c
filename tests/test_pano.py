"""Panorama crop ops: self-consistency oracles.

The key invariant (also the reference's implicit oracle, SURVEY.md section 4):
a pano whose texture encodes its own (theta, phi) coordinates, cropped with
camera (vfov, az, el, roll), must contain angles consistent with the analytic
lat/up fields for that camera.
"""

import numpy as np
import pytest

from perspectivefields_tpu.ops import (
    crop_distortion,
    equi2pers,
    lat_field,
)


def angle_pano(ph=256, pw=512):
    """Pano encoding (sin theta, cos theta, phi) in 3 channels."""
    theta = (np.arange(pw) + 0.5) / pw * 2 * np.pi - np.pi
    phi = np.pi / 2 - (np.arange(ph) + 0.5) / ph * np.pi
    tt, pp = np.meshgrid(theta, phi)
    return np.stack([np.sin(tt), np.cos(tt), pp], axis=-1).astype(np.float32)


@pytest.mark.parametrize(
    "vfov_deg,az_deg,el_deg,roll_deg",
    [(60, 0, 0, 0), (70, 30, 20, 0), (85, -45, -25, 15), (50, 120, 40, -30)],
)
def test_equi2pers_phi_matches_lat_field(vfov_deg, az_deg, el_deg, roll_deg):
    pano = angle_pano()
    vfov, az, el, ro = np.radians([vfov_deg, az_deg, el_deg, roll_deg])
    crop = np.asarray(equi2pers(pano, vfov, 64, 48, az, el, ro))
    phi_sampled = np.degrees(crop[..., 2])
    lat = np.asarray(lat_field(vfov, 64, 48, el, ro))
    # interior only (bilinear smoothing at pano pole/seam edges)
    err = np.abs(phi_sampled - lat)[4:-4, 4:-4]
    assert np.percentile(err, 99) < 1.0, err.max()


def test_equi2pers_center_pixel_looks_at_camera_direction():
    pano = angle_pano()
    vfov = np.radians(60.0)
    az, el = np.radians(35.0), np.radians(10.0)
    crop = np.asarray(equi2pers(pano, vfov, 65, 49, az, el, 0.0))
    ch, cw = 24, 32  # center pixel of odd-sized crop
    theta = np.degrees(np.arctan2(crop[ch, cw, 0], crop[ch, cw, 1]))
    phi = np.degrees(crop[ch, cw, 2])
    assert abs(theta - 35.0) < 1.0
    assert abs(phi - 10.0) < 1.0


def test_equi2pers_zero_camera_is_identityish():
    """Zero rotation, center row of crop sits on the equator."""
    pano = angle_pano()
    crop = np.asarray(equi2pers(pano, np.radians(90.0), 64, 64, 0.0, 0.0, 0.0))
    mid_phi = np.degrees(crop[31:33, :, 2]).mean()
    assert abs(mid_phi) < 1.0


def _usm_lat_oracle(f, xi, H, W, az, el, roll):
    """f64 numpy oracle for the USM latitude map (same math, scalar-checked)."""
    az, el, roll = np.radians([az, el, roll])
    gx, gy = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    x = (gx - W / 2) / f
    y = -(gy - H / 2) / f
    aux = x * x + y * y
    alpha = (xi + np.sqrt(1 + (1 - xi * xi) * aux)) / (aux + 1)
    xs, ys, zs = x * alpha, y * alpha, alpha - xi
    ce, se = np.cos(el), np.sin(el)
    cr, sr = np.cos(roll), np.sin(roll)
    ca, sa = np.cos(az), np.sin(az)
    # rot_el then rot_roll^T then rot_az (reference: panocam.py:616-657)
    xs, ys, zs = xs, ce * ys - se * zs, se * ys + ce * zs
    xs, ys, zs = cr * xs + sr * ys, -sr * xs + cr * ys, zs
    xs, ys, zs = ca * xs + sa * zs, ys, -sa * xs + ca * zs
    return np.degrees(np.arctan2(ys, np.sqrt(xs * xs + zs * zs)))


def test_crop_distortion_lat_matches_f64_oracle():
    pano = angle_pano()
    for (f, xi, az, el, roll) in [(54.0, 0.0, 20, 15, 10), (80.0, 0.35, -40, -25, 30)]:
        out = crop_distortion(pano, f, xi, 64, 64, az, el, roll)
        got = np.degrees(np.asarray(out["lat"]))
        want = _usm_lat_oracle(f, xi, 64, 64, az, el, roll)
        assert np.abs(got - want).max() < 1e-2


def test_crop_distortion_zero_xi_matches_pinhole_lat():
    """xi=0 reduces USM to a pinhole. The USM camera's elevation sign is
    opposite to get_lat's (y-up vs y-down frame): lat(el) ~ lat_field(-el)."""
    pano = angle_pano()
    H = W = 64
    vfov = np.radians(60.0)
    f = H / (2 * np.tan(vfov / 2))
    out = crop_distortion(pano, f, 0.0, H, W, 20.0, 15.0, 10.0)
    lat = np.asarray(lat_field(vfov, W, H, np.radians(-15.0), np.radians(10.0)))
    got = np.degrees(np.asarray(out["lat"]))
    err = np.abs(got - lat)[4:-4, 4:-4]
    # coarse: the two paths use different pixel-grid conventions (~1 px)
    assert np.percentile(err, 99) < 2.0, err.max()


def test_crop_distortion_up_field_unit_norm():
    pano = angle_pano()
    out = crop_distortion(pano, 80.0, 0.3, 64, 64, 0.0, 20.0, 5.0)
    up = np.asarray(out["up"])
    np.testing.assert_allclose(np.linalg.norm(up, axis=-1), 1.0, atol=1e-4)


def test_crop_distortion_up_points_against_gravity_at_zero_rotation():
    """Looking at the horizon with no roll: up-vectors point up (−v)."""
    pano = angle_pano()
    out = crop_distortion(pano, 80.0, 0.2, 64, 64, 0.0, 0.0, 0.0)
    up = np.asarray(out["up"])
    # avoid the exact horizon row: the reference's construction (sin(phi)
    # held fixed, only cos(phi) stepped) is degenerate at phi == 0 and yields
    # a zero vector there — faithful behavior, excluded from the check
    center = up[28:32, 25:31]
    assert np.all(center[..., 1] < 0)  # v-component negative = pointing up
    assert np.abs(center[..., 0]).max() < 0.2
