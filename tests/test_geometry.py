"""Geometry parity vs independent numpy oracles + scipy fsolve."""

import numpy as np
import pytest
import scipy.optimize

from perspectivefields_tpu.ops import (
    general_vfov,
    general_vfov_to_focal,
    lat_field,
    lat_field_general,
    relative_horizon_line,
    relative_vvp,
    rotation_matrix,
    up_field,
    up_field_general,
    vfov_to_focal_rel,
)


# ---------------------------------------------------------------------------
# numpy oracles, written from the paper's math (not the jax code under test)
# ---------------------------------------------------------------------------


def oracle_lat(vfov, im_w, im_h, elevation, roll):
    focal = im_h / 2 / np.tan(vfov / 2)
    dy = np.linspace(-im_h / 2, im_h / 2, im_h)
    dx = np.linspace(-im_w / 2, im_w / 2, im_w)
    x, y = np.meshgrid(dx, dy)
    x, y = x / focal, y / focal
    xw = x * np.cos(roll) - y * np.sin(roll)
    yw = (
        x * np.cos(elevation) * np.sin(roll)
        + y * np.cos(elevation) * np.cos(roll)
        - np.sin(elevation)
    )
    zw = (
        x * np.sin(elevation) * np.sin(roll)
        + y * np.sin(elevation) * np.cos(roll)
        + np.cos(elevation)
    )
    return -np.arctan2(yw, np.sqrt(xw**2 + zw**2)) / np.pi * 180


def oracle_up_centered(vfov, im_w, im_h, elevation, roll):
    """Centered up-field via the horizon/VVP route (integer pixel grid)."""
    if elevation == 0:
        return np.broadcast_to(
            np.array([-np.sin(roll), -np.cos(roll)]), (im_h, im_w, 2)
        ).copy()
    vx = (
        0.5
        - 0.5 / im_w
        - 0.5 * np.sin(roll) / np.tan(elevation) / np.tan(vfov / 2) * im_h / im_w
    )
    vy = 0.5 - 0.5 / im_h - 0.5 * np.cos(roll) / np.tan(elevation) / np.tan(vfov / 2)
    absvvp = np.array([vx * im_w, vy * im_h])
    gx, gy = np.meshgrid(np.arange(im_w), np.arange(im_h))
    d = np.stack([absvvp[0] - gx, absvvp[1] - gy], axis=-1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return d * np.sign(elevation)


def fsolve_focal(rel_cx, rel_cy, gvfov_rad):
    def fun(focal, h, d_cx, d_cy, target_cos):
        p = (focal / h) ** 2 + d_cx**2 + (d_cy + 0.5) ** 2
        q = (focal / h) ** 2 + d_cx**2 + (d_cy - 0.5) ** 2
        return (p + q - 1) / 2 / np.sqrt(p) / np.sqrt(q) - target_cos

    return abs(
        scipy.optimize.fsolve(fun, 1.5, args=(1, rel_cx, rel_cy, np.cos(gvfov_rad)))[0]
    )


# ---------------------------------------------------------------------------


def test_rotation_matrix_orthonormal_and_convention():
    r = np.asarray(rotation_matrix(0.3, -0.2, 0.7))
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-6)
    # identity at zero angles
    np.testing.assert_allclose(np.asarray(rotation_matrix(0, 0, 0)), np.eye(3), atol=1e-7)


@pytest.mark.parametrize(
    "vfov_deg,elev_deg,roll_deg",
    [(60, 30, 0), (85, -20, 15), (45, 5, -30), (100, 70, 3)],
)
def test_lat_field_matches_oracle(vfov_deg, elev_deg, roll_deg):
    vfov, el, ro = np.radians([vfov_deg, elev_deg, roll_deg])
    got = np.asarray(lat_field(vfov, 64, 48, el, ro))
    want = oracle_lat(vfov, 64, 48, el, ro)
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.parametrize(
    "vfov_deg,elev_deg,roll_deg",
    [(60, 30, 0), (85, -20, 15), (45, 5, -30), (100, 70, 3), (60, 0, 25)],
)
def test_up_field_matches_oracle(vfov_deg, elev_deg, roll_deg):
    vfov, el, ro = np.radians([vfov_deg, elev_deg, roll_deg])
    got = np.asarray(up_field(vfov, 64, 48, el, ro)).astype(np.float64)
    want = oracle_up_centered(vfov, 64, 48, el, ro)
    # angular error via chord length (stable near zero, unlike arccos(dot))
    chord = np.linalg.norm(got - want, axis=-1)
    ang = np.degrees(2 * np.arcsin(np.clip(chord / 2, 0, 1)))
    assert np.max(ang) < 0.001


def test_up_general_reduces_to_centered():
    vfov = np.radians(70.0)
    el, ro = np.radians(25.0), np.radians(-10.0)
    a = np.asarray(up_field(vfov, 32, 24, el, ro))
    b = np.asarray(
        up_field_general(vfov_to_focal_rel(vfov), 32, 24, el, ro, 0.0, 0.0)
    )
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_lat_general_reduces_to_centered():
    vfov = np.radians(70.0)
    el, ro = np.radians(25.0), np.radians(-10.0)
    a = np.asarray(lat_field(vfov, 32, 24, el, ro))
    b = np.asarray(
        lat_field_general(vfov_to_focal_rel(vfov), 32, 24, el, ro, 0.0, 0.0)
    )
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_gvfov_focal_inverse_pair():
    rng = np.random.default_rng(0)
    cx = rng.uniform(-0.3, 0.3, size=64)
    cy = rng.uniform(-0.3, 0.3, size=64)
    f = rng.uniform(0.4, 3.0, size=64)
    g = np.asarray(general_vfov(cx, cy, 1.0, f, degree=True))
    f_back = np.asarray(general_vfov_to_focal(cx, cy, 1.0, g, degree=True))
    np.testing.assert_allclose(f_back, f, rtol=1e-4)


def test_gvfov_to_focal_matches_scipy():
    rng = np.random.default_rng(1)
    for _ in range(50):
        cx = rng.uniform(-0.35, 0.35)
        cy = rng.uniform(-0.35, 0.35)
        g = rng.uniform(20, 110)
        want = fsolve_focal(cx, cy, np.radians(g))
        got = float(general_vfov_to_focal(cx, cy, 1.0, g, degree=True))
        np.testing.assert_allclose(got, want, rtol=1e-4)


def test_gvfov_centered_equals_vfov():
    # with centered pp, general vfov == classic vfov: f = 1/(2 tan(v/2))
    for v in [30.0, 60.0, 90.0, 120.0]:
        f = float(general_vfov_to_focal(0.0, 0.0, 1.0, v, degree=True))
        np.testing.assert_allclose(
            f, 1.0 / (2 * np.tan(np.radians(v) / 2)), rtol=1e-5
        )


def test_horizon_midpoint_on_horizon_pixel():
    # with zero pitch+roll the horizon runs through the image middle
    h0, h1 = relative_horizon_line(0.0, 0.0, np.radians(60.0), 48, 64)
    np.testing.assert_allclose([float(h0), float(h1)], [0.5, 0.5], atol=1e-6)


def test_relative_vvp_infinite_at_zero_elevation():
    vx, vy, s = relative_vvp(0.0, 0.1, np.radians(60.0), 48, 64)
    assert np.isinf(float(vx)) and np.isinf(float(vy))


def test_vvp_sign_matches_elevation():
    _, _, s_up = relative_vvp(0.3, 0.0, 1.0, 48, 64)
    _, _, s_dn = relative_vvp(-0.3, 0.0, 1.0, 48, 64)
    assert float(s_up) == 1.0 and float(s_dn) == -1.0


def test_fields_vmap_over_cameras():
    import jax
    import jax.numpy as jnp

    vfovs = jnp.radians(jnp.array([50.0, 70.0, 90.0]))
    els = jnp.radians(jnp.array([10.0, -20.0, 40.0]))
    rolls = jnp.radians(jnp.array([0.0, 5.0, -15.0]))
    batched = jax.vmap(lambda v, e, r: up_field(v, 32, 24, e, r))(vfovs, els, rolls)
    assert batched.shape == (3, 24, 32, 2)
    for i in range(3):
        single = up_field(vfovs[i], 32, 24, els[i], rolls[i])
        np.testing.assert_allclose(np.asarray(batched[i]), np.asarray(single), atol=1e-6)
