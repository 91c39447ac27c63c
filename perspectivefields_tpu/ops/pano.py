"""Panorama ops: equirectangular -> perspective / distorted crops + GT fields.

TPU-native replacement for the reference's PanoCam + pyequilib dependency
(reference: perspective2d/utils/panocam.py:121-752). Everything is pure jnp
with static output shapes: ray-grid generation, rotation, sphere->pano
mapping, and bilinear grid sampling all fuse into one XLA program and vmap
over batches of camera parameters — the synthetic-data generator for training
and the test oracle for field correctness.

Conventions (same as ops.geometry / the reference):
  camera frame: x right, y down, z out; image frame: u right, v down.
  azimuth: rotation about world y (positive = look right),
  elevation: rotation about camera x (positive = look up),
  roll: rotation about camera z.
  equirect: width spans theta in [-pi, pi), height spans phi in [+pi/2, -pi/2]
  (top row = north pole), pixel centers at half-integers.

Consistency guarantee: the latitude of pano content sampled at a crop pixel
equals ops.geometry.lat_field for the same camera (tested in
tests/test_pano.py) — the crop and the analytic GT use the same rotation
algebra by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _camera_rays(im_w: int, im_h: int, focal, cx=None, cy=None):
    """Unit-free pixel rays in camera frame, pixel centers at half-integers."""
    cx = 0.5 * im_w if cx is None else cx
    cy = 0.5 * im_h if cy is None else cy
    u = jnp.arange(im_w, dtype=jnp.float32) + 0.5
    v = jnp.arange(im_h, dtype=jnp.float32) + 0.5
    uu, vv = jnp.meshgrid(u, v)
    x = (uu - cx) / focal
    y = (vv - cy) / focal
    z = jnp.ones_like(x)
    return x, y, z


def _rotate_cam_to_world(x, y, z, roll, elevation, azimuth):
    """Camera-frame ray -> world-frame ray using the reference's rotation
    algebra (the same expressions as ops.geometry.lat_field_general, plus an
    azimuth yaw about the world y axis)."""
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    ce, se = jnp.cos(elevation), jnp.sin(elevation)
    ca, sa = jnp.cos(azimuth), jnp.sin(azimuth)
    # roll then elevation (panocam.py:543-553)
    xw = x * cr - y * sr
    yw = x * ce * sr + y * ce * cr - z * se
    zw = x * se * sr + y * se * cr + z * ce
    # yaw about world y: positive azimuth pans the view right
    xw2 = xw * ca + zw * sa
    zw2 = -xw * sa + zw * ca
    return xw2, yw, zw2


def _world_to_equi_uv(xw, yw, zw, pano_h: int, pano_w: int):
    """World ray -> fractional pano pixel coords (u wraps, v clamps)."""
    theta = jnp.arctan2(xw, zw)  # [-pi, pi], 0 = forward
    phi = -jnp.arctan2(yw, jnp.sqrt(xw * xw + zw * zw))  # +up
    u = (0.5 + theta / (2.0 * jnp.pi)) * pano_w - 0.5
    v = (0.5 - phi / jnp.pi) * pano_h - 0.5
    return u, v, theta, phi


def grid_sample_equi(pano: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Bilinear sample an (H, W, C) pano at fractional (u, v) grids
    ((h, w) each), wrapping horizontally and clamping vertically.

    Gather-based: 4 taps, fully vectorized (the TPU-friendly formulation of
    equilib's grid_sample, panocam.py:693)."""
    ph, pw = pano.shape[0], pano.shape[1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    u0i = jnp.mod(u0.astype(jnp.int32), pw)
    u1i = jnp.mod(u0i + 1, pw)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, ph - 1)
    v1i = jnp.clip(v0i + 1, 0, ph - 1)
    p00 = pano[v0i, u0i]
    p01 = pano[v0i, u1i]
    p10 = pano[v1i, u0i]
    p11 = pano[v1i, u1i]
    top = p00 * (1 - fu) + p01 * fu
    bot = p10 * (1 - fu) + p11 * fu
    return top * (1 - fv) + bot * fv


def equi2pers(
    pano: jnp.ndarray,
    vfov,
    im_w: int,
    im_h: int,
    azimuth=0.0,
    elevation=0.0,
    roll=0.0,
):
    """Crop a pinhole perspective view from an equirectangular image.

    Args:
        pano: (H, W, C) float array.
        vfov/azimuth/elevation/roll: radians (scalars; vmap for batches).
    Returns:
        (im_h, im_w, C) crop.

    Equivalent capability to PanoCam.crop_equi (panocam.py:197-249, which
    wraps equilib.equi2pers); here the whole pipeline is one fused XLA
    program.
    """
    vfov = jnp.asarray(vfov, jnp.float32)
    focal = im_h / (2.0 * jnp.tan(vfov / 2.0))
    x, y, z = _camera_rays(im_w, im_h, focal)
    xw, yw, zw = _rotate_cam_to_world(x, y, z, roll, elevation, azimuth)
    u, v, _, _ = _world_to_equi_uv(xw, yw, zw, pano.shape[0], pano.shape[1])
    return grid_sample_equi(pano, u, v)


def crop_equi_with_fields(
    pano: jnp.ndarray, vfov, im_w: int, im_h: int, azimuth, elevation, roll
):
    """Crop + analytic GT (up, lat) for the same camera — the training-data
    generator. Returns (crop, up (h,w,2), lat_deg (h,w))."""
    from .geometry import lat_field, up_field

    crop = equi2pers(pano, vfov, im_w, im_h, azimuth, elevation, roll)
    up = up_field(vfov, im_w, im_h, elevation, roll)
    lat = lat_field(vfov, im_w, im_h, elevation, roll)
    return crop, up, lat


# ---------------------------------------------------------------------------
# Unified Spherical Model (distorted crops)
# ---------------------------------------------------------------------------


def min_focal(u0, v0, xi, xref=1.0, yref=1.0):
    """Minimum focal for a catadioptric image given xi (panocam.py:64-70)."""
    return (
        jnp.sqrt(-(1 - xi * xi) * ((xref - u0) ** 2 + (yref - v0) ** 2)) * 1.0001
    )


def disk_radius(xi, f):
    """Valid-disk radius of a catadioptric image (panocam.py:18-19)."""
    return jnp.sqrt(-(f * f) / (1 - xi * xi))


def crop_distortion(
    pano: jnp.ndarray, f, xi, im_h: int, im_w: int, az_deg, el_deg, roll_deg
):
    """Crop a USM-distorted view + analytic GT fields.

    Unified Spherical Model: image plane -> unit sphere lift parameterized by
    xi, rotations (roll^T . elev applied to plane points, then azimuth), then
    sphere -> equirect lookup. The up-vector GT comes from reprojecting an
    epsilon step toward the pano's north pole back into the distorted image —
    the same construction as the reference (panocam.py:559-752), vectorized.

    Args:
        pano: (H, W, C). f: focal (pixels). xi: USM distortion in [0, 1].
        angles in degrees (reference API takes degrees here).
    Returns:
        dict with crop (h, w, C), up (h, w, 2), lat (h, w) radians,
        theta/phi (h, w) pano angles, xy_map (h, w, 2) pano pixel coords.
    """
    f = jnp.asarray(f, jnp.float32)
    xi = jnp.asarray(xi, jnp.float32)
    az = jnp.radians(jnp.asarray(az_deg, jnp.float32))
    el = jnp.radians(jnp.asarray(el_deg, jnp.float32))
    ro = jnp.radians(jnp.asarray(roll_deg, jnp.float32))
    ph, pw = pano.shape[0], pano.shape[1]
    u0, v0 = im_w / 2.0, im_h / 2.0

    gx, gy = jnp.meshgrid(
        jnp.arange(im_w, dtype=jnp.float32), jnp.arange(im_h, dtype=jnp.float32)
    )
    # 1-2. plane -> sphere (USM lift)
    x_cam = (gx - u0) / f
    y_cam = -(gy - v0) / f
    aux = x_cam * x_cam + y_cam * y_cam
    alpha = xi + jnp.sqrt(jnp.maximum(1.0 + (1.0 - xi * xi) * aux, 0.0))
    alpha = alpha / (aux + 1.0)
    xs = x_cam * alpha
    ys = y_cam * alpha
    zs = alpha - xi

    # 3. rotate sphere: rot_roll^T @ rot_el @ p, then rot_az
    ce, se = jnp.cos(el), jnp.sin(el)
    cr, sr = jnp.cos(ro), jnp.sin(ro)
    ca, sa = jnp.cos(az), jnp.sin(az)

    def rot_el_fwd(x, y, z):
        return x, ce * y - se * z, se * y + ce * z

    def rot_el_inv(x, y, z):
        return x, ce * y + se * z, -se * y + ce * z

    def rot_roll_fwd(x, y, z):  # rot_roll @ p
        return cr * x - sr * y, sr * x + cr * y, z

    def rot_roll_inv(x, y, z):  # rot_roll^T @ p
        return cr * x + sr * y, -sr * x + cr * y, z

    def rot_az_fwd(x, y, z):  # rot_az @ p
        return ca * x + sa * z, y, -sa * x + ca * z

    def rot_az_inv(x, y, z):
        return ca * x - sa * z, y, sa * x + ca * z

    xs, ys, zs = rot_el_fwd(xs, ys, zs)
    xs, ys, zs = rot_roll_inv(xs, ys, zs)
    xs, ys, zs = rot_az_fwd(xs, ys, zs)

    # 4-5. sphere -> pano coords
    ntheta = jnp.arctan2(xs, zs)
    nphi = jnp.arctan2(ys, jnp.sqrt(zs * zs + xs * xs))
    # linear maps matching the reference (panocam.py:666-687): theta over
    # [-pi, pi] across [0, W-1], phi over [pi/2, -pi/2] across [0, H-1]
    a_x = 2.0 * jnp.pi / (pw - 1.0)
    b_x = jnp.pi - a_x * (pw - 1.0)  # = -pi
    nx = (ntheta - b_x) / a_x
    a_y = -jnp.pi / (ph - 1.0)
    b_y = jnp.pi / 2.0
    ny = (nphi - b_y) / a_y

    crop = grid_sample_equi(pano, nx, ny)

    # up-vector GT: direction of motion in the distorted image as the viewed
    # pano point steps toward the north pole. The reference does this with an
    # epsilon (1e-5 px) reprojection in float64 (panocam.py:723-750); in f32
    # that epsilon vanishes, so we take the exact derivative with jax.jvp —
    # the same construction with eps -> 0.
    ntheta_end = nx * a_x + b_x  # == ntheta (round trip)

    def reproject(phi_end):
        ys2 = jnp.sin(nphi)  # reference keeps sin(nphi) fixed (panocam.py:736)
        xs2 = jnp.cos(phi_end) * jnp.sin(ntheta_end)
        zs2 = jnp.cos(phi_end) * jnp.cos(ntheta_end)
        # inverse rotation: rot_el^T @ (rot_roll @ (rot_az^T @ p))
        x3, y3, z3 = rot_az_inv(xs2, ys2, zs2)
        x3, y3, z3 = rot_roll_fwd(x3, y3, z3)
        x3, y3, z3 = rot_el_inv(x3, y3, z3)
        denom = xi * jnp.sqrt(x3 * x3 + y3 * y3 + z3 * z3) + z3
        denom = jnp.where(jnp.abs(denom) < _EPS, _EPS, denom)
        x_im = x3 * f / denom + u0
        y_im = -y3 * f / denom + v0
        return jnp.stack([x_im, y_im])

    # step of -eps pixels in ny is a step of -eps * a_y in phi; a_y < 0, so
    # toward the pole means phi increasing — differentiate and flip by -a_y.
    _, d_im = jax.jvp(reproject, (nphi,), (jnp.full_like(nphi, -a_y),))
    ux, uy = d_im[0], d_im[1]
    norm = jnp.maximum(jnp.sqrt(ux * ux + uy * uy), _EPS)
    up = jnp.stack([ux / norm, uy / norm], axis=-1)

    return {
        "crop": crop,
        "up": up,
        "lat": nphi,
        "theta": ntheta,
        "phi": nphi,
        "xy_map": jnp.stack([nx, ny], axis=-1),
    }
