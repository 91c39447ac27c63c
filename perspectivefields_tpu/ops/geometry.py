"""Camera geometry: perspective-field generation and gvfov math.

TPU-first reimplementation of the reference camera math
(reference: perspective2d/utils/panocam.py:121-556 and
perspective2d/utils/utils.py:13-91). Everything is branch-free jnp
(singularities handled with jnp.where), so every function jits and vmaps over
batches of camera parameters — the reference's scalar numpy loops become one
fused XLA program.

Conventions (identical to the reference, README.md:136):
  camera frame: x right, y down, z out;  image frame: u right, v down,
  origin top-left.  Rotation composition is R_z(roll) @ R_x(pitch) @ R_y(yaw).

The scipy.optimize.fsolve in the reference's ``general_vfov_to_focal``
(utils.py:75-89) — a host-sync that would stall a TPU pipeline — is replaced
by an exact closed-form quadratic solve (see ``general_vfov_to_focal``).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def rotation_matrix(roll, pitch, yaw) -> jnp.ndarray:
    """Extrinsic rotation R_z(roll) @ R_x(pitch) @ R_y(yaw).

    Reference: perspective2d/utils/panocam.py:22-61.
    """
    roll = jnp.asarray(roll, jnp.float32)
    pitch = jnp.asarray(pitch, jnp.float32)
    yaw = jnp.asarray(yaw, jnp.float32)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    r_x = jnp.array([[1.0, 0.0, 0.0], [0.0, cp, sp], [0.0, -sp, cp]])
    r_y = jnp.array([[cy, 0.0, -sy], [0.0, 1.0, 0.0], [sy, 0.0, cy]])
    r_z = jnp.array([[cr, sr, 0.0], [-sr, cr, 0.0], [0.0, 0.0, 1.0]])
    rzx = jnp.matmul(r_z, r_x, precision="highest")
    return jnp.matmul(rzx, r_y, precision="highest")


# ---------------------------------------------------------------------------
# general vFoV <-> focal
# ---------------------------------------------------------------------------


def general_vfov(d_cx, d_cy, h, focal, degree: bool):
    """General vertical FoV: angle at the pinhole subtended by the midpoints
    of the top and bottom image edges (valid for off-center principal points).

    Reference: perspective2d/utils/utils.py:13-44 (law-of-cosines form).
    """
    d_cx = jnp.asarray(d_cx, jnp.float32)
    d_cy = jnp.asarray(d_cy, jnp.float32)
    focal = jnp.asarray(focal, jnp.float32)
    p_sqr = focal**2 + d_cx**2 + (d_cy + 0.5 * h) ** 2
    q_sqr = focal**2 + d_cx**2 + (d_cy - 0.5 * h) ** 2
    cos_fov = (p_sqr + q_sqr - h**2) / 2.0 / jnp.sqrt(p_sqr) / jnp.sqrt(q_sqr)
    fov_rad = jnp.arccos(jnp.clip(cos_fov, -1.0, 1.0))
    return jnp.degrees(fov_rad) if degree else fov_rad


def general_vfov_to_focal(rel_cx, rel_cy, h, gvfov, degree: bool):
    """Invert ``general_vfov``: focal length from gvfov + principal point.

    The reference solves this 1-D root find with scipy.optimize.fsolve
    (utils.py:75-89), forcing a device->host sync. Here we solve it exactly:
    with a = cx^2 + (cy+1/2)^2, b = cx^2 + (cy-1/2)^2, c = cos(gvfov), and
    u = (f/h)^2, squaring the law-of-cosines relation gives the quadratic

        4(c^2-1) u^2 + 4(c^2(a+b) - (a+b-1)) u + (4 c^2 a b - (a+b-1)^2) = 0.

    Squaring introduces one spurious root (the branch where the sign of
    2u + a + b - 1 disagrees with sign(c)); we select the genuine root by that
    sign test and fall back to the other root when unattainable. Matches
    scipy's answer to ~1e-12 on the attainable range (validated in
    tests/test_geometry.py). Fully batched and jit-able.
    """
    rel_cx = jnp.asarray(rel_cx, jnp.float32)
    rel_cy = jnp.asarray(rel_cy, jnp.float32)
    gvfov = jnp.asarray(gvfov, jnp.float32)
    if degree:
        gvfov = jnp.radians(gvfov)
    a = rel_cx**2 + (rel_cy + 0.5) ** 2
    b = rel_cx**2 + (rel_cy - 0.5) ** 2
    c = jnp.cos(gvfov)
    qa = 4.0 * (c * c - 1.0)
    qb = 4.0 * (c * c * (a + b) - (a + b - 1.0))
    qc = 4.0 * c * c * a * b - (a + b - 1.0) ** 2
    disc = jnp.maximum(qb * qb - 4.0 * qa * qc, 0.0)
    sq = jnp.sqrt(disc)
    qa_safe = jnp.where(jnp.abs(qa) < _EPS, -_EPS, qa)
    u1 = (-qb + sq) / (2.0 * qa_safe)
    u2 = (-qb - sq) / (2.0 * qa_safe)

    def genuine(u):
        return (u > 0) & (jnp.sign(2.0 * u + a + b - 1.0) == jnp.sign(c))

    # Prefer a root passing the sign test; else any positive root; else eps.
    u = jnp.where(
        genuine(u1), u1, jnp.where(genuine(u2), u2, jnp.maximum(jnp.maximum(u1, u2), _EPS))
    )
    return jnp.abs(jnp.sqrt(u)) * h


def vfov_to_focal_rel(vfov):
    """Relative focal length (f / image height) of a centered pinhole from its
    vertical FoV in radians: f_rel = 1 / (2 tan(vfov / 2))."""
    return 1.0 / (2.0 * jnp.tan(jnp.asarray(vfov, jnp.float32) / 2.0))


# ---------------------------------------------------------------------------
# horizon line / vertical vanishing point
# ---------------------------------------------------------------------------


def relative_vvp(elevation, roll, vfov, im_h: int, im_w: int):
    """Relative vertical vanishing point (divided by image size).

    Returns (vx, vy, sign) where sign in {-1, +1} says whether up-vectors point
    towards (+1) or away (-1) from the VVP. For elevation == 0 the VVP is at
    infinity; the reference returns (inf, inf) (panocam.py:320-324) and this
    implementation returns (inf, inf, 0) so the caller can branch with where.

    Reference: perspective2d/utils/panocam.py:302-333.
    """
    elevation = jnp.asarray(elevation, jnp.float32)
    roll = jnp.asarray(roll, jnp.float32)
    vfov = jnp.asarray(vfov, jnp.float32)
    tan_el = jnp.tan(elevation)
    tan_el_safe = jnp.where(jnp.abs(tan_el) < _EPS, _EPS, tan_el)
    vx = (
        0.5
        - 0.5 / im_w
        - 0.5 * jnp.sin(roll) / tan_el_safe / jnp.tan(vfov / 2.0) * im_h / im_w
    )
    vy = 0.5 - 0.5 / im_h - 0.5 * jnp.cos(roll) / tan_el_safe / jnp.tan(vfov / 2.0)
    at_horizon = elevation == 0
    inf = jnp.float32(jnp.inf)
    return (
        jnp.where(at_horizon, inf, vx),
        jnp.where(at_horizon, inf, vy),
        jnp.where(at_horizon, 0.0, jnp.sign(elevation)),
    )


def midpoint_from_angle(elevation, roll, vfov):
    """Horizon-line midpoint as a fraction of image height.

    Reference: perspective2d/utils/panocam.py:353-367."""
    elevation = jnp.asarray(elevation, jnp.float32)
    vertical = jnp.abs(jnp.abs(elevation) - jnp.pi / 2.0) < _EPS
    mid = 0.5 + 0.5 * jnp.tan(elevation) / jnp.cos(roll) / jnp.tan(vfov / 2.0)
    return jnp.where(vertical, jnp.inf * jnp.sign(elevation), mid)


def delta_height_from_roll(roll, im_h: int, im_w: int):
    """Half height-difference of the horizon across the image width.

    Reference: perspective2d/utils/panocam.py:369-382."""
    roll = jnp.asarray(roll, jnp.float32)
    vertical = jnp.abs(jnp.abs(roll) - jnp.pi / 2.0) < _EPS
    dh = -im_w / im_h * jnp.tan(roll) / 2.0
    return jnp.where(vertical, jnp.inf * jnp.sign(roll), dh)


def relative_horizon_line(elevation, roll, vfov, im_h: int, im_w: int):
    """Fractions of image height where the horizon crosses the left/right
    image borders. Reference: perspective2d/utils/panocam.py:335-351."""
    mid = midpoint_from_angle(elevation, roll, vfov)
    dh = delta_height_from_roll(roll, im_h, im_w)
    return mid - dh, mid + dh


def abs_vvp(im_h: int, im_w: int, horizon, vvp):
    """Absolute VVP in pixels (top-left origin) from the relative VVP, with the
    reference's far-point fallback when the VVP is at infinity.

    Reference: perspective2d/utils/panocam.py:276-300."""
    vx, vy, sign = vvp
    finite = jnp.isfinite(vx) & jnp.isfinite(vy)
    h0, h1 = horizon
    d = jnp.stack([im_h * (h1 - h0), jnp.float32(-im_w)])
    d = d / jnp.maximum(jnp.linalg.norm(d), _EPS)
    far = 1e8 * d
    ax = jnp.where(finite, vx * im_w, far[0] + 0.5 * im_w - 0.5)
    ay = jnp.where(finite, vy * im_h, far[1] + 0.5 * im_h - 0.5)
    asign = jnp.where(finite, sign, 1.0)
    return jnp.stack([ax, ay, asign])


# ---------------------------------------------------------------------------
# dense fields
# ---------------------------------------------------------------------------


def up_field_general(focal_rel, im_w: int, im_h: int, elevation, roll, cx_rel, cy_rel):
    """Per-pixel unit up-vector field for an arbitrary principal point.

    Pixel grid uses half-integer centers (i + 0.5), identical to the
    reference's linspace construction (panocam.py:469-482). The elevation == 0
    singularity (VVP at infinity) decays to the constant field
    (-sin roll, -cos roll), matching panocam.py:486-489.

    Returns (im_h, im_w, 2) float32. Reference: panocam.py:451-510.
    """
    focal_rel = jnp.asarray(focal_rel, jnp.float32)
    elevation = jnp.asarray(elevation, jnp.float32)
    roll = jnp.asarray(roll, jnp.float32)
    cx = (jnp.asarray(cx_rel, jnp.float32) + 0.5) * im_w
    cy = (jnp.asarray(cy_rel, jnp.float32) + 0.5) * im_h
    xs = jnp.arange(im_w, dtype=jnp.float32) + 0.5
    ys = jnp.arange(im_h, dtype=jnp.float32) + 0.5
    gx, gy = jnp.meshgrid(xs, ys)
    focal = focal_rel * im_h

    sin_el = jnp.sin(elevation)
    sin_el_safe = jnp.where(jnp.abs(sin_el) < _EPS, _EPS, sin_el)
    vvp_x = jnp.sin(roll) * jnp.cos(elevation) * focal / (-sin_el_safe) + cx
    vvp_y = jnp.cos(roll) * jnp.cos(elevation) * focal / (-sin_el_safe) + cy
    ux = (vvp_x - gx) * jnp.sign(elevation)
    uy = (vvp_y - gy) * jnp.sign(elevation)

    at_horizon = elevation == 0
    ux = jnp.where(at_horizon, -jnp.sin(roll), ux)
    uy = jnp.where(at_horizon, -jnp.cos(roll), uy)

    norm = jnp.sqrt(ux * ux + uy * uy)
    norm = jnp.maximum(norm, _EPS)
    return jnp.stack([ux / norm, uy / norm], axis=-1)


def up_field(vfov, im_w: int, im_h: int, elevation, roll):
    """Centered-principal-point up-vector field from (vfov, pitch, roll).

    Equivalent to ``up_field_general`` with f_rel = 1/(2 tan(vfov/2)) and
    cx = cy = 0: the reference's separate centered path
    (panocam.py:423-448, via horizon/VVP helpers) reduces to the same
    VVP-minus-grid arithmetic (half-pixel shifts cancel).

    Returns (im_h, im_w, 2) float32.
    """
    return up_field_general(
        vfov_to_focal_rel(vfov), im_w, im_h, elevation, roll, 0.0, 0.0
    )


def lat_field_general(focal_rel, im_w: int, im_h: int, elevation, roll, cx_rel, cy_rel):
    """Per-pixel latitude map (degrees) for an arbitrary principal point.

    Rays are rotated into the world frame with R_z(roll) then R_x(elevation)
    and latitude = -atan2(y_world, hypot(x_world, z_world)). The sampling grid
    is the reference's linspace convention — endpoints at +-size/2, spacing
    size/(size-1) — kept bit-faithful for parity (panocam.py:529-541).

    Returns (im_h, im_w) float32 degrees. Reference: panocam.py:513-556.
    """
    focal_rel = jnp.asarray(focal_rel, jnp.float32)
    elevation = jnp.asarray(elevation, jnp.float32)
    roll = jnp.asarray(roll, jnp.float32)
    cx = (jnp.asarray(cx_rel, jnp.float32) + 0.5) * im_w
    cy = (jnp.asarray(cy_rel, jnp.float32) + 0.5) * im_h
    focal = focal_rel * im_h
    dy = jnp.linspace(
        (-im_h / 2.0) - (cy - im_h / 2.0), (im_h / 2.0) - (cy - im_h / 2.0), im_h
    )
    dx = jnp.linspace(
        (-im_w / 2.0) - (cx - im_w / 2.0), (im_w / 2.0) - (cx - im_w / 2.0), im_w
    )
    x, y = jnp.meshgrid(dx / focal, dy / focal)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    ce, se = jnp.cos(elevation), jnp.sin(elevation)
    x_world = x * cr - y * sr
    y_world = x * ce * sr + y * ce * cr - se
    z_world = x * se * sr + y * se * cr + ce
    lat = -jnp.arctan2(y_world, jnp.sqrt(x_world**2 + z_world**2))
    return jnp.degrees(lat)


def lat_field(vfov, im_w: int, im_h: int, elevation, roll):
    """Centered latitude map from (vfov, pitch, roll); degrees.

    Reference: perspective2d/utils/panocam.py:385-420."""
    return lat_field_general(
        vfov_to_focal_rel(vfov), im_w, im_h, elevation, roll, 0.0, 0.0
    )
