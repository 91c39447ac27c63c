"""PanoCam-compatible camera API.

Drop-in surface for users of the reference's PanoCam class
(reference: perspective2d/utils/panocam.py:121-752): panorama loading,
perspective/distorted crops, horizon/VVP helpers, and analytic field
generation — backed by this framework's jit/vmap-able jnp ops. Methods return
numpy arrays (host) like the reference; use perspectivefields_tpu.ops
directly for on-device pipelines.

Angle conventions match the reference per method: get_image/crop_equi/
crop_distortion take degrees; the field/horizon statics take radians.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .ops import geometry as G
from .ops import pano as P


class PanoCam:
    def __init__(self, pano_path: str, device: str = "tpu"):
        self.pano_path = pano_path
        self.device = device

    def _load(self) -> np.ndarray:
        from PIL import Image

        img = Image.open(self.pano_path).convert("RGB")
        return np.asarray(img).astype(np.float32)

    def get_image(
        self,
        vfov: float = 85,
        im_w: int = 640,
        im_h: int = 480,
        azimuth: float = 0,
        elevation: float = 30,
        roll: float = 0,
        ar: float = 4.0 / 3.0,
        img_format: str = "RGB",
    ):
        """Crop a perspective view; returns (crop, horizon, vvp).

        Reference: panocam.py:132-194 (degrees in, horizon/vvp fractions out).
        """
        pano = self._load()
        v, a, e, r = np.radians([vfov, azimuth, elevation, roll])
        crop = np.asarray(P.equi2pers(pano, v, im_w, im_h, a, e, r))
        if img_format == "BGR":
            crop = crop[:, :, ::-1]
        horizon = tuple(
            float(x) for x in G.relative_horizon_line(e, r, v, im_h, im_w)
        )
        vx, vy, s = G.relative_vvp(e, r, v, im_h, im_w)
        vvp = (float(vx), float(vy), float(s))
        return crop.astype(np.uint8), horizon, vvp

    # ------------------------------------------------------------- statics

    @staticmethod
    def crop_equi(equi_img, vfov, im_w, im_h, azimuth, elevation, roll, ar, mode="bilinear"):
        """Crop a perspective view from an equirect array (degrees).

        Reference: panocam.py:197-249."""
        v, a, e, r = np.radians([vfov, azimuth, elevation, roll])
        img = np.asarray(equi_img, np.float32)
        squeeze = img.ndim == 2
        if squeeze:
            img = img[:, :, None]
        crop = np.asarray(P.equi2pers(img, v, im_w, im_h, a, e, r))
        crop = crop.astype(equi_img.dtype)
        return crop[:, :, 0] if squeeze else crop

    @staticmethod
    def crop_distortion(image360, f, xi, H, W, az, el, roll):
        """USM distorted crop; returns (im, ntheta, nphi, offset, up, lat,
        xy_map) like the reference (panocam.py:559-752). Angles in degrees."""
        if isinstance(image360, str):
            from PIL import Image

            image360 = np.asarray(Image.open(image360).convert("RGB"))
        pano = np.asarray(image360, np.float32)
        out = P.crop_distortion(pano, f, xi, H, W, az, el, roll)
        im = np.asarray(out["crop"]).astype(image360.dtype)
        # catadioptric disk mask: when f < minfocal (only reachable for
        # xi > 1, where minfocal is real) the valid image is a centered disk
        # of radius diskradius(xi, f) — zero everything outside, like the
        # reference (panocam.py:695-707; NaN fmin for xi <= 1 compares False)
        with np.errstate(invalid="ignore"):
            fmin = min_focal(W / 2.0, H / 2.0, xi)
            if np.isfinite(fmin) and f < fmin:
                r = disk_radius(xi, f)
                ci, cj = np.round(H / 2.0), np.round(W / 2.0)
                jj, ii = np.meshgrid(np.arange(W) - cj, np.arange(H) - ci)
                im = im * (ii * ii + jj * jj < r * r)[:, :, None].astype(im.dtype)
        ntheta = np.asarray(out["theta"])
        nphi = np.asarray(out["phi"])
        up = np.asarray(out["up"])
        lat = np.asarray(out["lat"])
        xy_map = np.asarray(out["xy_map"])
        # horizon row offset: subpixel zero crossing of phi in the middle col
        col = nphi[:, W // 2]
        sign_change = np.where(np.diff(np.sign(col)))[0]
        if len(sign_change) == 0:
            offset = np.nan
        else:
            i = sign_change[0]
            dy = col[i + 1] - col[i]
            offset = i - col[i] / dy
        return im, ntheta, nphi, offset, up, lat, xy_map

    @staticmethod
    def get_up(vfov, im_w, im_h, elevation, roll):
        """(H, W, 2) up field; radians. Reference: panocam.py:423-448."""
        return np.asarray(G.up_field(vfov, im_w, im_h, elevation, roll))

    @staticmethod
    def get_lat(vfov, im_w, im_h, elevation, roll):
        """(H, W) latitude degrees; radians in. Reference: panocam.py:385-420."""
        return np.asarray(G.lat_field(vfov, im_w, im_h, elevation, roll))

    @staticmethod
    def get_up_general(focal_rel, im_w, im_h, elevation, roll, cx_rel, cy_rel):
        """Reference: panocam.py:451-510."""
        return np.asarray(
            G.up_field_general(focal_rel, im_w, im_h, elevation, roll, cx_rel, cy_rel)
        )

    @staticmethod
    def get_lat_general(focal_rel, im_w, im_h, elevation, roll, cx_rel, cy_rel):
        """Reference: panocam.py:513-556."""
        return np.asarray(
            G.lat_field_general(focal_rel, im_w, im_h, elevation, roll, cx_rel, cy_rel)
        )

    @staticmethod
    def getRelativeVVP(elevation, roll, vfov, im_h, im_w):
        """Reference: panocam.py:302-333 (returns (inf, inf) at horizon)."""
        vx, vy, s = G.relative_vvp(elevation, roll, vfov, im_h, im_w)
        if not np.isfinite(float(vx)):
            return (np.inf, np.inf)
        return float(vx), float(vy), float(s)

    @staticmethod
    def getRelativeHorizonLineFromAngles(elevation, roll, vfov, im_h, im_w):
        """Reference: panocam.py:335-351."""
        h0, h1 = G.relative_horizon_line(elevation, roll, vfov, im_h, im_w)
        return float(h0), float(h1)

    @staticmethod
    def getAbsVVP(im_h, im_w, horizon, vvp):
        """Reference: panocam.py:276-300."""
        if len(vvp) == 2:
            vvp = (vvp[0], vvp[1], 0.0)
        return np.asarray(G.abs_vvp(im_h, im_w, horizon, vvp))

    @staticmethod
    def getGravityField(im_h, im_w, absvvp) -> np.ndarray:
        """Up field from an absolute VVP. Reference: panocam.py:251-273."""
        gx, gy = np.meshgrid(np.arange(im_w), np.arange(im_h))
        d = np.stack([absvvp[0] - gx, absvvp[1] - gy], axis=-1).astype(np.float64)
        n = np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
        return (d / n) * absvvp[2]


def min_focal(u0, v0, xi, xref=1.0, yref=1.0):
    """Min focal for a catadioptric image (reference: panocam.py:64-70)."""
    return float(P.min_focal(u0, v0, xi, xref, yref))


def disk_radius(xi, f):
    """Catadioptric disk radius (reference: panocam.py:18-19)."""
    return float(P.disk_radius(xi, f))
