"""End-to-end demo CLI: predict + visualize perspective fields for an image.

Equivalent of the reference's demo/demo.py:143-165 with a proper argparse
CLI. Saves the field visualization and (for ParamNet versions) the
camera-parameter visualization, printing roll/pitch/vfov/cx/cy like the
reference's golden output block (demo/demo.py:157-161).

Usage:
    python demo/demo.py --image path/to.jpg \
        --version Paramnet-360Cities-edina-centered --output debug/
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from perspectivefields_tpu import PerspectiveFields  # noqa: E402
from perspectivefields_tpu.utils import (  # noqa: E402
    draw_from_r_p_f_cx_cy,
    draw_perspective_fields,
)


def load_image_bgr(path: str | None) -> np.ndarray:
    if path is None:
        # synthetic fallback so the demo runs without assets
        rng = np.random.default_rng(0)
        img = np.zeros((480, 640, 3), np.uint8)
        img[:240] = (200, 160, 120)  # sky-ish gradient
        img[240:] = (60, 90, 120)
        img += rng.integers(0, 30, img.shape, dtype=np.uint8)
        return img
    import cv2

    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(path)
    return img


def resize_fix_aspect(img_rgb, up, lat, target_width=640):
    import cv2

    h, w = img_rgb.shape[:2]
    factor = target_width / w
    tw, th = target_width, int(h * factor)
    img_rgb = cv2.resize(img_rgb, (tw, th))
    up = cv2.resize(up, (tw, th))
    lat = cv2.resize(lat, (tw, th))
    return img_rgb, up, lat


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--image", default=None, help="input image path (BGR)")
    ap.add_argument(
        "--version", default="Paramnet-360Cities-edina-centered",
        help="model zoo version (see --list)",
    )
    ap.add_argument("--weights", default=None, help="converted .npz/orbax params")
    ap.add_argument("--output", default="debug", help="output folder")
    ap.add_argument("--list", action="store_true", help="list zoo versions")
    ap.add_argument(
        "--dtype", default="bfloat16", choices=["bfloat16", "float32"],
        help="compute dtype",
    )
    args = ap.parse_args()

    if args.list:
        PerspectiveFields.versions()
        return

    img_bgr = load_image_bgr(args.image)  # fail fast before model build
    model = PerspectiveFields(
        version=args.version, params=args.weights, compute_dtype=args.dtype
    )
    pred = model.inference(img_bgr=img_bgr)

    os.makedirs(args.output, exist_ok=True)
    img_rgb = np.ascontiguousarray(img_bgr[:, :, ::-1])
    up = pred["pred_gravity_original"]
    lat = np.radians(pred["pred_latitude_original"])
    img_rgb_s, up_s, lat_s = resize_fix_aspect(img_rgb, up, lat)
    field_vis = draw_perspective_fields(img_rgb_s, up_s, lat_s, color=(0, 1, 0))

    import cv2

    cv2.imwrite(
        os.path.join(args.output, "perspective_pred.png"), field_vis[:, :, ::-1]
    )

    if model.param_on:
        roll = float(pred["pred_roll"])
        pitch = float(pred["pred_pitch"])
        gvfov = float(pred["pred_general_vfov"])
        cx = float(pred["pred_rel_cx"])
        cy = float(pred["pred_rel_cy"])
        print(f"roll: {roll:.2f}")
        print(f"pitch: {pitch:.2f}")
        print(f"vfov: {gvfov:.2f}")
        print(f"cx: {cx:.2f}")
        print(f"cy: {cy:.2f}")
        param_vis = draw_from_r_p_f_cx_cy(
            img_rgb_s, roll, pitch, gvfov, cx, cy, "deg", up_color=(0, 1, 0)
        ).astype(np.uint8)
        cv2.imwrite(
            os.path.join(args.output, "param_pred.png"), param_vis[:, :, ::-1]
        )
    print(f"saved visualizations to {args.output}/")


if __name__ == "__main__":
    main()
