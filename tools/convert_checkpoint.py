"""Convert released PerspectiveFields torch checkpoints to this framework.

Downloads (or reads a local .pth) and writes a flat .npz params file into
perspectivefields_tpu/weights/<version>.npz, where the API picks it up
automatically.

Usage:
    python tools/convert_checkpoint.py --version Paramnet-360Cities-edina-centered
    python tools/convert_checkpoint.py --pth /path/to/cvpr2023.pth --version PersNet-360Cities
    python tools/convert_checkpoint.py --all
"""

from __future__ import annotations

import argparse
import os
import sys
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from perspectivefields_tpu.checkpoint import load_torch_checkpoint  # noqa: E402
from perspectivefields_tpu.checkpoint.io import save_params  # noqa: E402
from perspectivefields_tpu.config import model_zoo  # noqa: E402

WEIGHTS_DIR = os.path.join(
    os.path.dirname(__file__), "..", "perspectivefields_tpu", "weights"
)


def convert_one(version: str, pth_path: str | None = None):
    entry = model_zoo[version]
    if pth_path is None:
        url = entry["weights_url"]
        pth_path = os.path.join(WEIGHTS_DIR, os.path.basename(url))
        if not os.path.exists(pth_path):
            os.makedirs(WEIGHTS_DIR, exist_ok=True)
            print(f"downloading {url} ...")
            urllib.request.urlretrieve(url, pth_path)
    params = load_torch_checkpoint(pth_path)
    out = os.path.join(WEIGHTS_DIR, f"{version}.npz")
    os.makedirs(WEIGHTS_DIR, exist_ok=True)
    save_params(params, out)
    print(f"wrote {out}")

    # sanity: run one forward with the converted weights
    import jax.numpy as jnp

    from perspectivefields_tpu import PerspectiveFields

    model = PerspectiveFields(version=version, params=params)
    import numpy as np

    img = np.zeros((320, 320, 3), np.uint8)
    pred = model.inference(img_bgr=img)
    print({k: getattr(v, "shape", v) for k, v in pred.items()})


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--version", default=None, choices=list(model_zoo))
    ap.add_argument("--pth", default=None, help="local .pth path (skip download)")
    ap.add_argument("--all", action="store_true", help="convert all 5 versions")
    args = ap.parse_args()
    if args.all:
        for v in model_zoo:
            convert_one(v)
    elif args.version:
        convert_one(args.version, args.pth)
    else:
        ap.error("pass --version or --all")


if __name__ == "__main__":
    main()
