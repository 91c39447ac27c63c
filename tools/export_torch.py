"""Export framework params back to a reference-format torch checkpoint.

Inverse of tools/convert_checkpoint.py: writes a ``{"model": state_dict}``
.pth (torch layout + reference module names) so models trained with this
framework load into the reference PyTorch implementation.

Usage:
    python tools/export_torch.py --params run/params.npz --out model.pth
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from perspectivefields_tpu.checkpoint import flax_to_torch_names  # noqa: E402
from perspectivefields_tpu.checkpoint.io import load_params  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--params", required=True, help=".npz/orbax params path")
    ap.add_argument("--out", required=True, help="output .pth path")
    args = ap.parse_args()

    import numpy as np
    import torch

    params = load_params(args.params)
    sd = flax_to_torch_names(params)
    torch_sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    torch.save({"model": torch_sd}, args.out)
    print(f"wrote {args.out} ({len(torch_sd)} tensors)")


if __name__ == "__main__":
    main()
