"""Demo golden-output integration test (requires converted weights).

The reference's only executable ground truth is demo/demo.py:157-161:
`assets/imgs/cityscape.jpg` under Paramnet-360Cities-edina-centered must give
roll 4.54, pitch 48.88, vfov 52.82, cx 0.00, cy 0.00. This environment has no
network egress, so the released checkpoints cannot be fetched; the test skips
unless `tools/convert_checkpoint.py` has produced the weights.
"""

import os

import numpy as np
import pytest

_WDIR = os.path.join(
    os.path.dirname(__file__), "..", "perspectivefields_tpu", "weights"
)
# auto-runs whenever weights are present in ANY loadable form: converted .npz
# or the released .pth side-loaded as-is (api converts on the fly)
WEIGHTS_CANDIDATES = [
    os.path.join(_WDIR, "Paramnet-360Cities-edina-centered" + ext)
    for ext in (".npz", ".pth")
]
IMAGE = "/root/reference/assets/imgs/cityscape.jpg"


@pytest.mark.skipif(
    not (any(os.path.exists(w) for w in WEIGHTS_CANDIDATES) and os.path.exists(IMAGE)),
    reason="weights (.npz/.pth) / asset image not available (no network egress)",
)
def test_demo_golden_tuple():
    import cv2

    from perspectivefields_tpu import PerspectiveFields

    model = PerspectiveFields("Paramnet-360Cities-edina-centered", compute_dtype="float32")
    pred = model.inference(img_bgr=cv2.imread(IMAGE))
    assert abs(float(pred["pred_roll"]) - 4.54) < 0.05
    assert abs(float(pred["pred_pitch"]) - 48.88) < 0.05
    assert abs(float(pred["pred_general_vfov"]) - 52.82) < 0.05
    assert abs(float(pred["pred_rel_cx"])) < 0.005
    assert abs(float(pred["pred_rel_cy"])) < 0.005
    # field invariants
    up = pred["pred_gravity_original"]
    np.testing.assert_allclose(np.linalg.norm(up, axis=-1), 1.0, atol=1e-3)
