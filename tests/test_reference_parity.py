"""Full-model forward parity against the reference's OWN code.

Builds the actual `/root/reference/perspective2d` PerspectiveFields (torch)
for every zoo version — with ~30-line vendored stubs for its unavailable deps
(timm/yacs/omegaconf/equilib/torchvision, see tests/_ref_stubs/) — loads OUR
randomly-initialized flax params into it via the checkpoint converter, and
asserts the end-to-end `inference(img_bgr)` outputs match.

This exercises the real reference graph (perspectivefields.py:121-272):
whole-model wiring, per-stage LN placement, head topology, postprocess — not
hand-written per-block oracles. Weight-value parity vs released checkpoints
additionally needs the actual .pth files (tests/test_demo_golden.py).
"""

import os
import sys
import warnings

import numpy as np
import pytest

_STUBS = os.path.join(os.path.dirname(__file__), "_ref_stubs")
_REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(_REF, "perspective2d")),
    reason="reference repo not mounted",
)

VERSIONS = [
    "PersNet-360Cities",
    "Paramnet-360Cities-edina-centered",
    "Paramnet-360Cities-edina-uncentered",
    "PersNet_Paramnet-GSV-centered",
    "PersNet_Paramnet-GSV-uncentered",
]


def _import_reference():
    for p in (_STUBS, _REF):
        if p not in sys.path:
            sys.path.insert(0, p)
    from perspective2d.perspectivefields import PerspectiveFields as RefPF

    return RefPF


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(7)
    # non-square so the resize + postprocess-back path is exercised
    return rng.integers(0, 256, size=(240, 304, 3)).astype(np.uint8)


def _build_pair(version):
    """(ref torch model, our model) sharing identical (random) weights."""
    import torch

    from perspectivefields_tpu import PerspectiveFields
    from perspectivefields_tpu.checkpoint import flax_to_torch_names

    RefPF = _import_reference()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # random-init warning is expected
        ours = PerspectiveFields(version, compute_dtype="float32")

    orig_init = RefPF._init_weights
    RefPF._init_weights = lambda self: None
    try:
        ref = RefPF(version).eval().float()
    finally:
        RefPF._init_weights = orig_init

    sd = {
        k: torch.from_numpy(np.asarray(v, np.float32))
        for k, v in flax_to_torch_names(ours.params).items()
    }
    status = ref.load_state_dict(sd, strict=False)
    assert not status.unexpected_keys, status.unexpected_keys
    # only torch-internal BN counters may be absent from the converted tree
    for k in status.missing_keys:
        assert k.endswith("num_batches_tracked"), f"converter missed {k}"
    return ref, ours


@pytest.mark.parametrize("version", VERSIONS)
def test_forward_parity(version, image):
    import torch

    ref, ours = _build_pair(version)
    with torch.no_grad():
        ref_out = ref.inference(img_bgr=image)
    our_out = ours.inference(img_bgr=image, channels_first=True)

    def close(key, a, b, atol):
        np.testing.assert_allclose(
            np.asarray(a, np.float32),
            np.asarray(b, np.float32),
            atol=atol,
            rtol=1e-4,
            err_msg=f"{version}: {key}",
        )

    # unit-scale fields; 5e-4 covers f32 accumulation noise across ~100 convs
    # (observed max diff 1.2e-4 on normalized low-norm pixels)
    close("pred_gravity", ref_out["pred_gravity"], our_out["pred_gravity"], 5e-4)
    close("pred_latitude", ref_out["pred_latitude"], our_out["pred_latitude"], 5e-4)
    close(
        "pred_gravity_original",
        ref_out["pred_gravity_original"],
        our_out["pred_gravity_original"],
        5e-4,
    )
    close(
        "pred_latitude_original",
        ref_out["pred_latitude_original"],
        our_out["pred_latitude_original"],
        1e-3,  # degrees after asin: slope blows up near |lat| -> 90
    )
    assert our_out["pred_latitude_original_mode"] == "deg"

    if ref.param_net is not None:
        for key in (
            "pred_roll",
            "pred_pitch",
            "pred_vfov",
            "pred_general_vfov",
            "pred_rel_cx",
            "pred_rel_cy",
        ):
            if key in ref_out:
                assert key in our_out, f"{version}: missing {key}"
                close(key, ref_out[key], our_out[key], 1e-3)
        pcfg = ours.cfg.param
        backfilled = (
            pcfg.name == "ParamNetConvNextRegress"
            and "rel_focal" not in pcfg.predict_params
        )
        if backfilled:
            _check_rel_focal(version, ref_out, our_out)
        else:
            close("pred_rel_focal", ref_out["pred_rel_focal"], our_out["pred_rel_focal"], 1e-3)
    else:
        assert "pred_roll" not in our_out


def _gvfov_residual(focal, d_cx, d_cy, gvfov_deg):
    """The reference's fsolve residual (utils/utils.py:74-80), h=1."""
    p_sqr = focal**2 + d_cx**2 + (d_cy + 0.5) ** 2
    q_sqr = focal**2 + d_cx**2 + (d_cy - 0.5) ** 2
    cos_fov = (p_sqr + q_sqr - 1) / 2 / np.sqrt(p_sqr) / np.sqrt(q_sqr)
    return cos_fov - np.cos(np.radians(gvfov_deg))


def _check_rel_focal(version, ref_out, our_out):
    """pred_rel_focal: the reference backfills it with scipy.fsolve from init
    1.5 (utils/utils.py:85-90), which fails to converge on the garbage gvfov
    values random weights produce and silently returns a wrong value. When the
    reference's own residual says its focal IS a root, require equality;
    otherwise require OUR focal to be a true root of the reference equation —
    deliberately more correct than a non-converged fsolve."""
    ref_f = float(ref_out["pred_rel_focal"])
    our_f = float(our_out["pred_rel_focal"])
    d_cx = float(ref_out["pred_rel_cx"])
    d_cy = float(ref_out["pred_rel_cy"])
    gv = float(ref_out["pred_general_vfov"])
    if abs(_gvfov_residual(ref_f, d_cx, d_cy, gv)) < 1e-6:
        np.testing.assert_allclose(
            our_f, ref_f, rtol=1e-3, atol=1e-3, err_msg=f"{version}: pred_rel_focal"
        )
        return
    # ref fsolve diverged. If the equation has a root at all, ours must be it;
    # random weights can produce gvfov values with NO attainable focal (the
    # law-of-cosines cos is sign-constrained), where any output is acceptable.
    grid = np.logspace(-6, 6, 4000)
    res = _gvfov_residual(grid, d_cx, d_cy, gv)
    root_exists = bool(np.any(np.signbit(res[:-1]) != np.signbit(res[1:])))
    if root_exists:
        assert abs(_gvfov_residual(abs(our_f), d_cx, d_cy, gv)) < 1e-4, (
            f"{version}: our rel_focal {our_f} is not a root "
            f"(ref fsolve diverged, ref={ref_f})"
        )
