"""Reference-surface compatibility: ResizeTransform, yaml configs, metrics,
classification-mode end-to-end."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from PIL import Image

from perspectivefields_tpu import PanoCam, ResizeTransform
from perspectivefields_tpu.config_yaml import from_reference_dict, load_reference_yaml
from perspectivefields_tpu.evaluation import field_metrics, param_errors


def test_resize_transform_uint8_matches_pil():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(123, 217, 3), dtype=np.uint8)
    t = ResizeTransform(320, 320)
    got = t.apply_image(img)
    want = np.asarray(Image.fromarray(img).resize((320, 320), Image.BILINEAR))
    np.testing.assert_array_equal(got, want)


def test_resize_transform_float_matches_torch():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(50, 70, 3)).astype(np.float32)
    t = ResizeTransform(32, 48)
    got = t.apply_image(img)
    want = (
        F.interpolate(
            torch.from_numpy(img).permute(2, 0, 1)[None],
            size=(32, 48),
            mode="bilinear",
            align_corners=False,
        )[0]
        .permute(1, 2, 0)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_yaml_config_all_reference_files():
    import glob

    files = sorted(glob.glob("/root/reference/perspective2d/config/*.yaml"))
    if not files:
        pytest.skip("reference configs not mounted")
    assert len(files) == 5
    for f in files:
        cfg = load_reference_yaml(f)
        assert cfg.gravity is not None and cfg.latitude is not None
        assert cfg.resize == (320, 320)


def test_yaml_default_tree():
    cfg = from_reference_dict({"MODEL": {"GRAVITY_ON": True, "LATITUDE_ON": True}})
    assert cfg.gravity.loss_type == "classification"  # reference default
    assert cfg.gravity.num_classes == 73
    assert cfg.param is None


def test_param_errors_selects_common_keys():
    out = param_errors(
        {"pred_roll": np.array([4.0]), "pred_pitch": np.array([50.0])},
        {"roll": np.array([4.5]), "vfov": np.array([52.0])},
    )
    assert set(out) == {"roll_abs_err"}
    np.testing.assert_allclose(np.asarray(out["roll_abs_err"]), [0.5])


def test_classification_model_end_to_end():
    from perspectivefields_tpu import PerspectiveFields
    from perspectivefields_tpu.config import (
        BackboneConfig,
        GravityHeadConfig,
        LatitudeHeadConfig,
        ModelConfig,
    )

    cfg = ModelConfig(
        version="custom",
        backbone=BackboneConfig(dims=(8, 16, 24, 32), depths=(1, 1, 1, 1), num_heads=(1, 2, 3, 4)),
        gravity=GravityHeadConfig(loss_type="classification", num_classes=73, embed_dim=16, fusion_dim=16),
        latitude=LatitudeHeadConfig(loss_type="classification", num_classes=180, embed_dim=16, fusion_dim=16),
        resize=(64, 64),
    )
    with pytest.warns(UserWarning):
        model = PerspectiveFields(version="custom", config=cfg)
    img = np.random.default_rng(2).integers(0, 256, size=(48, 48, 3), dtype=np.uint8)
    pred = model.inference(img_bgr=img)
    assert pred["pred_gravity"].shape == (64, 64, 73)  # bin logits
    assert pred["pred_latitude"].shape == (64, 64, 180)
    up = pred["pred_gravity_original"]
    assert up.shape == (48, 48, 2)
    norms = np.linalg.norm(up, axis=-1)
    # decoded bins give unit vectors (or zeros for the invalid bin)
    assert np.all((norms < 1 + 1e-4))
    lat = pred["pred_latitude_original"]
    assert lat.shape == (48, 48)
    assert np.abs(lat).max() <= 90.0
    assert "pred_roll" not in pred  # field-only model


def test_field_metrics_shapes():
    rng = np.random.default_rng(3)
    up = rng.normal(size=(2, 8, 8, 2)).astype(np.float32)
    up /= np.linalg.norm(up, axis=-1, keepdims=True)
    lat = rng.uniform(-80, 80, size=(2, 8, 8)).astype(np.float32)
    m = field_metrics(up, up, lat, lat + 1.0)
    assert float(m["up_mean_deg"]) < 1e-3
    np.testing.assert_allclose(float(m["lat_mean_deg"]), 1.0, atol=1e-5)


def test_field_metrics_partial_mask():
    """Median/mean must skip invalid (zero-vector) GT pixels, not go NaN."""
    rng = np.random.default_rng(4)
    gt = rng.normal(size=(1, 8, 8, 2)).astype(np.float32)
    gt /= np.linalg.norm(gt, axis=-1, keepdims=True)
    gt[0, :4] = 0.0  # half the pixels invalid
    pred = np.roll(gt, 1, axis=-1)  # some nonzero error on valid pixels
    lat = rng.uniform(-80, 80, size=(1, 8, 8)).astype(np.float32)
    m = field_metrics(pred, gt, lat, lat)
    for k, v in m.items():
        assert np.isfinite(float(v)), f"{k} is not finite"
    # median over valid pixels only
    from perspectivefields_tpu.evaluation import up_angular_error

    ang = np.asarray(up_angular_error(pred, gt))
    valid = np.linalg.norm(gt, axis=-1) > 1e-8
    np.testing.assert_allclose(
        float(m["up_median_deg"]), np.median(ang[valid]), rtol=1e-5
    )
