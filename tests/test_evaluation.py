"""Evaluation module: metric math + the evaluate_pairs driver API.

evaluate_pairs is the module form of the paper-metrics eval loop
(VERDICT r4 weak #5): it must aggregate correctly over the synthetic
generator's batches, weight by batch size, include param errors when cams
are present, and a perfect predictor must score ~0.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perspectivefields_tpu.config import (
    BackboneConfig,
    GravityHeadConfig,
    LatitudeHeadConfig,
    ModelConfig,
    ParamNetConfig,
)
from perspectivefields_tpu.data import data_iterator
from perspectivefields_tpu.evaluation import (
    evaluate_pairs,
    field_metrics,
    up_angular_error,
)


def _tiny_model():
    from perspectivefields_tpu import PerspectiveFields

    cfg = ModelConfig(
        version="custom",
        backbone=BackboneConfig(
            dims=(8, 16, 24, 32), depths=(1, 1, 1, 1), num_heads=(1, 2, 3, 4)
        ),
        gravity=GravityHeadConfig(
            loss_type="regression", embed_dim=16, fusion_dim=16
        ),
        latitude=LatitudeHeadConfig(
            loss_type="regression", embed_dim=16, fusion_dim=16
        ),
        param=ParamNetConfig(
            name="ParamNetConvNextRegress",
            predict_params=("roll", "pitch", "vfov"),
            input_size=32,
        ),
        recover_rpf=True,
        resize=(64, 64),
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # random init is intended here
        return PerspectiveFields(version="custom", config=cfg, compute_dtype="float32")


def test_up_angular_error_basics():
    a = jnp.asarray([[0.0, 1.0]])
    b = jnp.asarray([[1.0, 0.0]])
    np.testing.assert_allclose(up_angular_error(a, a), [0.0], atol=1e-5)
    np.testing.assert_allclose(up_angular_error(a, b), [90.0], atol=1e-4)
    # invalid (zero) GT is masked to 0
    np.testing.assert_allclose(
        up_angular_error(a, jnp.zeros((1, 2))), [0.0], atol=1e-6
    )


def test_evaluate_pairs_over_synthetic_generator():
    model = _tiny_model()
    it = data_iterator(jax.random.PRNGKey(0), batch_size=4, im_hw=(64, 64))
    res = evaluate_pairs(model, it, max_samples=8)
    assert res["samples"] == 8
    # the full paper-metric table, plus param errors (cams present)
    for key in (
        "up_mean_deg",
        "up_median_deg",
        "lat_mean_deg",
        "lat_median_deg",
        "roll_abs_err",
        "pitch_abs_err",
        "vfov_abs_err",
    ):
        assert key in res and np.isfinite(res[key]), (key, res.get(key))
    # random weights: errors are large but bounded by the metric ranges
    assert 0.0 <= res["up_mean_deg"] <= 180.0
    assert 0.0 <= res["lat_mean_deg"] <= 180.0


def test_evaluate_pairs_perfect_predictor_scores_zero():
    """Feed the GT back as the prediction: every metric must be ~0 —
    catches sign/encoding/aggregation bugs in the driver itself."""
    model = _tiny_model()
    it = data_iterator(jax.random.PRNGKey(1), batch_size=4, im_hw=(64, 64))
    batches = [next(it), next(it)]

    class Oracle:
        cfg = model.cfg
        params = None

        def __init__(self):
            self._i = 0

        def _forward_prenormalized_fn(self, params, images):
            batch = batches[self._i]
            self._i += 1
            cams = batch["cams"]
            return {
                "pred_gravity": batch["gt_gravity"],
                "pred_latitude": batch["gt_latitude"],
                "pred_roll": jnp.degrees(cams["roll"]),
                "pred_pitch": jnp.degrees(cams["elevation"]),
                "pred_vfov": jnp.degrees(cams["vfov"]),
            }

    res = evaluate_pairs(Oracle(), iter(batches))
    assert res["samples"] == 8
    for k, v in res.items():
        if k != "samples":
            assert abs(v) < 1e-3, (k, v)


def test_evaluate_pairs_batch_weighting_and_empty():
    model = _tiny_model()
    with pytest.raises(ValueError):
        evaluate_pairs(model, iter(()))
    # max_samples stops mid-iterable
    it = data_iterator(jax.random.PRNGKey(2), batch_size=4, im_hw=(64, 64))
    res = evaluate_pairs(model, it, max_samples=4)
    assert res["samples"] == 4


def test_evaluate_pairs_classification_heads():
    """Bin-encoded heads (the zoo's PersNet-360Cities shape) must be decoded
    with the argmax codecs, not fed raw into the vector/arcsin math."""
    from perspectivefields_tpu import PerspectiveFields

    cfg = ModelConfig(
        version="custom",
        backbone=BackboneConfig(
            dims=(8, 16, 24, 32), depths=(1, 1, 1, 1), num_heads=(1, 2, 3, 4)
        ),
        gravity=GravityHeadConfig(
            loss_type="classification", num_classes=73, embed_dim=16,
            fusion_dim=16,
        ),
        latitude=LatitudeHeadConfig(
            loss_type="classification", num_classes=180, embed_dim=16,
            fusion_dim=16,
        ),
        param=ParamNetConfig(
            name="ParamNetConvNextRegress",
            predict_params=("roll", "pitch", "vfov"),
            input_size=32,
        ),
        recover_rpf=True,
        resize=(64, 64),
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        model = PerspectiveFields(
            version="custom", config=cfg, compute_dtype="float32"
        )
    it = data_iterator(jax.random.PRNGKey(3), batch_size=2, im_hw=(64, 64))
    res = evaluate_pairs(model, it, max_samples=4)
    assert res["samples"] == 4
    for key in ("up_mean_deg", "up_median_deg", "lat_mean_deg", "lat_median_deg"):
        assert np.isfinite(res[key]) and 0.0 <= res[key] <= 180.0, (key, res[key])


def test_evaluate_pairs_global_median():
    """The reported median must be the dataset median over all pixels, not
    the batch-size-weighted mean of per-batch medians (a different and
    generally wrong statistic for skewed distributions)."""
    model = _tiny_model()
    it = data_iterator(jax.random.PRNGKey(4), batch_size=4, im_hw=(64, 64))
    batches = [next(it), next(it)]

    # Craft per-pixel latitude errors with a known skew ACROSS batches:
    # batch 0 predicts GT exactly (error 0); batch 1 is off by 40 deg
    # everywhere. Global median over 2 equal batches of pixels = 20 deg
    # (the histogram midpoint falls at the boundary; any per-batch-median
    # average would give 20 too) -- so use 3:1 skew instead: three zero-
    # error batches, one 40-deg batch => global median 0, mean-of-medians
    # would be 10.
    batches = [next(it) for _ in range(2)]
    all_batches = [dict(b) for b in batches for _ in (0, 1)]  # 4 batches

    class Oracle:
        cfg = model.cfg
        params = None

        def __init__(self):
            self._i = 0

        def _forward_prenormalized_fn(self, params, images):
            b = all_batches[self._i]
            off = 40.0 if self._i == 3 else 0.0  # only the LAST batch errs
            self._i += 1
            lat_deg = jnp.degrees(jnp.arcsin(b["gt_latitude"][..., 0]))
            shifted = jnp.clip(lat_deg + off, -90.0, 90.0)
            return {
                "pred_gravity": b["gt_gravity"],
                "pred_latitude": jnp.sin(jnp.radians(shifted))[..., None],
            }

    res = evaluate_pairs(Oracle(), iter(all_batches))
    assert res["samples"] == 16
    # 3/4 of all pixels have ~0 error -> global median ~0 (within the
    # 0.1-deg histogram bin + clip slack), NOT ~10 (mean of batch medians)
    assert res["lat_median_deg"] < 0.5, res["lat_median_deg"]
    assert res["lat_mean_deg"] > 1.0  # the 40-deg batch does register
