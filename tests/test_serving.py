"""Serving pipeline: streaming correctness + padding + mesh path."""

import numpy as np
import pytest

from perspectivefields_tpu import PerspectiveFields
from perspectivefields_tpu.config import (
    BackboneConfig,
    GravityHeadConfig,
    LatitudeHeadConfig,
    ModelConfig,
)
from perspectivefields_tpu.serving import BatchPredictor


@pytest.fixture(scope="module")
def tiny_model():
    cfg = ModelConfig(
        version="custom",
        backbone=BackboneConfig(dims=(8, 16, 24, 32), depths=(1, 1, 1, 1), num_heads=(1, 2, 3, 4)),
        gravity=GravityHeadConfig(loss_type="regression", embed_dim=16, fusion_dim=16),
        latitude=LatitudeHeadConfig(loss_type="regression", embed_dim=16, fusion_dim=16),
        resize=(64, 64),
    )
    with pytest.warns(UserWarning):
        return PerspectiveFields(version="custom", config=cfg)


@pytest.mark.parametrize("wire", ["u8", "f32"])
def test_streaming_matches_batch_api(tiny_model, wire):
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8) for _ in range(5)]
    pred = BatchPredictor(tiny_model, batch_size=2, use_mesh=False, wire=wire)
    outs = pred.predict(imgs)
    assert len(outs) == 5  # tail padding dropped
    ref = tiny_model.inference_batch(img_bgr_list=imgs)
    for i in range(5):
        np.testing.assert_allclose(
            np.asarray(outs[i]["pred_gravity"], np.float32),
            ref[i]["pred_gravity"],
            atol=1e-5,
        )
    summary = pred.timer.summary()
    assert "preprocess" in summary and "device_wait" in summary


def test_select_limits_readback(tiny_model):
    rng = np.random.default_rng(2)
    imgs = [rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8) for _ in range(3)]
    keys = ("pred_gravity",)
    pred = BatchPredictor(
        tiny_model, batch_size=2, use_mesh=False, select=keys
    )
    outs = pred.predict(imgs)
    assert all(tuple(o.keys()) == keys for o in outs)
    full = BatchPredictor(tiny_model, batch_size=2, use_mesh=False).predict(imgs)
    np.testing.assert_allclose(
        np.asarray(outs[1]["pred_gravity"], np.float32),
        np.asarray(full[1]["pred_gravity"], np.float32),
        atol=0,
    )


def test_bad_wire_rejected(tiny_model):
    with pytest.raises(ValueError, match="wire"):
        BatchPredictor(tiny_model, wire="f64")
    with pytest.raises(ValueError, match="out_wire"):
        BatchPredictor(tiny_model, out_wire="bf16")


@pytest.mark.parametrize("out_wire,atol", [("f16", 2e-3), ("u8", 0.01)])
def test_out_wire_compact_readback(tiny_model, out_wire, atol):
    """Compact device->host encodings decode back to float32 within the
    documented error bound (f16 ~5e-4; u8 fixed-point 1/255 per channel)."""
    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8) for _ in range(5)]
    pred = BatchPredictor(
        tiny_model, batch_size=2, use_mesh=False, out_wire=out_wire
    )
    outs = pred.predict(imgs)
    assert len(outs) == 5
    ref = BatchPredictor(tiny_model, batch_size=2, use_mesh=False).predict(imgs)
    for i in range(5):
        for k in ("pred_gravity", "pred_latitude"):
            got = outs[i][k]
            assert got.dtype == np.float32  # decoded, not raw wire bytes
            np.testing.assert_allclose(
                got, np.asarray(ref[i][k], np.float32), atol=atol
            )
    # u8 wire must actually keep the bounded fields in [-1, 1]
    if out_wire == "u8":
        assert pred._pack_modes["pred_gravity"] == "u8"
        assert pred._pack_modes["pred_latitude"] == "u8"
        assert np.all(np.abs(outs[0]["pred_latitude"]) <= 1.0 + 1e-6)


def test_out_wire_u8_params_fall_back_to_f16(tiny_model):
    """Unbounded outputs (camera params, if present) must never be u8-packed;
    with select on a bounded key only, the pack map is exactly u8."""
    rng = np.random.default_rng(8)
    imgs = [rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)]
    pred = BatchPredictor(
        tiny_model, batch_size=2, use_mesh=False, out_wire="u8",
        select=("pred_gravity",),
    )
    outs = pred.predict(imgs)
    assert set(pred._pack_modes) == {"pred_gravity"}
    assert outs[0]["pred_gravity"].dtype == np.float32


def test_streaming_with_mesh(tiny_model):
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8) for _ in range(16)]
    pred = BatchPredictor(tiny_model, batch_size=8)  # 8 CPU devices
    outs = pred.predict(imgs)
    assert len(outs) == 16
    ref = tiny_model.inference(img_bgr=imgs[3])
    np.testing.assert_allclose(
        np.asarray(outs[3]["pred_gravity"], np.float32),
        ref["pred_gravity"],
        atol=5e-4,
    )


def test_select_missing_key_fails_fast(tiny_model):
    """An unknown select key must raise an informative ValueError naming the
    valid output keys, not a bare KeyError after dispatch."""
    import pytest

    from perspectivefields_tpu.serving import BatchPredictor

    rng = np.random.default_rng(11)
    imgs = [rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)]
    bp = BatchPredictor(
        tiny_model, batch_size=2, use_mesh=False, select=("no_such_output",)
    )
    with pytest.raises(ValueError, match="no_such_output"):
        list(bp.predict_iter(imgs))
