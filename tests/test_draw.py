"""Visualization smoke tests (host-side matplotlib/cv2 rendering)."""

import numpy as np

from perspectivefields_tpu.ops import lat_field, up_field
from perspectivefields_tpu.utils import (
    VisualizerPerspective,
    blend_color,
    draw_from_r_p_f,
    draw_from_r_p_f_cx_cy,
    draw_horizon_line,
    draw_latitude_field,
    draw_perspective_fields,
    draw_prediction_distribution,
    draw_up_field,
    draw_vanishing,
)


def _img(h=60, w=80):
    return np.random.default_rng(0).integers(0, 256, (h, w, 3), dtype=np.uint8)


def _fields(h=60, w=80):
    vfov, el, ro = np.radians([70.0, 20.0, 5.0])
    up = np.asarray(up_field(vfov, w, h, el, ro))
    lat = np.radians(np.asarray(lat_field(vfov, w, h, el, ro)))
    return up, lat


def test_draw_perspective_fields_returns_rgb():
    img = _img()
    up, lat = _fields()
    out = draw_perspective_fields(img, up, lat)
    assert out.shape[2] == 3 and out.dtype == np.uint8
    # something was drawn (image changed)
    assert out.shape[:2] == img.shape[:2]


def test_draw_up_field_channels_first_input():
    img = _img()
    up, _ = _fields()
    out = draw_up_field(img, up.transpose(2, 0, 1))  # (2, h, w) auto-detected
    assert out.shape == img.shape


def test_draw_latitude_field():
    img = _img()
    _, lat = _fields()
    out = draw_latitude_field(img, lat)
    assert out.shape == img.shape


def test_draw_from_params_deg_and_rad():
    img = _img()
    out1 = draw_from_r_p_f(img, 5.0, 20.0, 70.0, "deg")
    out2 = draw_from_r_p_f_cx_cy(img, 5.0, 20.0, 70.0, 0.1, -0.1, "deg")
    assert out1.shape == img.shape and out2.shape == img.shape


def test_draw_horizon_and_vanishing():
    img = _img()
    out = draw_horizon_line(img, (0.4, 0.6), (1, 0, 0))
    assert out.shape == img.shape
    canvas = draw_vanishing(img, (0.4, 0.6), (0.5, -1.2, 1.0))
    assert canvas.shape == (180, 240, 3)  # 1x padding each side
    canvas2 = draw_vanishing(img, (0.5, 0.5), (np.inf, np.inf, 0.0))
    assert canvas2.dtype == np.uint8


def test_blend_and_hexbin():
    img = _img()
    color = np.zeros_like(img)
    out = blend_color(img, color, alpha=0.5)
    assert out.shape == img.shape
    rng = np.random.default_rng(1)
    hexb = draw_prediction_distribution(rng.normal(size=50), rng.normal(size=50))
    assert hexb.ndim == 3 and hexb.shape[2] == 3


def test_visualizer_save(tmp_path):
    vis = VisualizerPerspective(_img())
    _, lat = _fields()
    out = vis.draw_lati(lat)
    p = tmp_path / "vis.png"
    out.save(str(p))
    assert p.exists() and p.stat().st_size > 0


def test_visualizer_primitives():
    """draw_text/box/circle/line render and change pixels."""
    img = _img()
    vis = VisualizerPerspective(img)
    vis.draw_text("roll 4.5", (10, 10), color="w")
    vis.draw_box((4, 4, 28, 28), edge_color="r")
    vis.draw_circle((16, 16), color="b", radius=4)
    out = vis.draw_line([0, 31], [31, 0], color="y")
    rendered = out.get_image()
    assert rendered.shape[2] == 3
    assert not np.array_equal(rendered, vis.img)  # something was drawn
