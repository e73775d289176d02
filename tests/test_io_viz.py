"""I/O round-trips, preprocessing presets, metrics, and viz invariants."""

import os

import numpy as np
import pytest

from opticalflow_tpu.io.flo import read_flo, write_flo
from opticalflow_tpu.io.kitti import read_flow_png, write_flow_png
from opticalflow_tpu.io import images as imio
from opticalflow_tpu.utils import metrics as M
from opticalflow_tpu.viz.colorwheel import flow_to_color
from opticalflow_tpu.viz.vanishing import estimate_vanishing_point


def test_flo_round_trip(tmp_path):
    flow = np.random.RandomState(0).randn(17, 23, 2).astype(np.float32)
    p = str(tmp_path / "a.flo")
    write_flo(p, flow)
    # header layout: f32 tag, i32 W, i32 H (script_pwc.py:12-27)
    import struct
    with open(p, "rb") as f:
        tag, w, h = struct.unpack("<fii", f.read(12))
    assert (round(tag, 2), w, h) == (202021.25, 23, 17)
    np.testing.assert_array_equal(read_flo(p), flow)


def test_flo_rejects_bad_magic(tmp_path):
    p = str(tmp_path / "bad.flo")
    with open(p, "wb") as f:
        f.write(b"\x00" * 32)
    with pytest.raises(ValueError, match="magic"):
        read_flo(p)


def test_kitti_png_round_trip(tmp_path):
    pytest.importorskip("cv2")
    rng = np.random.RandomState(1)
    flow = (rng.randn(31, 45, 2) * 10).astype(np.float32)
    valid = rng.rand(31, 45) > 0.3
    p = str(tmp_path / "f.png")
    write_flow_png(p, flow, valid)
    back, vback = read_flow_png(p)
    np.testing.assert_array_equal(vback, valid)
    # 1/64 px quantization
    np.testing.assert_allclose(back, flow, atol=1 / 64 + 1e-6)


def test_kitti_png_fallback_writer_matches_cv2(tmp_path):
    """The no-cv2 fallback writer (hand-rolled 16-bit RGB PNG encoder) must
    produce files cv2 decodes bit-identically to cv2-written ones.  (The
    old imageio format='PNG-FI' fallback needed the FreeImage native
    binary, absent by default — it raised in exactly the no-cv2
    environment it existed for.)"""
    pytest.importorskip("cv2")
    from opticalflow_tpu.io.kitti import _write_png_u16_rgb
    rng = np.random.RandomState(4)
    flow = (rng.randn(31, 45, 2) * 10).astype(np.float32)
    valid = rng.rand(31, 45) > 0.3
    out = np.zeros((31, 45, 3), np.uint16)
    scaled = np.clip(flow * 64.0 + 32768.0, 0, 65535)
    out[..., 0] = scaled[..., 0].astype(np.uint16)
    out[..., 1] = scaled[..., 1].astype(np.uint16)
    out[..., 2] = valid.astype(np.uint16)
    pa, pb = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    _write_png_u16_rgb(pa, out)
    write_flow_png(pb, flow, valid)
    fa, va = read_flow_png(pa)
    fb, vb = read_flow_png(pb)
    np.testing.assert_array_equal(fa, fb)
    np.testing.assert_array_equal(va, vb)
    np.testing.assert_array_equal(va, valid)


def test_pad_unpad_round_trip():
    img = np.random.RandomState(2).rand(1, 100, 200, 3).astype(np.float32)
    padded, ph, pw = imio.pad_to_multiple_of_64(img)
    assert padded.shape[1] % 64 == 0 and padded.shape[2] % 64 == 0
    assert (ph, pw) == (28, 56)
    # replicate padding
    np.testing.assert_array_equal(padded[0, 99], padded[0, 100])
    np.testing.assert_array_equal(imio.unpad(padded, ph, pw), img)


def test_resize_to_64():
    img = np.zeros((436, 1024, 3), np.uint8)
    out, h, w = imio.resize_to_multiple_of_64(img)
    assert out.shape[:2] == (448, 1024) and (h, w) == (436, 1024)


def test_preprocess_presets():
    rng = np.random.RandomState(3)
    im = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    x = imio.preprocess_pair(im, im, "bgr_unit")
    assert x.shape == (1, 64, 64, 6)
    # BGR flip: channel 0 of the tensor is the image's B channel / 255
    np.testing.assert_allclose(x[0, ..., 0], im[..., 2] / 255.0, atol=1e-6)
    xr = imio.preprocess_pair(im, im, "rgb_unit")
    np.testing.assert_allclose(xr[0, ..., 0], im[..., 0] / 255.0, atol=1e-6)
    xi = imio.preprocess_pair(im, im, "rgb_imagenet")
    np.testing.assert_allclose(
        xi[0, ..., 0], (im[..., 0] / 255.0 - 0.485) / 0.229, atol=1e-5)
    with pytest.raises(ValueError, match="preset"):
        imio.preprocess_pair(im, im, "bogus")


def test_epe_fl_metrics():
    gt = np.zeros((10, 10, 2))
    pred = gt.copy()
    pred[0, 0] = [3.0, 4.0]  # epe 5 at one pixel
    assert M.epe(pred, gt) == pytest.approx(0.05)
    # fl-all: epe 5 > 3 and > 0.05*0 -> outlier; 1/100 px
    assert M.fl_all(pred, gt) == pytest.approx(1.0)
    valid = np.zeros((10, 10), bool)
    valid[0, 0] = True
    assert M.epe(pred, gt, valid) == pytest.approx(5.0)
    assert np.isnan(M.epe(pred, gt, np.zeros((10, 10), bool)))


def test_parity_report_fields():
    a = np.random.RandomState(4).randn(8, 8, 2)
    rep = M.parity_report(a, a + 1e-3)
    for key in ("l2", "mae", "max_abs", "rel_l2", "cosine", "pearson",
                "epe_mean", "epe_max", "agree@1.0"):
        assert key in rep
    assert rep["agree@1.0"] == 100.0


def test_flow_to_color_directions():
    """Zero flow → white; the four cardinal directions → distinct hues."""
    flow = np.zeros((4, 4, 2), np.float32)
    img = flow_to_color(flow)
    assert (img == 255).all()  # zero magnitude = white everywhere
    big = np.zeros((2, 2, 2), np.float32)
    big[0, 0] = [10, 0]; big[0, 1] = [-10, 0]
    big[1, 0] = [0, 10]; big[1, 1] = [0, -10]
    img = flow_to_color(big)
    cols = {tuple(img[i, j]) for i in range(2) for j in range(2)}
    assert len(cols) == 4  # four distinct direction colors


def test_vanishing_point_radial_flow():
    """A radial expansion field has its vanishing point at the center."""
    h, w = 128, 192
    cy, cx = 64.0, 96.0
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    flow = np.stack([(xs - cx) * 0.1, (ys - cy) * 0.1], axis=-1)
    vp = estimate_vanishing_point(flow, step=8, min_mag=0.5)
    assert vp is not None
    vx, vy, prob = vp
    assert abs(vx - cx) < 6 and abs(vy - cy) < 6
    assert prob > 0.3
