"""Native (C++) flowviz kernels vs the numpy implementations."""

import numpy as np
import pytest

from opticalflow_tpu.runtime import flowviz
from opticalflow_tpu.viz.colorwheel import flow_to_color, make_colorwheel


def _flow(h=33, w=47, seed=0):
    return (np.random.RandomState(seed).randn(h, w, 2) * 5).astype(np.float32)


def test_colorwheel_structure():
    wheel = make_colorwheel()
    assert wheel.shape == (55, 3)
    assert wheel[0].tolist() == [255, 0, 0]      # pure red start
    assert (wheel.max(axis=1) == 255).all()      # every entry saturated


@pytest.mark.skipif(not flowviz.available(), reason="no C++ toolchain")
def test_native_flow_to_color_matches_numpy():
    f = _flow()
    a = flowviz.flow_to_color_native(f)
    b = flow_to_color(f)
    # float rounding at the uint8 boundary: allow off-by-one on a few px
    diff = np.abs(a.astype(int) - b.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.02


@pytest.mark.skipif(not flowviz.available(), reason="no C++ toolchain")
def test_native_resize_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    f = _flow(24, 32, 1)
    out = flowviz.resize_flow_native(f, 48, 96)
    u = cv2.resize(f[..., 0], (96, 48)) * (96 / 32)
    v = cv2.resize(f[..., 1], (96, 48)) * (48 / 24)
    ref = np.dstack([u, v])
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.skipif(not flowviz.available(), reason="no C++ toolchain")
def test_native_max_rad():
    f = _flow(10, 10, 2)
    assert flowviz.flow_max_rad(f) == pytest.approx(
        float(np.sqrt((f ** 2).sum(-1)).max()), rel=1e-6)


@pytest.mark.skipif(not flowviz.available(), reason="no C++ toolchain")
def test_native_draw_segments_matches_cv2():
    """Bit-exact vs a loop of cv2.line — in-bounds segments."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(3)
    H, W = 61, 83
    for trial in range(200):
        segs = rng.randint(0, [W, H, W, H], size=(5, 4)).astype(np.int32)
        a = np.zeros((H, W, 3), np.uint8)
        b = np.zeros((H, W, 3), np.uint8)
        for s in segs:
            cv2.line(a, (int(s[0]), int(s[1])), (int(s[2]), int(s[3])),
                     (10, 200, 30), 1)
        assert flowviz.draw_segments_native(b, segs, (10, 200, 30))
        np.testing.assert_array_equal(a, b, err_msg=f"trial {trial}")


@pytest.mark.skipif(not flowviz.available(), reason="no C++ toolchain")
def test_native_draw_segments_clipping_matches_cv2():
    """Out-of-bounds endpoints: the rect clip must reproduce cv2's integer
    intersection arithmetic, or the Bresenham error phase shifts."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(4)
    H, W = 40, 56
    for trial in range(300):
        segs = rng.randint([-W, -H, -W, -H], [2 * W, 2 * H, 2 * W, 2 * H],
                           size=(4, 4)).astype(np.int32)
        a = np.zeros((H, W, 3), np.uint8)
        b = np.zeros((H, W, 3), np.uint8)
        for s in segs:
            cv2.line(a, (int(s[0]), int(s[1])), (int(s[2]), int(s[3])),
                     (255, 128, 1), 1)
        assert flowviz.draw_segments_native(b, segs, (255, 128, 1))
        np.testing.assert_array_equal(a, b, err_msg=f"trial {trial}")


@pytest.mark.skipif(not flowviz.available(), reason="no C++ toolchain")
def test_arrow_overlay_native_path_matches_polylines():
    """arrow_overlay output is unchanged by the native fast path."""
    from opticalflow_tpu.viz import overlay as ov
    from opticalflow_tpu.runtime import flowviz as fv
    rng = np.random.RandomState(5)
    frame = (rng.rand(72, 96, 3) * 255).astype(np.uint8)
    flow = (rng.randn(72, 96, 2) * 6).astype(np.float32)
    fast = ov.arrow_overlay(frame, flow, step=8)
    real_load = fv._load
    fv._load = lambda: None          # force the cv2.polylines fallback
    try:
        slow = ov.arrow_overlay(frame, flow, step=8)
    finally:
        fv._load = real_load
    np.testing.assert_array_equal(fast, slow)
