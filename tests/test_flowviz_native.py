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
