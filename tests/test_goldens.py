"""Golden-image regression for the visualization stack.

The reference repo checks in rendered artifacts (``results_overlay/``,
``output/`` — SURVEY.md §4.3) and relies on humans eyeballing them; here the
same idea is automated: small deterministic renderings of every visual
component are checked into ``tests/goldens/`` and pixel-compared.

Regenerate after an INTENTIONAL rendering change with:

    GOLDEN_REGEN=1 python -m pytest tests/test_goldens.py
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
REGEN = os.environ.get("GOLDEN_REGEN") == "1"


def _synthetic_flow(h=96, w=128, mag=6.0):
    """Radial flow diverging from a fixed point — gives arrows in every
    direction and a well-defined vanishing point."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cx, cy = w * 0.4, h * 0.55
    u = (xx - cx) / w * 2 * mag
    v = (yy - cy) / h * 2 * mag
    return np.dstack([u, v])


def _synthetic_frame(h=96, w=128):
    yy, xx = np.mgrid[0:h, 0:w]
    frame = np.stack([(xx * 2) % 256, (yy * 2) % 256,
                      ((xx + yy)) % 256], axis=-1).astype(np.uint8)
    return frame


def _check(name: str, img: np.ndarray, max_frac_diff=0.01):
    """Compare against the checked-in golden (or write it under REGEN)."""
    assert img.dtype == np.uint8 and img.ndim == 3
    path = os.path.join(GOLDEN_DIR, name)
    if REGEN or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        cv2.imwrite(path, img)
        if not REGEN:
            pytest.skip(f"golden {name} created; rerun to compare")
    gold = cv2.imread(path, cv2.IMREAD_COLOR)
    assert gold is not None, f"unreadable golden {path}"
    assert gold.shape == img.shape, f"{name}: shape {img.shape} vs {gold.shape}"
    # tolerate a small fraction of differing pixels (antialiasing shifts),
    # never large-scale drift
    diff = np.any(gold != img, axis=-1)
    frac = float(diff.mean())
    assert frac <= max_frac_diff, (
        f"{name}: {frac:.2%} of pixels differ from the golden "
        f"(regen with GOLDEN_REGEN=1 only if the change is intentional)")


def test_golden_colorwheel():
    from opticalflow_tpu.viz.colorwheel import flow_to_color
    rgb = flow_to_color(_synthetic_flow())
    _check("colorwheel.png", rgb[..., ::-1])  # store BGR like cv2


def test_golden_arrow_overlay():
    from opticalflow_tpu.viz.overlay import arrow_overlay
    out = arrow_overlay(_synthetic_frame(), _synthetic_flow(),
                        step=16, scale=0.5, title="golden")
    _check("arrows.png", out)


def test_golden_topview_arrows():
    from opticalflow_tpu.viz import topview as tv
    flow = _synthetic_flow()
    flow[..., 0] += 4.0  # give a dominant direction
    dom = tv.dominant_direction(flow)
    out = tv.draw_direction_arrows(_synthetic_frame(), flow, step=20,
                                   scale=2.0, dominant=dom)
    _check("topview_arrows.png", out)


def test_golden_vanishing_marker():
    from opticalflow_tpu.viz.vanishing import (estimate_vanishing_point,
                                               draw_vanishing_point)
    flow = _synthetic_flow()
    vp = estimate_vanishing_point(flow, step=8)
    assert vp is not None
    # radial-divergence center is the VP
    assert abs(vp[0] - 128 * 0.4) < 10 and abs(vp[1] - 96 * 0.55) < 10
    out = draw_vanishing_point(_synthetic_frame(), vp)
    _check("vanish_marker.png", out)


def test_golden_vanish_frame_shrink():
    """The extended canvas drawing (reference
    pwc_extract_flow_video_vanishpoint.py:258-382): shrink-to-center with
    black margin, scaled arrows + VP marker + title chip."""
    from opticalflow_tpu.viz.vanishing import vanish_frame
    out = vanish_frame(_synthetic_frame(), _synthetic_flow(), step=8,
                       shrink_ratio=0.75, title="VP")
    # margins must be black
    assert out[:5].max() == 0 and out[-5:].max() == 0
    assert out[:, :5].max() == 0 and out[:, -5:].max() == 0
    _check("vanish_shrink.png", out)
