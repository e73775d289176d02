"""Vectorized overlay paths vs per-point oracles + device flow decimation.

The round-2 host overlay was a per-grid-point Python loop of
``cv2.arrowedLine`` calls (mirroring the reference's
``pwc_extract_flow_video.py:94-142``); round 3 vectorizes the geometry and
batches every arrow into one ``cv2.polylines`` call, and moves the grid
decimation onto the device (``video.decimate_flow``) so the D2H ships only
the arrow grid.  These tests pin both against the original semantics.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from opticalflow_tpu.viz.overlay import (arrow_overlay, draw_arrows_batch,
                                         resize_flow_np)


def _rand_flow(hq, wq, seed=0, mag=6.0):
    rng = np.random.RandomState(seed)
    return ((rng.rand(hq, wq, 2) - 0.5) * 2 * mag).astype(np.float32)


def _rand_frame(h, w, seed=1):
    rng = np.random.RandomState(seed)
    return (rng.rand(h, w, 3) * 255).astype(np.uint8)


def _arrow_overlay_loop(frame_bgr, flow, *, step=16, scale=1.0, min_mag=0.5,
                        bgr=(0, 0, 255)):
    """The round-2 per-point implementation (reference semantics)."""
    h, w = frame_bgr.shape[:2]
    flow = resize_flow_np(flow, h, w)
    out = frame_bgr.copy()
    inv = 1.0 / max(scale, 1e-6)
    for y in range(0, h, step):
        for x in range(0, w, step):
            dx, dy = float(flow[y, x, 0]), float(flow[y, x, 1])
            if dx * dx + dy * dy < min_mag * min_mag:
                continue
            tip = (int(round(x + dx * inv)), int(round(y + dy * inv)))
            cv2.arrowedLine(out, (x, y), tip, bgr, thickness=1, tipLength=0.3)
    return out


def test_draw_arrows_batch_matches_arrowedLine():
    rng = np.random.RandomState(7)
    p0 = rng.randint(5, 120, size=(40, 2))
    p1 = p0 + rng.randint(-25, 25, size=(40, 2))
    img_a = _rand_frame(128, 128)
    img_b = img_a.copy()
    for a, b in zip(p0, p1):
        cv2.arrowedLine(img_a, tuple(int(v) for v in a),
                        tuple(int(v) for v in b), (0, 255, 0),
                        thickness=1, tipLength=0.3)
    draw_arrows_batch(img_b, p0, p1, (0, 255, 0))
    np.testing.assert_array_equal(img_a, img_b)


@pytest.mark.parametrize("scale,min_mag", [(1.0, 0.5), (2.0, 1.5)])
def test_arrow_overlay_matches_loop(scale, min_mag):
    frame = _rand_frame(96, 130)
    qflow = _rand_flow(32, 48, seed=3)  # padded 128x192 quarter field
    fast = arrow_overlay(frame, qflow, step=16, scale=scale,
                         min_mag=min_mag)
    slow = _arrow_overlay_loop(frame, qflow, step=16, scale=scale,
                               min_mag=min_mag)
    np.testing.assert_array_equal(fast, slow)


def test_decimate_flow_matches_host_resize_sample():
    """Device grid == host resize_flow_np sampled at the same grid points,
    including non-/64 frames where resize squeezes the padded field."""
    from opticalflow_tpu.video import decimate_flow
    h, w, step = 96, 130, 16      # padded 128x192 -> quarter 32x48
    qflow = _rand_flow(32, 48, seed=5)[None]
    grid = np.asarray(decimate_flow(qflow, step, h, w))[0]
    full = resize_flow_np(qflow[0], h, w)
    ys, xs = np.mgrid[0:h:step, 0:w:step]
    assert grid.shape == (ys.shape[0], ys.shape[1], 2)
    # cv2's float resize carries ~5e-5 coefficient noise; sub-pixel overlay
    # rounding absorbs it (the end-to-end test below is pixel-exact)
    np.testing.assert_allclose(grid, full[ys, xs], atol=3e-4)


def test_arrow_overlay_grid_step_matches_full_path():
    """End to end: device-decimated grid -> identical overlay pixels."""
    from opticalflow_tpu.video import decimate_flow
    h, w, step = 96, 130, 16
    qflow = _rand_flow(32, 48, seed=9)
    frame = _rand_frame(h, w, seed=2)
    grid = np.asarray(decimate_flow(qflow[None], step, h, w))[0]
    a = arrow_overlay(frame, grid, step=step, grid_step=step)
    b = arrow_overlay(frame, qflow, step=step)
    np.testing.assert_array_equal(a, b)


def test_vanish_frame_grid_step_matches_full_path():
    from opticalflow_tpu.video import decimate_flow
    from opticalflow_tpu.viz.vanishing import vanish_frame
    h, w, step = 96, 130, 8
    # radial flow -> a stable vanishing point for both paths
    yy, xx = np.mgrid[0:32, 0:48].astype(np.float32)
    qflow = np.dstack([(xx - 24) / 3, (yy - 16) / 3])
    frame = _rand_frame(h, w, seed=4)
    grid = np.asarray(decimate_flow(qflow[None], step, h, w))[0]
    a = vanish_frame(frame, grid, step=step, shrink_ratio=0.75,
                     grid_step=step)
    b = vanish_frame(frame, resize_flow_np(qflow, h, w), step=step,
                     shrink_ratio=0.75)
    np.testing.assert_array_equal(a, b)


def test_topview_arrows_match_loop():
    from opticalflow_tpu.viz import topview as tv
    h, w = 120, 160
    flow = _rand_flow(h, w, seed=11, mag=4.0)
    frame = _rand_frame(h, w, seed=12)
    dom = tv.dominant_direction(flow)
    fast = tv.draw_direction_arrows(frame, flow, step=20, scale=5.0,
                                    dominant=dom)
    # round-2 per-point loop
    slow = frame.copy()
    d = dom / np.linalg.norm(dom)
    cos_thr = np.cos(np.deg2rad(30.0))
    for y in range(0, h, 20):
        for x in range(0, w, 20):
            fx, fy = float(flow[y, x, 0]), float(flow[y, x, 1])
            mag = (fx * fx + fy * fy) ** 0.5
            if mag < 0.5:
                continue
            color = (0, 0, 255)
            if (fx * d[0] + fy * d[1]) / mag < cos_thr:
                color = (255, 255, 255)
            tip = (int(x + fx * 5.0), int(y + fy * 5.0))
            cv2.arrowedLine(slow, (x, y), tip, color, 2, tipLength=0.3)
    np.testing.assert_array_equal(fast, slow)


def test_async_video_writer_roundtrip(tmp_path):
    from opticalflow_tpu.io.video import AsyncVideoWriter
    path = str(tmp_path / "async.mp4")
    wr = AsyncVideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0,
                          (64, 48))
    assert wr.isOpened()
    for i in range(10):
        wr.write(np.full((48, 64, 3), i * 20, np.uint8))
    wr.release()
    cap = cv2.VideoCapture(path)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 10
