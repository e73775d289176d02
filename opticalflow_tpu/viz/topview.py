"""Top-view perspective warp + dominant-direction flow visualization.

Functional equivalent of the reference ``topview.py``: warp each frame to a
top-down view via a fixed trapezoid→rectangle homography
(``topview.py:57-76``), run flow on the warped frames, compute the mean flow
direction over super-threshold pixels (``:122-134``), and draw arrows colored
red/white by <30° angular agreement with that dominant direction
(``:137-178``).

Divergences from the reference (documented, intentional):
  * preprocessing preset is configurable — the reference hardcodes RGB /255
    there (``topview.py:91-96``), unlike the canonical BGR CLI;
  * the quarter-res model flow is properly upsampled with the ×(size ratio)
    vector rescale; the reference resizes the quarter-res map straight to
    frame size, silently shrinking vectors 4× (``topview.py:110-117``).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["perspective_matrix", "warp_topview", "dominant_direction",
           "draw_direction_arrows"]


def perspective_matrix(width: int, height: int) -> np.ndarray:
    """Side-cam trapezoid → top-view rectangle homography (3×3)."""
    import cv2
    src = np.float32([
        [width * 0.2, height * 0.8], [width * 0.8, height * 0.8],
        [width * 0.3, height * 0.4], [width * 0.7, height * 0.4]])
    dst = np.float32([
        [width * 0.2, height * 0.9], [width * 0.8, height * 0.9],
        [width * 0.2, height * 0.1], [width * 0.8, height * 0.1]])
    return cv2.getPerspectiveTransform(src, dst)


def warp_topview(frame: np.ndarray,
                 matrix: Optional[np.ndarray] = None) -> np.ndarray:
    import cv2
    h, w = frame.shape[:2]
    if matrix is None:
        matrix = perspective_matrix(w, h)
    return cv2.warpPerspective(frame, matrix, (w, h))


def dominant_direction(flow: np.ndarray,
                       threshold: float = 1.0) -> np.ndarray:
    """Mean (u, v) over pixels with |flow| > threshold; zeros if none."""
    mag = np.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2)
    mask = mag > threshold
    if not mask.any():
        return np.zeros(2, np.float32)
    return flow[mask].mean(axis=0)


def draw_direction_arrows(frame_bgr: np.ndarray, flow: np.ndarray, *,
                          step: int = 20, scale: float = 5.0,
                          dominant: Optional[np.ndarray] = None,
                          angle_threshold_deg: float = 30.0,
                          min_mag: float = 0.5) -> np.ndarray:
    """Arrows colored red when within ``angle_threshold_deg`` of the dominant
    direction, white otherwise."""
    from opticalflow_tpu.viz.overlay import draw_arrows_batch
    out = frame_bgr.copy()
    h, w = frame_bgr.shape[:2]
    dom = None
    if dominant is not None and np.linalg.norm(dominant) > 0:
        dom = dominant / np.linalg.norm(dominant)
    cos_thr = np.cos(np.deg2rad(angle_threshold_deg))
    ys, xs = np.mgrid[0:h:step, 0:w:step]
    fx = flow[ys, xs, 0].astype(np.float64).ravel()
    fy = flow[ys, xs, 1].astype(np.float64).ravel()
    x = xs.ravel().astype(np.float64)
    y = ys.ravel().astype(np.float64)
    mag = np.hypot(fx, fy)
    keep = mag >= min_mag
    x, y, fx, fy, mag = x[keep], y[keep], fx[keep], fy[keep], mag[keep]
    if len(x) == 0:  # every arrow below min_mag — nothing to draw
        return out
    p0 = np.stack([x, y], axis=1)
    # int() truncation toward zero, as the per-point loop did
    p1 = np.stack([np.trunc(x + fx * scale), np.trunc(y + fy * scale)], axis=1)
    white = (np.zeros(len(x), bool) if dom is None
             else (fx * dom[0] + fy * dom[1]) / mag < cos_thr)
    # one polylines call per same-color run, preserving the per-point loop's
    # grid draw order exactly (later arrows overwrite earlier ones where
    # red/white overlap)
    bounds = np.flatnonzero(np.diff(white))
    for lo, hi in zip(np.r_[0, bounds + 1], np.r_[bounds + 1, len(white)]):
        color = (255, 255, 255) if white[lo] else (0, 0, 255)
        draw_arrows_batch(out, p0[lo:hi], p1[lo:hi], color, thickness=2)
    return out
