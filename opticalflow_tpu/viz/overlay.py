"""Arrow / quiver overlays and OpenCV baseline flows for video output.

Replicates the behavior of the reference's video visualizers:

  * :func:`arrow_overlay` — cv2.arrowedLine quiver on a regular grid with
    magnitude gating and an optional title chip
    (``pwc_extract_flow_video.py:94-142``);
  * :func:`opencv_flow` — Farneback / DIS / dense-LK comparison flows
    (``pwc_extract_flow_video.py:49-92``);
  * :func:`side_by_side` — horizontal concat used for comparison videos
    (``pwc_extract_flow_video.py:283-291``);
  * :func:`quiver_figure` — matplotlib quiver-on-image figure writer
    (``pwc_extract_flow.py:193-233``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

__all__ = ["arrow_overlay", "opencv_flow", "side_by_side", "quiver_figure",
           "resize_flow_np", "ARROW_COLORS"]

# BGR triples, keyed like the reference's color_map
ARROW_COLORS = {
    "red": (0, 0, 255),
    "lime": (0, 255, 0),
    "blue": (255, 0, 0),
    "white": (255, 255, 255),
    "yellow": (0, 255, 255),
}


def resize_flow_np(flow: np.ndarray, height: int, width: int) -> np.ndarray:
    """Host-side bilinear flow resize with vector rescale (numpy/cv2)."""
    hf, wf = flow.shape[:2]
    if (hf, wf) == (height, width):
        return flow
    import cv2
    sx, sy = width / float(wf), height / float(hf)
    u = cv2.resize(flow[..., 0], (width, height),
                   interpolation=cv2.INTER_LINEAR) * sx
    v = cv2.resize(flow[..., 1], (width, height),
                   interpolation=cv2.INTER_LINEAR) * sy
    return np.dstack([u, v])


def draw_arrows_batch(img: np.ndarray, p0: np.ndarray, p1: np.ndarray,
                      bgr: Tuple[int, int, int], *, thickness: int = 1,
                      tip_length: float = 0.3) -> None:
    """Draw N arrows in ONE ``cv2.polylines`` call, pixel-identical to N
    ``cv2.arrowedLine`` calls (OpenCV's arrowedLine is three cv2.line calls;
    ``np.rint`` matches cvRound's round-half-to-even).  ``p0``/``p1`` are
    (N, 2) integer-valued endpoint arrays.  In-place on ``img``.

    This replaces the reference's per-grid-point Python loop
    (``pwc_extract_flow_video.py:94-142``) — the binding stage of the
    streaming overlay at Sintel resolution (PERF.md round-2 breakdown).
    """
    import cv2
    if len(p0) == 0:
        return
    d = p0.astype(np.float64) - p1.astype(np.float64)  # pt1 - pt2
    tip = np.hypot(d[:, 0], d[:, 1]) * tip_length
    ang = np.arctan2(d[:, 1], d[:, 0])
    pl = np.stack([np.rint(p1[:, 0] + tip * np.cos(ang + np.pi / 4)),
                   np.rint(p1[:, 1] + tip * np.sin(ang + np.pi / 4))], axis=1)
    pr = np.stack([np.rint(p1[:, 0] + tip * np.cos(ang - np.pi / 4)),
                   np.rint(p1[:, 1] + tip * np.sin(ang - np.pi / 4))], axis=1)
    segs = np.concatenate([np.stack([p0, p1], axis=1),
                           np.stack([pl, p1], axis=1),
                           np.stack([pr, p1], axis=1)]).astype(np.int32)
    if thickness == 1 and img.flags.c_contiguous:
        from opticalflow_tpu.runtime.flowviz import draw_segments_native
        if draw_segments_native(img, segs, bgr):
            return
    cv2.polylines(img, segs, False, bgr, thickness)


def _grid_vectors(flow: np.ndarray, h: int, w: int, step: int,
                  grid_step: Optional[int]):
    """(x, y, dx, dy) float64 arrays at every ``step`` full-res pixels.

    ``grid_step`` set means ``flow`` is already grid-sampled on device at
    that full-res spacing (vectors in full-res pixel units) — the streaming
    runner's decimated D2H path.  ``flow[i, j]`` is then the vector at pixel
    ``(j*grid_step, i*grid_step)`` and ``step`` is ignored; rows/cols whose
    anchor falls outside the (unpadded) frame are dropped.
    """
    if grid_step is None:
        flow = resize_flow_np(flow, h, w)
        ys, xs = np.mgrid[0:h:step, 0:w:step]
        u = flow[ys, xs, 0]
        v = flow[ys, xs, 1]
    else:
        gh = min(flow.shape[0], -(-h // grid_step))
        gw = min(flow.shape[1], -(-w // grid_step))
        u = flow[:gh, :gw, 0]
        v = flow[:gh, :gw, 1]
        ys, xs = np.mgrid[0:gh * grid_step:grid_step,
                          0:gw * grid_step:grid_step]
    return (xs.ravel().astype(np.float64), ys.ravel().astype(np.float64),
            u.ravel().astype(np.float64), v.ravel().astype(np.float64))


def arrow_overlay(frame_bgr: np.ndarray, flow: np.ndarray, *, step: int = 16,
                  scale: float = 1.0, min_mag: float = 0.5,
                  title: Optional[str] = None,
                  color: str | Tuple[int, int, int] = "red",
                  grid_step: Optional[int] = None) -> np.ndarray:
    """Draw flow arrows on a BGR frame every ``step`` pixels.

    ``scale`` shortens arrows as it grows (drawn length = |flow|/scale),
    vectors below ``min_mag`` are skipped — matching the reference defaults
    (``pwc_extract_flow_video.py:94-142``).  The grid read + arrow geometry
    are vectorized and all arrows land in one ``cv2.polylines`` call,
    pixel-identical to the per-point ``cv2.arrowedLine`` loop.
    ``grid_step``: see :func:`_grid_vectors` (device-decimated flow).
    """
    import cv2
    h, w = frame_bgr.shape[:2]
    out = frame_bgr.copy()
    bgr = ARROW_COLORS.get(color, color if isinstance(color, tuple)
                           else (0, 0, 255))
    inv = 1.0 / max(scale, 1e-6)
    x, y, dx, dy = _grid_vectors(flow, h, w, step, grid_step)
    keep = dx * dx + dy * dy >= min_mag * min_mag
    x, y, dx, dy = x[keep], y[keep], dx[keep], dy[keep]
    p0 = np.stack([x, y], axis=1)
    p1 = np.stack([np.rint(x + dx * inv), np.rint(y + dy * inv)], axis=1)
    draw_arrows_batch(out, p0, p1, bgr)
    if title:
        cv2.rectangle(out, (10, 10), (10 + len(title) * 12, 40), (0, 0, 0), -1)
        cv2.putText(out, title, (14, 35), cv2.FONT_HERSHEY_SIMPLEX, 0.7,
                    (255, 255, 255), 2, cv2.LINE_AA)
    return out


def opencv_flow(frame1_bgr: np.ndarray, frame2_bgr: np.ndarray,
                method: str = "farneback") -> np.ndarray:
    """Classical OpenCV flow baselines for side-by-side comparison."""
    import cv2
    g1 = cv2.cvtColor(frame1_bgr, cv2.COLOR_BGR2GRAY)
    g2 = cv2.cvtColor(frame2_bgr, cv2.COLOR_BGR2GRAY)
    if method == "farneback":
        return cv2.calcOpticalFlowFarneback(
            g1, g2, None, pyr_scale=0.5, levels=3, winsize=15,
            iterations=3, poly_n=5, poly_sigma=1.2, flags=0)
    if method == "dis":
        dis = cv2.DISOpticalFlow_create(cv2.DISOPTICAL_FLOW_PRESET_MEDIUM)
        return dis.calc(g1, g2, None)
    if method == "lucaskanade_dense":
        return cv2.calcOpticalFlowFarneback(
            g1, g2, None, pyr_scale=0.5, levels=5, winsize=13,
            iterations=10, poly_n=5, poly_sigma=1.1, flags=0)
    raise ValueError(f"unknown OpenCV flow method {method!r}")


def side_by_side(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """Horizontal concat (heights must match)."""
    return np.concatenate([left, right], axis=1)


def quiver_figure(image_rgb: np.ndarray, flow: np.ndarray, out_path: str, *,
                  step: int = 16, scale: float = 1.0,
                  title: str = "PWC-Net flow") -> None:
    """Matplotlib quiver overlay saved to file (the single-pair extractor's
    ``save_quiver_overlay``, ``pwc_extract_flow.py:193-233``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    h, w = image_rgb.shape[:2]
    ys, xs = np.mgrid[0:h:step, 0:w:step]
    u = flow[ys, xs, 0]
    v = flow[ys, xs, 1]
    fig, ax = plt.subplots(figsize=(w / 100.0, h / 100.0), dpi=100)
    ax.imshow(image_rgb)
    ax.quiver(xs, ys, u, v, color="red", angles="xy", scale_units="xy",
              scale=scale)
    ax.set_title(title)
    ax.axis("off")
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
