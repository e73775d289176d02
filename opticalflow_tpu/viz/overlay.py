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


def arrow_overlay(frame_bgr: np.ndarray, flow: np.ndarray, *, step: int = 16,
                  scale: float = 1.0, min_mag: float = 0.5,
                  title: Optional[str] = None,
                  color: str | Tuple[int, int, int] = "red") -> np.ndarray:
    """Draw flow arrows on a BGR frame every ``step`` pixels.

    ``scale`` shortens arrows as it grows (drawn length = |flow|/scale),
    vectors below ``min_mag`` are skipped — matching the reference defaults.
    """
    import cv2
    h, w = frame_bgr.shape[:2]
    flow = resize_flow_np(flow, h, w)
    out = frame_bgr.copy()
    bgr = ARROW_COLORS.get(color, color if isinstance(color, tuple)
                           else (0, 0, 255))
    inv = 1.0 / max(scale, 1e-6)
    for y in range(0, h, step):
        for x in range(0, w, step):
            dx, dy = float(flow[y, x, 0]), float(flow[y, x, 1])
            if dx * dx + dy * dy < min_mag * min_mag:
                continue
            tip = (int(round(x + dx * inv)), int(round(y + dy * inv)))
            cv2.arrowedLine(out, (x, y), tip, bgr, thickness=1, tipLength=0.3)
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
