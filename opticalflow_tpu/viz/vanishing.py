"""Vanishing-point estimation from optical flow.

Same algorithm as the reference
(``pwc_extract_flow_video_vanishpoint.py:93-255``) — sample flow vectors on a
grid, intersect all pairs of flow lines, vote into a weighted 2-D histogram
over a ±50%-margin canvas, take the argmax bin, then least-squares refine on
lines near the winner — but fully vectorized (the reference runs an O(N²)
Python loop; here the pairwise intersection is one broadcasted numpy
expression, ~two orders of magnitude faster at N=300).

Also provides the drawing helper used by the video runner.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

__all__ = ["estimate_vanishing_point", "draw_vanishing_point",
           "vanish_frame"]


def _sample_vectors(flow: np.ndarray, step: int, min_mag: float,
                    grid_step: Optional[int] = None,
                    frame_hw: Optional[Tuple[int, int]] = None):
    from opticalflow_tpu.viz.overlay import _grid_vectors
    if grid_step is not None:
        h, w = frame_hw or (flow.shape[0] * grid_step,
                            flow.shape[1] * grid_step)
    else:
        h, w = flow.shape[:2]
    x, y, u, v = _grid_vectors(flow, h, w, step, grid_step)
    mag = np.hypot(u, v)
    keep = mag >= min_mag
    return x[keep], y[keep], u[keep] / mag[keep], v[keep] / mag[keep], mag[keep]


def estimate_vanishing_point(
        flow: np.ndarray, *, step: int = 16, min_mag: float = 1.0,
        max_points: int = 300, grid_size: int = 64, min_pairs: int = 50,
        rng: Optional[np.random.Generator] = None,
        grid_step: Optional[int] = None,
        frame_hw: Optional[Tuple[int, int]] = None,
) -> Optional[Tuple[float, float, float]]:
    """Estimate the flow vanishing point → (vx, vy, confidence) or None.

    Confidence is the winning bin's share of total histogram votes.
    ``grid_step``/``frame_hw``: flow is already device-decimated to a grid
    of that full-res spacing (see ``viz.overlay._grid_vectors``).
    """
    if grid_step is not None:
        h, w = frame_hw or (flow.shape[0] * grid_step,
                            flow.shape[1] * grid_step)
    else:
        h, w = flow.shape[:2]
    x, y, dx, dy, mag = _sample_vectors(flow, step, min_mag, grid_step,
                                        (h, w))
    n = x.size
    if n < 5:
        return None
    if n > max_points:
        rng = rng or np.random.default_rng(0)
        sel = rng.choice(n, max_points, replace=False)
        x, y, dx, dy, mag = x[sel], y[sel], dx[sel], dy[sel], mag[sel]
        n = max_points

    # Pairwise line intersections, broadcast over the upper triangle:
    # line i: p_i + t·d_i.  t_i = cross(p_j − p_i, d_j) / cross(d_i, d_j).
    iu, ju = np.triu_indices(n, k=1)
    denom = dx[iu] * dy[ju] - dy[iu] * dx[ju]
    ok = np.abs(denom) >= 1e-6
    iu, ju, denom = iu[ok], ju[ok], denom[ok]
    dpx = x[ju] - x[iu]
    dpy = y[ju] - y[iu]
    t = (dpx * dy[ju] - dpy * dx[ju]) / denom
    ix = x[iu] + t * dx[iu]
    iy = y[iu] + t * dy[iu]

    # keep intersections within a ±50% margin around the frame
    inside = ((ix >= -0.5 * w) & (ix <= 1.5 * w)
              & (iy >= -0.5 * h) & (iy <= 1.5 * h))
    if inside.sum() < min_pairs:
        return None
    ix, iy = ix[inside], iy[inside]
    wts = mag[iu[inside]] * mag[ju[inside]]

    hist, xe, ye = np.histogram2d(
        ix, iy, bins=grid_size,
        range=[[-0.5 * w, 1.5 * w], [-0.5 * h, 1.5 * h]], weights=wts)
    gx, gy = np.unravel_index(np.argmax(hist), hist.shape)
    if hist[gx, gy] <= 0:
        return None
    vx = 0.5 * (xe[gx] + xe[gx + 1])
    vy = 0.5 * (ye[gy] + ye[gy + 1])
    prob = float(hist[gx, gy] / (hist.sum() + 1e-9))

    # least-squares refinement on lines close to the winning-bin VP —
    # the reference's exact rule (``pwc_extract_flow_video_vanishpoint.py:
    # 236-246``): geometric point-line distance to the bin center
    # < 3·median over all sampled lines.  dx/dy are unit directions
    # (normalized in ``_sample_vectors``, like the reference's ``dx_n``),
    # so (nx, ny) are unit normals and ``dist`` is in pixels.
    nx, ny = -dy, dx
    c = nx * x + ny * y
    dist = np.abs(nx * vx + ny * vy - c)
    inl = dist < (np.median(dist) * 3.0 + 1e-6)
    if inl.sum() >= 5:
        a = np.stack([nx[inl], ny[inl]], axis=1)
        sol, *_ = np.linalg.lstsq(a, c[inl], rcond=None)
        vx, vy = float(sol[0]), float(sol[1])

    return vx, vy, prob


def draw_vanishing_point(frame_bgr: np.ndarray, vp, *,
                         color=(0, 255, 255)) -> np.ndarray:
    """Circle + cross + probability label at the VP (clipped to the frame),
    as drawn by the reference's extended quiver frame
    (``pwc_extract_flow_video_vanishpoint.py:258-382``)."""
    if vp is None:
        return frame_bgr
    import cv2
    vx, vy, prob = vp
    h, w = frame_bgr.shape[:2]
    cx = int(np.clip(vx, 0, w - 1))
    cy = int(np.clip(vy, 0, h - 1))
    out = frame_bgr.copy()
    cv2.circle(out, (cx, cy), 12, color, 2)
    cv2.line(out, (cx - 18, cy), (cx + 18, cy), color, 2)
    cv2.line(out, (cx, cy - 18), (cx, cy + 18), color, 2)
    cv2.putText(out, f"p={prob:.2f}", (cx + 16, cy - 12),
                cv2.FONT_HERSHEY_SIMPLEX, 0.6, color, 2, cv2.LINE_AA)
    return out


def vanish_frame(frame_bgr: np.ndarray, flow: np.ndarray, *,
                 step: int = 16, scale: float = 1.0, min_mag: float = 1.0,
                 shrink_ratio: float = 0.75, title: Optional[str] = None,
                 arrow_color=(0, 0, 255),
                 draw_vp: bool = True,
                 grid_step: Optional[int] = None) -> np.ndarray:
    """The reference's extended quiver frame
    (``pwc_extract_flow_video_vanishpoint.py:258-382``): the frame is shrunk
    by ``shrink_ratio`` onto a black canvas of the original size, arrows and
    the vanishing-point marker are drawn in the shrunken coordinate system
    (so off-frame VPs inside the margin become visible), plus a title chip.
    ``shrink_ratio >= 1`` draws on the frame directly.
    """
    import cv2
    from opticalflow_tpu.viz.overlay import (_grid_vectors,
                                             draw_arrows_batch,
                                             resize_flow_np)
    h, w = frame_bgr.shape[:2]
    if grid_step is None and flow.shape[:2] != (h, w):
        flow = resize_flow_np(flow, h, w)

    out = np.zeros_like(frame_bgr)
    if shrink_ratio < 1.0:
        nw = max(int(w * shrink_ratio), 1)
        nh = max(int(h * shrink_ratio), 1)
        small = cv2.resize(frame_bgr, (nw, nh), interpolation=cv2.INTER_LINEAR)
        ox, oy = (w - nw) // 2, (h - nh) // 2
        out[oy:oy + nh, ox:ox + nw] = small
        s = nw / float(w)
    else:
        out[:] = frame_bgr
        ox = oy = 0
        s = 1.0

    inv = 1.0 / max(scale, 1e-6)
    x, y, dx, dy = _grid_vectors(flow, h, w, step, grid_step)
    keep = dx * dx + dy * dy >= min_mag * min_mag
    x, y, dx, dy = x[keep], y[keep], dx[keep], dy[keep]
    x0 = np.rint(ox + x * s)
    y0 = np.rint(oy + y * s)
    x1 = np.rint(ox + (x + dx * inv) * s)
    y1 = np.rint(oy + (y + dy * inv) * s)
    inb = ((x0 >= 0) & (x0 < w) & (y0 >= 0) & (y0 < h)
           & (x1 >= 0) & (x1 < w) & (y1 >= 0) & (y1 < h))
    draw_arrows_batch(out, np.stack([x0[inb], y0[inb]], axis=1),
                      np.stack([x1[inb], y1[inb]], axis=1), arrow_color)

    if draw_vp:
        vp = estimate_vanishing_point(flow, step=step, min_mag=min_mag,
                                      grid_step=grid_step, frame_hw=(h, w))
        if vp is not None and np.isfinite(vp[0]) and np.isfinite(vp[1]):
            vx, vy, prob = vp
            vxs = int(round(ox + vx * s))
            vys = int(round(oy + vy * s))
            if 0 <= vxs < w and 0 <= vys < h:
                # pixel-exact clone of the reference's marker + chip
                # (``pwc_extract_flow_video_vanishpoint.py:365-378``:
                # radius 8, arms ±15, text +10/−10) — intentionally NOT
                # shared with draw_vanishing_point (the standalone helper
                # with its own 12/18 geometry); goldens pin both
                color = (0, 255, 255)
                cv2.circle(out, (vxs, vys), 8, color, 3)
                cv2.line(out, (vxs - 15, vys), (vxs + 15, vys), color, 2)
                cv2.line(out, (vxs, vys - 15), (vxs, vys + 15), color, 2)
                cv2.putText(out, f"p={prob:.2f}", (vxs + 10, vys - 10),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.6, color, 2,
                            cv2.LINE_AA)

    if title:
        cv2.rectangle(out, (10, 10), (10 + len(title) * 12, 40), (0, 0, 0), -1)
        cv2.putText(out, title, (14, 35), cv2.FONT_HERSHEY_SIMPLEX, 0.7,
                    (255, 255, 255), 2, cv2.LINE_AA)
    return out
